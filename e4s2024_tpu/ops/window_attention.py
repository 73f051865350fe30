"""Fused shifted-window attention (SwinIR) as a Pallas TPU kernel.

The XLA path materializes the per-window attention matrix in HBM three times
(QK^T out, softmax out, att@V in) — at 512^2 that is a (16384, 6, 64, 64)
tensor per block, and the tiny 64x64x30 batched matmuls leave the MXU mostly
idle between HBM round-trips. Measured on v5e: the attention core alone is
40 ms of a 63 ms SwinBlock at 4x512^2 (scripts -> /tmp/swin_profile.py run,
round 4).

This kernel keeps the whole chain — QK^T, scale, relative-position bias,
shifted-window mask, softmax, att@V — in VMEM per block of G windows, so HBM
traffic drops to reading q/k/v once and writing the output once.

Reference semantics: swap_face_fine/SwinIR/models/network_swinir.py
WindowAttention.forward (softmax(q*scale @ k^T + rel_bias [+ mask]) @ v).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Module-level interpreter toggle: tests that exercise the kernel on CPU set
# `window_attention.INTERPRET = True` directly (see tests/test_window_attention.py)
# so model-level forwards that route through the kernel run in the Pallas
# interpreter instead of requiring a Mosaic lowering.
INTERPRET = False


def _kernel(q_ref, k_ref, v_ref, b_ref, l_ref, o_ref, *, scale, masked):
    # blocks: q/k/v/o (G, 1, N, D); bias (1, N, N) f32; labels (G, N) int32
    q = q_ref[:, 0]                      # (G, N, D)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    att = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (G, N, N)
    att = att + b_ref[0][None]
    if masked:
        lab = l_ref[:]                   # (G, N)
        neq = lab[:, :, None] != lab[:, None, :]
        att = jnp.where(neq, att - 100.0, att)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    out = jax.lax.dot_general(
        att, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_attention(q, k, v, bias, labels=None, interpret=False):
    """softmax(q*scale @ k^T + bias [+ window mask]) @ v, fused.

    q, k, v: (BW, H, N, D) — BW window instances, H heads, N tokens/window,
    D head dim. bias: (H, N, N) float32 relative-position bias. labels:
    (BW, N) int window-region labels (shifted windows; tokens attend iff
    labels match) or None. Returns (BW, H, N, D) in q's dtype.

    `interpret=True` runs the kernel in the Pallas interpreter (CPU tests).
    """
    bw, h, n, d = q.shape
    scale = d ** -0.5
    # largest divisor of BW <= 64: G windows per kernel instance. VMEM is
    # the bound — the D=30 lane dim pads to 128 in VMEM, so blocks cost
    # ~4x their logical bytes (G=128 hit the 16 MB scoped-vmem limit at
    # 20.8 MB on v5e; G=64 fits with double buffering)
    g = next(gg for gg in range(min(64, bw), 0, -1) if bw % gg == 0)
    masked = labels is not None
    if not masked:
        labels = jnp.zeros((bw, n), jnp.int32)
    labels = labels.astype(jnp.int32)

    grid = (bw // g, h)
    qkv_spec = pl.BlockSpec((g, 1, n, d), lambda i, j: (i, j, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, masked=masked),
        out_shape=jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, n, n), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((g, n), lambda i, j: (i, 0)),
        ],
        out_specs=qkv_spec,
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), labels)
    return out


def _nhwc_kernel(qkv_ref, b_ref, l_ref, o_ref, *, heads, window, masked,
                 scale):
    """Block: qkv (1, w, G*w, 3C) — one row of G windows; bias (H, n, n) f32;
    labels (1, G, n) int32; out (1, w, G*w, C)."""
    w = window
    t = qkv_ref[0]                                   # (w, Gw, 3C)
    gw, c3 = t.shape[1], t.shape[2]
    g, c = gw // w, c3 // 3
    hd = c // heads
    n = w * w
    # windows via sublane-dim reshape+swap (VMEM-local, no HBM traffic)
    t = t.reshape(w, g, w, c3).swapaxes(0, 1).reshape(g, n, c3)
    outs = []
    for h in range(heads):
        q = t[:, :, h * hd:(h + 1) * hd]
        k = t[:, :, c + h * hd:c + (h + 1) * hd]
        v = t[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        att = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (g, n, n)
        att = att + b_ref[h][None]
        if masked:
            lab = l_ref[0]                           # (g, n)
            neq = lab[:, :, None] != lab[:, None, :]
            att = jnp.where(neq, att - 100.0, att)
        att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
        outs.append(jax.lax.dot_general(
            att, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype))
    out = jnp.concatenate(outs, axis=-1)             # (g, n, c)
    out = out.reshape(g, w, w, c).swapaxes(0, 1).reshape(w, gw, c)
    o_ref[0] = out


@functools.partial(jax.jit,
                   static_argnames=("window", "heads", "interpret"))
def swin_attention_nhwc(qkv, bias, labels=None, *, window, heads,
                        interpret=False):
    """Shifted-window attention over qkv in its NATIVE NHWC layout.

    qkv: (B, H, W, 3C) — the raw output of the fused qkv Dense, channel
    order [q|k|v] x [head] x [head_dim] (the reshape order of the reference's
    WindowAttention.forward, network_swinir.py). bias: (heads, n, n) f32.
    labels: (H//w, W//w, n) int window-region labels of the (already rolled)
    image for shifted blocks, or None. Returns (B, H, W, C).

    v2 of `fused_window_attention`: window partition lives in the BlockSpec
    index map and a VMEM-local sublane reshape, so q/k/v are never
    materialized in the lane-hostile (BW, heads, n, 30) layout (whose
    30-wide minor dim tiles to 128 = 4.3x padded HBM traffic — measured
    802 vs 545 ms/frame integrated at 512^2). Here the minor dim stays
    3C=540 (1.18x padding) and the only HBM traffic is qkv in, out once.
    """
    b, hh, ww, c3 = qkv.shape
    c = c3 // 3
    n = window * window
    nwy, nwx = hh // window, ww // window
    # G windows per block: widest row segment <= 128 lanes that divides nwx
    gmax = max(1, 128 // window)
    g = next(gg for gg in range(min(gmax, nwx), 0, -1) if nwx % gg == 0)
    masked = labels is not None
    if not masked:
        labels = jnp.zeros((nwy, nwx, n), jnp.int32)
    labels = labels.astype(jnp.int32)

    grid = (b, nwy, nwx // g)
    out = pl.pallas_call(
        functools.partial(_nhwc_kernel, heads=heads, window=window,
                          masked=masked, scale=(c // heads) ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, window, g * window, c3),
                         lambda bi, i, j: (bi, i, j, 0)),
            pl.BlockSpec((heads, n, n), lambda bi, i, j: (0, 0, 0)),
            pl.BlockSpec((1, g, n), lambda bi, i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, window, g * window, c),
                               lambda bi, i, j: (bi, i, j, 0)),
        interpret=interpret,
    )(qkv, bias.astype(jnp.float32), labels)
    return out


def reference_window_attention(q, k, v, bias, labels=None):
    """Plain-XLA oracle with identical semantics (the pre-kernel path)."""
    scale = q.shape[-1] ** -0.5
    att = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype),
                     k).astype(jnp.float32)
    att = att + bias[None]
    if labels is not None:
        neq = labels[:, :, None] != labels[:, None, :]
        att = jnp.where(neq[:, None], att - 100.0, att)
    att = jax.nn.softmax(att, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)
