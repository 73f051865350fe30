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
from jax.experimental.pallas import tpu as pltpu


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
