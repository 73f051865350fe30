"""Fully-fused Swin transformer block as a Pallas TPU kernel.

Round-4 measurement (scripts -> /tmp/swinir_ab.py, v5e, 4x512^2 x4 SR):
with the attention-only kernel (ops/window_attention.py) SwinIR still moves
788 GiB of HBM traffic per 4-frame call — 58% of v5e HBM bandwidth at 8%
MFU — because every SwinBlock round-trips its (B, H, W, 180) activations
through HBM ~15x (LN1 -> qkv -> attention -> proj -> residual -> LN2 ->
fc1 -> gelu -> fc2 -> residual). The model is memory-bound, and fusing more
of the chain is worth ~7x body-traffic reduction.

This kernel runs the WHOLE block — LN1, fused-qkv projection, shifted-window
attention (relative-position bias + region-label mask), output projection,
residual, LN2, 2-layer GELU MLP, residual — over one row-segment of windows
per grid step. x is read once and the output written once; everything else
lives in VMEM. Weights use constant block index maps, so Mosaic fetches them
once and keeps them resident across grid steps.

The cyclic shift of odd blocks commutes with every per-token op (LN, MLP,
residual), so callers roll x before and after the kernel and pass the
shifted-window labels — the kernel itself is shift-agnostic (reference
semantics: swap_face_fine/SwinIR/models/network_swinir.py
SwinTransformerBlock.forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf(x):
    """f32 erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7): Pallas TPU
    has no erf/erfc lowering, and 1.5e-7 is far below bf16 resolution."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact (erf-form) GELU, matching jax.nn.gelu(approximate=False) /
    torch nn.GELU() to ~1e-7 — the reference SwinIR's activation."""
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, bias_ref, lab_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, o_ref, *, window, heads, masked, eps):
    w = window
    n = w * w
    t = x_ref[0]                                     # (w, Gw, C)
    gw, c = t.shape[1], t.shape[2]
    g = gw // w
    hd = c // heads
    scale = hd ** -0.5
    cdtype = t.dtype

    # window partition (VMEM-local sublane reshape)
    t = t.reshape(w, g, w, c).swapaxes(0, 1).reshape(g, n, c)

    def layer_norm(v, s_ref, b_ref):
        # single pass: var = E[x^2] - mu^2 (f32 stats; values are O(1))
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(vf * vf, axis=-1, keepdims=True) - mu * mu
        out = (vf - mu) * jax.lax.rsqrt(var + eps)
        return (out * s_ref[0] + b_ref[0]).astype(cdtype)

    # projections accumulate f32 on the MXU (Mosaic requires a 32-bit
    # matmul acc) and immediately cast the result to cdtype — the persistent
    # buffers stay cdtype (the f32 stores were the VMEM bound: g=32 measured
    # 16.8 MB scoped with f32 stores, ~11 MB with cdtype)
    ln1 = layer_norm(t, ln1s_ref, ln1b_ref)          # (g, n, C)
    qkv = jax.lax.dot_general(
        ln1, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdtype)
    qkv = qkv + bqkv_ref[0].astype(cdtype)           # (g, n, 3C)

    outs = []
    for h in range(heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        att = jax.lax.dot_general(
            q * jnp.asarray(scale, cdtype), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (g, n, n)
        att = att + bias_ref[h][None]
        if masked:
            lab = lab_ref[0]                         # (g, n)
            neq = lab[:, :, None] != lab[:, None, :]
            att = jnp.where(neq, att - 100.0, att)
        att = jax.nn.softmax(att, axis=-1).astype(cdtype)
        outs.append(jax.lax.dot_general(
            att, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(cdtype))
    attn = jnp.concatenate(outs, axis=-1)            # (g, n, C)
    attn = jax.lax.dot_general(
        attn, wproj_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdtype)
    y = t + attn + bproj_ref[0].astype(cdtype)       # residual 1

    ln2 = layer_norm(y, ln2s_ref, ln2b_ref)
    h1 = jax.lax.dot_general(
        ln2, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = _gelu_exact(h1 + b1_ref[0]).astype(cdtype)
    h2 = jax.lax.dot_general(
        h1, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdtype)
    out = y + h2 + b2_ref[0].astype(cdtype)          # residual 2

    out = out.reshape(g, w, w, c).swapaxes(0, 1).reshape(w, gw, c)
    o_ref[0] = out


@functools.partial(
    jax.jit, static_argnames=("window", "heads", "interpret"))
def fused_swin_block(x, wts, labels=None, *, window, heads, interpret=False):
    """One whole SwinBlock, fused: x (B, H, W, C) -> (B, H, W, C).

    `wts` is a dict with keys ln1_scale/ln1_bias (C,), qkv_w (C, 3C),
    qkv_b (3C,), proj_w (C, C), proj_b (C,), bias_hnn (heads, n, n) f32,
    ln2_scale/ln2_bias (C,), fc1_w (C, Cm), fc1_b (Cm,), fc2_w (Cm, C),
    fc2_b (C,). All compute follows x's dtype (matmuls accumulate f32 on
    the MXU; LN statistics are f32). labels: (H//w, W//w, n) int
    window-region labels of the (already rolled) image for shifted blocks,
    or None. Shifted blocks: roll x by -shift before, +shift after — the
    shift commutes with LN/MLP/residual so only the attention mask differs.
    """
    b, hh, ww, c = x.shape
    n = window * window
    nwy, nwx = hh // window, ww // window
    cdtype = x.dtype

    # G windows per grid step: bounded by VMEM — all fused intermediates are
    # live per step. Measured on v5e: G=32 allocates 16.98 MB scoped (over
    # the 16 MB limit — the f32 matmul accumulators Mosaic requires are the
    # bound); G=16 fits with double-buffering headroom. Larger G = larger
    # MXU matmuls and fewer grid steps.
    gmax = 16
    g = next(gg for gg in range(min(gmax, nwx), 0, -1) if nwx % gg == 0)
    masked = labels is not None
    if not masked:
        labels = jnp.zeros((nwy, nwx, n), jnp.int32)
    labels = labels.astype(jnp.int32)

    def row2(v):  # (C,) -> (1, C) so every operand is rank >= 2
        return v.reshape(1, -1)

    cm = wts["fc1_w"].shape[1]
    cast = lambda v: v.astype(cdtype)
    const2 = lambda shape: pl.BlockSpec(shape, lambda bi, i, j: (0, 0))

    grid = (b, nwy, nwx // g)
    out = pl.pallas_call(
        functools.partial(_kernel, window=window, heads=heads,
                          masked=masked, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), cdtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, window, g * window, c),
                         lambda bi, i, j: (bi, i, j, 0)),
            const2((1, c)), const2((1, c)),                    # ln1
            const2((c, 3 * c)), const2((1, 3 * c)),            # qkv
            const2((c, c)), const2((1, c)),                    # proj
            pl.BlockSpec((heads, n, n), lambda bi, i, j: (0, 0, 0)),
            pl.BlockSpec((1, g, n), lambda bi, i, j: (i, j, 0)),
            const2((1, c)), const2((1, c)),                    # ln2
            const2((c, cm)), const2((1, cm)),                  # fc1
            const2((cm, c)), const2((1, c)),                   # fc2
        ],
        out_specs=pl.BlockSpec((1, window, g * window, c),
                               lambda bi, i, j: (bi, i, j, 0)),
        interpret=interpret,
    )(x,
      row2(wts["ln1_scale"].astype(jnp.float32)),
      row2(wts["ln1_bias"].astype(jnp.float32)),
      cast(wts["qkv_w"]), row2(cast(wts["qkv_b"])),
      cast(wts["proj_w"]), row2(cast(wts["proj_b"])),
      wts["bias_hnn"].astype(jnp.float32), labels,
      row2(wts["ln2_scale"].astype(jnp.float32)),
      row2(wts["ln2_bias"].astype(jnp.float32)),
      cast(wts["fc1_w"]), row2(cast(wts["fc1_b"])),
      cast(wts["fc2_w"]), row2(cast(wts["fc2_b"])))
    return out
