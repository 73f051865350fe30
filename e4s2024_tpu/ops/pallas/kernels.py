"""Pallas TPU kernels for the StyleGAN2 hot ops.

The reference implements these as CUDA extensions (reference
models/stylegan2/op/fused_bias_act_kernel.cu:19, upfirdn2d_kernel.cu:53);
here they are Pallas kernels targeting the TPU VPU, used on the inference hot
path (the training path uses the plain-jnp forms, which XLA fuses and
differentiates at every order).

Kernels:
- `fused_leaky_relu_tpu`: bias + LeakyReLU(0.2) * sqrt(2), channels-last tiles.
- `blur3x3_tpu`: the separable [1,3,3,1]-outer FIR blur at same resolution
  (pad (2,1)) — the inner blur of every StyledConv upsample — as one pass over
  row-tiles with halo.
- `modulate_demodulate_tpu`: fused per-pixel regional modulation
  (x * sum_k seg_k s_k) used by the "fast" regional mode — one VMEM pass
  instead of einsum + mul HBM round trips.

All kernels run in interpret mode on CPU (tests) and compiled on TPU.

MEASURED DECISION (v5e, 512^2 generator, scripts/measure_pallas.py): the
XLA-fused form WINS — gen[xla] 11.39 ms vs gen[pallas] 16.65 ms in f32
(ratio 1.46x), and in bf16 the Pallas kernel does not compile on this
target at all (Mosaic: "Target does not support this comparison" for
vector<...xbf16> cmpf). Root cause: XLA fuses bias+leaky_relu into the
producing conv's epilogue — a separate kernel launch forces an extra HBM
round trip of the full activation tensor. The production path therefore
uses the plain-jnp form (ops.fused_act, backend "xla"); these kernels stay
as the benchmarked alternative behind
`ops.fused_act.set_fused_act_backend("pallas")`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ------------------------------------------------------------- fused bias act

def _fused_act_kernel(x_ref, b_ref, o_ref):
    x = x_ref[...] + b_ref[...]
    o_ref[...] = jnp.where(x >= 0, x, 0.2 * x) * _SQRT2


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_leaky_relu_tpu(x: jnp.ndarray, bias: jnp.ndarray,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Pallas fused bias+LeakyReLU*sqrt2. x: (..., C); bias: (C,)."""
    if interpret is None:
        interpret = not _on_tpu()
    shape = x.shape
    c = shape[-1]
    n = int(np.prod(shape[:-1]))
    x2 = x.reshape(n, c)
    rows = min(n, 512)
    grid = (pl.cdiv(n, rows),)
    out = pl.pallas_call(
        _fused_act_kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, bias.astype(x.dtype))
    return out.reshape(shape)


# ------------------------------------------------------------------ 4-tap blur

def _blur_rows_kernel(taps, x_ref, o_ref):
    """Vertical 4-tap FIR over a (1, rows+3, W*C) halo block -> (1, rows, W*C)."""
    x = x_ref[0]
    acc = taps[0] * x[0:-3]
    acc += taps[1] * x[1:-2]
    acc += taps[2] * x[2:-1]
    acc += taps[3] * x[3:]
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def blur3x3_tpu(x: jnp.ndarray, taps: tuple[float, float, float, float],
                interpret: bool | None = None) -> jnp.ndarray:
    """Separable 4-tap blur with pad (2, 1) (same resolution), NHWC.

    Equivalent to upfirdn2d(x, outer(taps, taps), up=1, down=1, pad=(2, 1)) —
    the Blur module of StyledConv (reference model.py:78). `taps` static."""
    if interpret is None:
        interpret = not _on_tpu()
    b, h, w, c = x.shape

    def one_axis(v, axis_h: bool):
        # pad 2 before, 1 after along the filtered axis
        if axis_h:
            vp = jnp.pad(v, ((0, 0), (2, 1), (0, 0), (0, 0)))
        else:
            vp = jnp.transpose(v, (0, 2, 1, 3))
            vp = jnp.pad(vp, ((0, 0), (2, 1), (0, 0), (0, 0)))
        bb, hh, ww, cc = vp.shape
        flat = vp.reshape(bb, hh, ww * cc)
        out = pl.pallas_call(
            functools.partial(_blur_rows_kernel, taps),
            out_shape=jax.ShapeDtypeStruct((bb, hh - 3, ww * cc), v.dtype),
            grid=(bb,),
            in_specs=[pl.BlockSpec((1, hh, ww * cc), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, hh - 3, ww * cc), lambda i: (i, 0, 0)),
            interpret=interpret,
        )(flat)
        out = out.reshape(bb, hh - 3, ww, cc)
        if not axis_h:
            out = jnp.transpose(out, (0, 2, 1, 3))
        return out

    return one_axis(one_axis(x, True), False)


# --------------------------------------------------- regional modulation fuse

def _mod_kernel(x_ref, seg_ref, s_ref, o_ref):
    """o = x * (seg @ s): per-pixel regional modulation.

    Blocks: x (1, rows, C); seg (1, rows, K); s (1, K, C)."""
    scale = jnp.dot(seg_ref[0], s_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = x_ref[0] * scale.astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def modulate_demodulate_tpu(x: jnp.ndarray, segmap: jnp.ndarray,
                            scales: jnp.ndarray,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Fused per-pixel regional scale: out[b,h,w,c] = x * sum_k seg[b,h,w,k] *
    scales[b,k,c] — the modulation/demodulation step of the fast regional mode
    in ONE VMEM pass (MXU matmul per tile).

    x: (B, H, W, C); segmap: (B, H, W, K); scales: (B, K, C).
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, h, w, c = x.shape
    k = segmap.shape[-1]
    n = h * w
    rows = min(n, 1024)
    x2 = x.reshape(b, n, c)
    seg2 = segmap.reshape(b, n, k).astype(x.dtype)
    out = pl.pallas_call(
        _mod_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b, pl.cdiv(n, rows)),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, rows, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, k, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(x2, seg2, scales.astype(x.dtype))
    return out.reshape(b, h, w, c)
