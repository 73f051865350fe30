"""Fused bias-add + LeakyReLU + sqrt(2) gain.

TPU-native replacement for the reference's `fused_bias_act` CUDA extension
(reference models/stylegan2/op/fused_act.py:84, fused_bias_act_kernel.cu:19).

On TPU there is no need for a hand-written kernel with custom double-backward:
the expression `leaky_relu(x + b) * scale` is a handful of VPU ops that XLA fuses
into the producing matmul/conv automatically, and JAX autodiff is exact at every
order (the R1 penalty's second-order gradients, which forced the reference's
custom `FusedLeakyReLUFunctionBackward`, just work).

A Pallas kernel version lives in e4s2024_tpu.ops.pallas.fused_act_tpu for the
inference hot path; this module is the canonical, fully differentiable form.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = _SQRT2,
) -> jnp.ndarray:
    """`leaky_relu(x + bias) * scale` with bias broadcast over the channel axis.

    Layout: channels-last (NHWC / N...C). `bias` has shape (C,).
    """
    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU followed by sqrt(2) gain, no bias (reference model.py:172)."""
    return jnp.where(x >= 0, x, x * negative_slope) * _SQRT2
