"""Fused bias-add + LeakyReLU + sqrt(2) gain.

TPU-native replacement for the reference's `fused_bias_act` CUDA extension
(reference models/stylegan2/op/fused_act.py:84, fused_bias_act_kernel.cu:19).

On TPU there is no need for a hand-written kernel with custom double-backward:
the expression `leaky_relu(x + b) * scale` is a handful of VPU ops that XLA fuses
into the producing matmul/conv automatically, and JAX autodiff is exact at every
order (the R1 penalty's second-order gradients, which forced the reference's
custom `FusedLeakyReLUFunctionBackward`, just work).

A Pallas kernel version lives in e4s2024_tpu.ops.pallas.kernels
(`fused_leaky_relu_tpu`); this module is the canonical, fully differentiable
form (and the faster one in practice: XLA fuses it into the producing conv,
which a separate Pallas launch cannot — see ops/pallas/kernels.py docstring).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)

# trace-time backend switch: "xla" (default — the op fuses into the producing
# conv) or "pallas" (e4s2024_tpu.ops.pallas.kernels.fused_leaky_relu_tpu, an
# explicit VPU kernel). Exists so the two forms can be benchmarked against
# each other on real hardware with the same model code (SURVEY §2.1 TPU note).
_BACKEND = "xla"


def set_fused_act_backend(name: str) -> None:
    """Select "xla" | "pallas". Takes effect at the next jit TRACE — call
    before building/tracing a pipeline, not between calls of a compiled fn."""
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown fused-act backend: {name!r}")
    _BACKEND = name


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = _SQRT2,
) -> jnp.ndarray:
    """`leaky_relu(x + bias) * scale` with bias broadcast over the channel axis.

    Layout: channels-last (NHWC / N...C). `bias` has shape (C,).
    """
    if (_BACKEND == "pallas" and bias is not None and x.ndim >= 2
            and negative_slope == 0.2 and scale == _SQRT2):
        from e4s2024_tpu.ops.pallas.kernels import fused_leaky_relu_tpu

        return fused_leaky_relu_tpu(x, bias.astype(x.dtype))
    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU followed by sqrt(2) gain, no bias (reference model.py:172)."""
    return jnp.where(x >= 0, x, x * negative_slope) * _SQRT2
