from e4s2024_tpu.ops.pallas.kernels import (
    fused_leaky_relu_tpu,
    blur3x3_tpu,
    modulate_demodulate_tpu,
)
