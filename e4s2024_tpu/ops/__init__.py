from e4s2024_tpu.ops.upfirdn import (
    make_kernel,
    upfirdn2d,
    upsample_2x,
    downsample_2x,
    blur,
)
from e4s2024_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from e4s2024_tpu.ops.modconv import modulated_conv2d, regional_modulated_conv2d
from e4s2024_tpu.ops.deform_conv import DCNv2Pack, modulated_deform_conv2d
from e4s2024_tpu.ops.resize import (
    resize_nearest,
    resize_bilinear,
    resize_bilinear_align_corners,
)
