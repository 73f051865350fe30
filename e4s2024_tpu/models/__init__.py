from e4s2024_tpu.models.stylegan2 import (
    EqualLinear,
    EqualConv2d,
    ModulatedConv,
    StyledConv,
    ToRGB,
    Generator,
    Discriminator,
    pixel_norm,
)
