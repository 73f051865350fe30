from e4s2024_tpu.convert.torch_loader import (
    convert_generator,
    convert_discriminator,
    convert_encoder,
    convert_rgi,
    load_torch_checkpoint,
    strip_module_prefix,
    convert_arcface,
    convert_lpips,
    convert_parsing_unet,
    convert_bisenet,
    convert_gpen,
    convert_rrdbnet,
)
