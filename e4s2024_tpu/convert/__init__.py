from e4s2024_tpu.convert.torch_loader import (
    load_torch_checkpoint,
    strip_module_prefix,
    # core RGI / StyleGAN2 family
    convert_generator,
    convert_discriminator,
    convert_encoder,
    convert_rgi,
    # frozen loss nets
    convert_arcface,
    convert_lpips,
    convert_parsing_unet,
    convert_vgg16,
    # parsing / enhancement / recolor zoo
    convert_bisenet,
    convert_gpen,
    convert_rrdbnet,
    convert_blender,
    convert_codeformer,
    convert_swinir,
    convert_gfpgan,
    convert_gcfsr,
    convert_misf,
    # reenactment zoo
    convert_facevid2vid,
    convert_facevid2vid_kp,
    convert_facevid2vid_he,
    convert_facevid2vid_generator,
    convert_tpsmm,
    convert_dagan,
    convert_lia,
    convert_hopenet,
)

__all__ = [n for n in dir() if n.startswith(("convert_", "load_", "strip_"))]
