from e4s2024_tpu.pipelines.mask_merge import (
    swap_head_mask,
    swap_comp_style_vector,
)
