from e4s2024_tpu.utils.image import (
    to_pm1,
    from_pm1,
    label_colors,
    colorize_label_map,
    vis_faces_grid,
)
