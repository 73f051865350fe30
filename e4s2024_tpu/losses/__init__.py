from e4s2024_tpu.losses.losses import (
    adv_g_loss,
    adv_d_loss,
    r1_penalty,
    w_norm_loss,
    feature_cosine_loss,
    id_loss_crop,
    multiscale_lpips,
    g_path_lengths_penalty,
)
