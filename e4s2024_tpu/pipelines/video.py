"""Video face swapping — batched, frame-sharded, on-device.

Re-design of the reference's 9-stage `FaceSwapVideoPipeline`
(reference face_swap_video_pipeline.py:71): where the reference round-trips
every stage through the filesystem (imgs/, mask/, styleVec/ folders —
SURVEY.md §3.3), this pipeline keeps all frames resident as arrays and batches
every per-frame stage (parse, inversion, synthesis, compositing) so the frame
axis can shard across the device mesh.

Stages:
  1. crop+align all frames with temporally smoothed quads    (:181-210)
  2. (hook) pose-drive source toward each frame + enhance    (:239-314)
  3. parse all frames                                         (:212-237)
  4. per-frame style vectors                                  (:331-354)
  5. PTI generator tuning on the clip (PTICoach)              (:356-390)
  6. per-frame mask merge + style mixing + synthesis          (:392-491)
  7. compositing + perspective paste-back per frame
Video IO (frame extraction / H.264 mux with source audio, reference
gradio_utils/face_swapping.py:53-119) is in e4s2024_tpu.video_io.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.pipelines.alignment import (
    compute_transform_from_landmarks,
    crop_quad,
    paste_back_coefficients,
    smooth_video_quads,
    warp_perspective,
)
from e4s2024_tpu.pipelines.mask_merge import swap_comp_style_vector, swap_head_mask
from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig
from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.training.pti import PTICoach, PTIConfig
from e4s2024_tpu.utils.image import from_pm1, to_pm1

import functools


@functools.partial(jax.jit, static_argnames=("fh", "fw"))
def _paste_back_jit(crop_u8, frame_u8, coeffs, fh, fw):
    """Warp the swapped crop onto the full frame and alpha-compose (one XLA
    program: 2 perspective warps + blend + uint8 quantize)."""
    s = crop_u8.shape[0]
    crop = crop_u8.astype(jnp.float32)
    frame = frame_u8.astype(jnp.float32)
    projected = warp_perspective(crop, coeffs, (fh, fw))
    alpha = warp_perspective(jnp.ones((s, s, 1)), coeffs, (fh, fw))
    out = projected * alpha + frame * (1.0 - alpha)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


@dataclass
class VideoSwapConfig:
    swap: SwapConfig = field(default_factory=SwapConfig)
    pti: PTIConfig = field(default_factory=PTIConfig)
    center_sigma: float = 1.0
    xy_sigma: float = 3.0
    run_pti: bool = True
    frames_per_batch: int = 4


class FaceSwapVideoPipeline:
    """Swap `source_img`'s identity into every frame of a clip.

    `swapper` provides the models; `driven_hook(source_crop, target_crops)`
    optionally implements pose-drive + enhancement (faceVid2Vid/GPEN stage);
    identity fallback uses the source crop for every frame (valid when poses
    are close — the reference also gates reenactment on pose gap,
    Face_swap_with_two_imgs.py:688-700).
    """

    def __init__(self, swapper: FaceSwapper, cfg: VideoSwapConfig = VideoSwapConfig(),
                 loss_params: dict | None = None, mesh=None,
                 driven_hook: Callable | None = None):
        self.swapper = swapper
        self.cfg = cfg
        self.loss_params = loss_params or {}
        self.mesh = mesh
        self.driven_hook = driven_hook

    # ------------- stage 1: alignment -------------

    def align_frames(self, frames: list[np.ndarray]):
        """Crop every frame with temporally smoothed quads. Returns
        (crops (F,S,S,3) float32 [0,255], quads)."""
        s = self.swapper.cfg.out_size
        cs, xs, ys = [], [], []
        for f in frames:
            lm = self.swapper.landmark_fn(f)
            c, x, y = compute_transform_from_landmarks(lm)
            cs.append(c); xs.append(x); ys.append(y)
        quads = smooth_video_quads(cs, xs, ys, self.cfg.center_sigma,
                                   self.cfg.xy_sigma)
        crops = np.stack([
            np.asarray(crop_quad(jnp.asarray(f, jnp.float32),
                                 jnp.asarray(q + 0.5), s))
            for f, q in zip(frames, quads)
        ])
        return crops, quads

    # ------------- stages 3-4: parse + invert (batched) -------------

    def parse_frames(self, crops255: np.ndarray) -> np.ndarray:
        """(F,S,S,3) [0,255] -> (F,512,512) 12-class labels, batched."""
        out = []
        b = self.cfg.frames_per_batch
        for i in range(0, len(crops255), b):
            batch = jnp.asarray(crops255[i:i + b] / 255.0)
            out.append(np.asarray(self.swapper._parse_jit(batch)))
        return np.concatenate(out)

    def style_vectors(self, crops255: np.ndarray, labels: np.ndarray) -> np.ndarray:
        out = []
        b = self.cfg.frames_per_batch
        for i in range(0, len(crops255), b):
            img = jnp.asarray(to_pm1(crops255[i:i + b]))
            onehot = jax.nn.one_hot(jnp.asarray(labels[i:i + b]),
                                    self.swapper.cfg.num_seg_cls)
            out.append(np.asarray(self.swapper._invert_jit(img, onehot)))
        return np.concatenate(out)

    # ------------- full pipeline -------------

    def __call__(self, source_img: np.ndarray, frames: list[np.ndarray],
                 verbose: bool = False) -> list[np.ndarray]:
        cfg = self.swapper.cfg
        s = cfg.out_size

        # 1. align
        t_crops, t_quads = self.align_frames(frames)
        lm = self.swapper.landmark_fn(source_img)
        c, x, y = compute_transform_from_landmarks(lm)
        from e4s2024_tpu.pipelines.alignment import quad_from_cxy
        s_quad = quad_from_cxy(c, x, y)
        s_crop = np.asarray(crop_quad(jnp.asarray(source_img, jnp.float32),
                                      jnp.asarray(s_quad + 0.5), s))

        # 2. pose-drive + enhancement hook
        if self.driven_hook is not None:
            driven = self.driven_hook(s_crop, t_crops)
        else:
            driven = np.repeat(s_crop[None], len(t_crops), axis=0)

        # 3. parse
        d_labels = self.parse_frames(driven)
        t_labels = self.parse_frames(t_crops)

        # 4. style vectors
        d_sv = self.style_vectors(driven, d_labels)
        t_sv = self.style_vectors(t_crops, t_labels)

        # 5-6. mask merge + style mixing, ALL frames in two jitted batched
        # calls (a per-frame eager loop costs a dispatch round-trip per op on
        # high-latency device transports)
        comp = np.asarray(sorted(set(range(cfg.num_seg_cls))
                                 - set(cfg.keep_target_components)))
        merged = jax.jit(jax.vmap(swap_head_mask))(jnp.asarray(d_labels),
                                                   jnp.asarray(t_labels))
        swapped_svs = np.asarray(jax.jit(swap_comp_style_vector)(
            jnp.asarray(t_sv), jnp.asarray(d_sv), jnp.asarray(comp)))
        merged_masks = np.asarray(merged["mask"])
        holes = np.asarray(merged["hole_mask"])

        # 5b. PTI tuning of the generator on this clip
        variables = self.swapper.rgi_variables
        if self.cfg.run_pti and self.cfg.pti.max_pti_steps > 0:
            coach = PTICoach(self.swapper.rgi, self.loss_params, self.cfg.pti,
                             mesh=self.mesh)
            variables, _ = coach.tune(
                variables,
                frames=to_pm1(driven),
                labels=d_labels,
                style_vectors=d_sv,
                recolor=to_pm1(driven),  # recolor target = driven unless a
                                         # Blender recolor hook supplied them
            )
            # params are jit arguments, so the tuned weights take effect
            # without retracing
            self.swapper.rgi_variables = variables

        # 6-7. synthesize + composite + paste back; the paste-back (two
        # perspective warps + alpha compose + quantize) is ONE jitted program
        # per frame shape instead of several eager dispatches per frame
        outputs = []
        for i in range(len(t_crops)):
            out255 = self.swapper._synth_jit(
                jnp.asarray(swapped_svs[i:i + 1]),
                jnp.asarray(merged_masks[i:i + 1]),
                jnp.asarray(holes[i:i + 1]),
                jnp.asarray(to_pm1(t_crops[i:i + 1])),
            )
            coeffs = paste_back_coefficients(t_quads[i], s)
            composed = _paste_back_jit(out255[0], jnp.asarray(frames[i]),
                                       jnp.asarray(coeffs),
                                       frames[i].shape[0],
                                       frames[i].shape[1])
            outputs.append(np.asarray(composed))
        return outputs
