"""In-framework face detection + 68-pt landmarks — no external hooks.

The reference needs dlib / the `face_alignment` package for landmarks
(utils/alignment.py:41-64) and RetinaFace inside GPEN for detection
(swap_face_fine/gpen/retinaface_detection.py:61-131). This module is the
TPU-native replacement: a RetinaFace Flax detector with on-device decode +
fixed-size NMS, and a FAN Flax landmarker batched over faces — so
`FaceSwapper.swap()`, the video pipeline and full-frame GPEN run from raw
uint8 frames standalone.

Design (TPU-first):
  - One static detector input size (aspect-preserving resize + pad on device);
    priors, decode and NMS are all inside the jitted program — only the final
    few boxes leave the chip.
  - NMS is greedy over a static top-K (lax.top_k + O(K^2) IoU + a K-step
    fori_loop) — the data-dependent numpy NMS of the reference
    (utils/nms/py_cpu_nms.py) has no static-shape equivalent cheaper than
    this for K<=256.
  - FAN crops are computed as batched bilinear quad samples on device; all
    faces of a frame (or all frames of a clip) run one batched FAN forward.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.models.fan import FAN, heatmaps_to_landmarks
from e4s2024_tpu.models.retinaface import (
    CFG_MNET,
    CFG_RE50,
    RetinaFace,
    decode_boxes,
    decode_landms,
    generate_priors,
)
from e4s2024_tpu.ops.resize import resize_bilinear
from e4s2024_tpu.pipelines.alignment import crop_quad
from e4s2024_tpu.utils.packing import pack_pytree, unpack_pytree


def pad_to_chunk(arr, chunk: int):
    """Pad a stack's leading axis up to a multiple of `chunk` by repeating
    the last row, so chunked jitted programs keep ONE compiled shape per
    clip (an uneven trailing chunk would otherwise compile an extra program
    for every stage it flows through). Returns (padded, original_length)."""
    n = arr.shape[0]
    rem = n % chunk
    if rem == 0:
        return arr, n
    reps = [1] * arr.ndim
    reps[0] = chunk - rem
    pad = jnp.tile(arr[-1:], reps) if isinstance(arr, jnp.ndarray) \
        else np.tile(np.asarray(arr)[-1:], reps)
    cat = jnp.concatenate if isinstance(arr, jnp.ndarray) else np.concatenate
    return cat([arr, pad]), n


def pairwise_iou(boxes: jnp.ndarray, offset: float = 0.0) -> jnp.ndarray:
    """(K, 4) xyxy boxes -> (K, K) IoU matrix. offset=1.0 reproduces the
    reference's legacy inclusive-pixel convention (py_cpu_nms.py: areas and
    intersections computed with +1)."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0] + offset, 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1] + offset, 0.0)
    tl = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    br = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(br - tl + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, k: int,
              iou_thresh: float):
    """Greedy NMS over the top-k candidates, static shapes.

    Returns (boxes (k, 4), scores (k,), keep (k,) bool, idx (k,) into the
    input) sorted by score. Suppressed rows have keep=False.
    """
    k = min(k, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    b = boxes[idx]
    # offset=1.0: the reference's py_cpu_nms inclusive-pixel IoU
    iou = pairwise_iou(b, offset=1.0)

    def body(i, keep):
        row = jax.lax.dynamic_slice(iou, (i, 0), (1, k))[0]
        suppressed = jnp.any(keep & (row > iou_thresh)
                             & (jnp.arange(k) < i))
        return keep.at[i].set(~suppressed)

    keep = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return b, top_scores, keep, idx


@dataclass
class DetectorConfig:
    det_size: int = 640
    score_thresh: float = 0.9   # reference retinaface_detection.py:61
    nms_thresh: float = 0.4
    pre_nms_topk: int = 256
    max_faces: int = 16


class RetinaFaceDetector:
    """Host wrapper around the jitted detect program.

    `detect(frame)` takes one (H, W, 3) uint8/float RGB frame and returns
    (boxes (F, 4) xyxy in frame pixels, scores (F,), lm5 (F, 5, 2)) for the
    F = faces above threshold, sorted by score. If nothing clears the
    threshold and `fallback_best` is set, the single best-scoring candidate
    is returned (so downstream pipelines always have a face to work with).
    """

    def __init__(self, params: dict, cfg: dict = CFG_MNET,
                 config: DetectorConfig = DetectorConfig(),
                 fallback_best: bool = True):
        self.cfg = cfg
        self.config = config
        self.fallback_best = fallback_best
        self.model = RetinaFace(backbone=cfg["backbone"],
                                out_channel=cfg["out_channel"])
        self._packed, self._meta = pack_pytree(params)
        s = config.det_size
        priors = jnp.asarray(generate_priors((s, s), cfg))
        var = cfg["variance"]

        def run(packed, img):
            # img: (det, det, 3) RGB [0,255] (padded); priors are constants
            p = unpack_pytree(packed, self._meta)
            loc, conf, lmr = self.model.apply({"params": p}, img[None])
            boxes = decode_boxes(loc[0], priors, var) * s
            lm5 = decode_landms(lmr[0], priors, var) * s
            scores = conf[0, :, 1]
            b, sc, keep, idx = nms_fixed(boxes, scores,
                                         config.pre_nms_topk,
                                         config.nms_thresh)
            # rank kept rows first (score-sorted already), then cut to F
            order = jnp.argsort(~keep, stable=True)[:config.max_faces]
            return b[order], sc[order] * keep[order], lm5[idx][order]

        self._run = jax.jit(run)
        # batched over same-size frames (a video clip): ONE program per
        # chunk instead of a dispatch round-trip per frame
        self._run_batch = jax.jit(jax.vmap(run, in_axes=(None, 0)))

        @partial(jax.jit, static_argnames=("nh", "nw"))
        def prep(frames, nh, nw):
            # (B, H, W, 3) any-dtype -> (B, det, det, 3) f32, aspect-
            # preserving resize + zero pad, all on device
            x = resize_bilinear(frames.astype(jnp.float32), (nh, nw))
            return jnp.pad(x, ((0, 0), (0, s - nh), (0, s - nw), (0, 0)))

        self._prep = prep

    def _preprocess(self, frames: jnp.ndarray):
        h, w = frames.shape[1:3]
        s = self.config.det_size
        scale = s / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        return self._prep(frames, nh=nh, nw=nw), scale

    def detect(self, frame: np.ndarray):
        frame = np.asarray(frame)
        imgs, scale = self._preprocess(jnp.asarray(frame)[None])
        boxes, scores, lm5 = jax.device_get(self._run(self._packed, imgs[0]))
        boxes, lm5 = boxes / scale, lm5 / scale
        good = scores > self.config.score_thresh
        if not good.any():
            if not self.fallback_best:
                return (np.zeros((0, 4), np.float32),
                        np.zeros((0,), np.float32),
                        np.zeros((0, 5, 2), np.float32))
            good = np.zeros_like(good)
            good[0] = True  # rows are score-sorted; row 0 is the best
        return boxes[good], scores[good], lm5[good]

    def detect_batch(self, frames, chunk: int = 16):
        """Batched detection over a stack of SAME-SIZE frames (a video
        clip): (B, H, W, 3) -> (boxes (B, K, 4), scores (B, K), lm5
        (B, K, 5, 2)) with K = max_faces, rows score-sorted per frame and
        suppressed rows carrying score 0. One jitted program
        per `chunk` frames — the per-frame dispatch floor of the tunneled
        transport amortizes across the chunk."""
        frames, n = pad_to_chunk(jnp.asarray(frames), chunk)
        outs = []
        for i in range(0, frames.shape[0], chunk):
            imgs, scale = self._preprocess(frames[i:i + chunk])
            b, sc, lm = self._run_batch(self._packed, imgs)
            outs.append((b / scale, sc, lm / scale))
        boxes = np.concatenate([jax.device_get(o[0]) for o in outs])[:n]
        scores = np.concatenate([jax.device_get(o[1]) for o in outs])[:n]
        lm5 = np.concatenate([jax.device_get(o[2]) for o in outs])[:n]
        return boxes, scores, lm5


class FANLandmarker:
    """Batched FAN 68-pt landmarks for detected boxes.

    Crop frame follows face-alignment's box -> (center, scale) rule:
    center = box center shifted down 12% of the height, side = 200 * scale
    with scale = (bw + bh) / 195; the crop itself is a jitted bilinear quad
    sample, the FAN forward and heatmap decode run batched on device.
    """

    def __init__(self, params: dict, num_modules: int = 4,
                 features: int = 256, resolution: int = 256,
                 depth: int = 4):
        self.model = FAN(num_modules=num_modules, features=features,
                         depth=depth)
        self.resolution = resolution
        self._packed, self._meta = pack_pytree(params)

        def crop(frame, center, side):
            half = side / 2.0
            quad = jnp.stack([
                center + jnp.stack([-half, -half]),
                center + jnp.stack([-half, half]),
                center + jnp.stack([half, half]),
                center + jnp.stack([half, -half]),
            ])
            return crop_quad(frame, quad, self.resolution)

        def decode(packed, crops, centers, sides):
            p = unpack_pytree(packed, self._meta)
            hm = self.model.apply({"params": p}, crops / 255.0)[-1]
            pts = heatmaps_to_landmarks(hm.astype(jnp.float32))  # (F, K, 2)
            # heatmap px -> crop px -> frame px (center-aligned sampling)
            hw = hm.shape[1]
            rel = (pts + 0.5) / hw - 0.5  # in (-0.5, 0.5) of the crop
            return centers[:, None, :] + rel * sides[:, None, None]

        def run(packed, frame, centers, sides):
            # frame: (H, W, 3) [0,255]; centers: (F, 2); sides: (F,)
            crops = jax.vmap(lambda c, s: crop(frame, c, s))(centers, sides)
            return decode(packed, crops, centers, sides)

        def run_video(packed, frames, centers, sides):
            # one face per frame, batched: frames (B, H, W, 3), centers
            # (B, 2), sides (B,) — the whole clip's FAN pass is chunked
            # jitted programs instead of a dispatch per frame
            crops = jax.vmap(lambda f, c, s: crop(f.astype(jnp.float32),
                                                  c, s))(frames, centers,
                                                         sides)
            return decode(packed, crops, centers, sides)

        self._run = jax.jit(run)
        self._run_video = jax.jit(run_video)

    @staticmethod
    def box_to_center_side(box: np.ndarray):
        """face-alignment FaceAlignment.get_landmarks box handling."""
        x1, y1, x2, y2 = [float(v) for v in box[:4]]
        center = np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0])
        center[1] -= (y2 - y1) * 0.12
        scale = (x2 - x1 + y2 - y1) / 195.0
        return center, 200.0 * scale

    def landmarks(self, frame: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """frame (H, W, 3) uint8/float, boxes (F, 4) xyxy -> (F, 68, 2)."""
        boxes = np.asarray(boxes, np.float32)
        if boxes.shape[0] == 0:
            return np.zeros((0, 68, 2), np.float32)
        cs = [self.box_to_center_side(b) for b in boxes]
        centers = jnp.asarray(np.stack([c for c, _ in cs]), jnp.float32)
        sides = jnp.asarray(np.array([s for _, s in cs]), jnp.float32)
        out = self._run(self._packed, jnp.asarray(frame, jnp.float32),
                        centers, sides)
        return np.asarray(jax.device_get(out))

    def landmarks_video(self, frames, boxes: np.ndarray,
                        chunk: int = 16) -> np.ndarray:
        """One face per frame, batched: frames (B, H, W, 3), boxes (B, 4)
        xyxy -> (B, 68, 2). Chunked jitted programs over the clip."""
        boxes = np.asarray(boxes, np.float32)
        cs = [self.box_to_center_side(b) for b in boxes]
        centers = np.stack([c for c, _ in cs]).astype(np.float32)
        sides = np.array([s for _, s in cs], np.float32)
        frames, n = pad_to_chunk(jnp.asarray(frames), chunk)
        centers, _ = pad_to_chunk(centers, chunk)
        sides, _ = pad_to_chunk(sides, chunk)
        outs = []
        for i in range(0, frames.shape[0], chunk):
            outs.append(self._run_video(
                self._packed, frames[i:i + chunk],
                jnp.asarray(centers[i:i + chunk]),
                jnp.asarray(sides[i:i + chunk])))
        return np.concatenate(
            [np.asarray(jax.device_get(o)) for o in outs])[:n]


class FaceLandmarkDetector:
    """Detector + landmarker: the framework's standalone `landmark_fn`.

    Calling it with one (H, W, 3) uint8 frame returns the (68, 2) landmarks
    of the best face (the drop-in signature `FaceSwapper`/the video pipeline
    expect); `detect_all` exposes every face with boxes and 5-pt landmarks
    for multi-face paths (full-frame GPEN).
    """

    def __init__(self, detector: RetinaFaceDetector,
                 landmarker: FANLandmarker,
                 min_score: float | None = None):
        self.detector = detector
        self.landmarker = landmarker
        # confidence floor for the single-face path; None keeps the
        # detector's own fallback semantics (demo mode / random weights)
        self.min_score = min_score

    def __call__(self, frame: np.ndarray) -> np.ndarray | None:
        boxes, scores, _ = self.detector.detect(frame)
        if boxes.shape[0] == 0:
            return None
        if self.min_score is not None and float(scores[0]) < self.min_score:
            return None
        return self.landmarker.landmarks(frame, boxes[:1])[0]

    def detect_all(self, frame: np.ndarray):
        """-> (boxes (F, 4), scores (F,), lm5 (F, 5, 2), lm68 (F, 68, 2))."""
        boxes, scores, lm5 = self.detector.detect(frame)
        lm68 = self.landmarker.landmarks(frame, boxes)
        return boxes, scores, lm5, lm68

    def landmarks_video(self, frames, chunk: int = 16):
        """Best face of every frame of a SAME-SIZE clip, fully batched:
        (B, H, W, 3) -> (lm68 (B, 68, 2), scores (B,)). Two chunked jitted
        stages (RetinaFace, FAN) instead of 2 dispatches per frame — the
        video pipeline's detection fast path. Frames whose best score is
        below `min_score` (when set) still return landmarks; callers gate on
        the returned scores (the video contract expects a face per frame —
        reference face_swap_video_pipeline.py:181-210 crops every frame)."""
        boxes, scores, _ = self.detector.detect_batch(frames, chunk)
        best_boxes, best_scores = boxes[:, 0], scores[:, 0]
        lm68 = self.landmarker.landmarks_video(frames, best_boxes, chunk)
        return lm68, best_scores


def _random_init(module, shapes, rng=0):
    return jax.jit(module.init)(jax.random.PRNGKey(rng), *shapes)["params"]


def default_landmarker(weights_dir: str | None = None,
                       det_size: int = 640,
                       network: str = "mobilenet",
                       fan_modules: int = 4,
                       fan_features: int = 256,
                       fan_depth: int = 4,
                       fan_resolution: int = 256) -> FaceLandmarkDetector:
    """Build the standard in-framework landmark stack.

    Looks for converted-or-torch checkpoints under `weights_dir` (or the
    $E4S_WEIGHTS dir): `RetinaFace-mobile0.25.pth` / `RetinaFace-R50.pth`
    and `2DFAN4.pth`. Without weights the nets are randomly initialized —
    the pipeline stays runnable end-to-end (demo/test mode) but landmarks
    are meaningless; a warning says so once.
    """
    from e4s2024_tpu.convert.torch_loader import (
        convert_fan,
        convert_retinaface,
        load_torch_checkpoint,
    )

    weights_dir = weights_dir or os.environ.get("E4S_WEIGHTS", "")
    cfg = CFG_MNET if network == "mobilenet" else CFG_RE50
    det_name = ("RetinaFace-mobile0.25.pth" if network == "mobilenet"
                else "RetinaFace-R50.pth")
    det_path = os.path.join(weights_dir, det_name) if weights_dir else ""
    fan_path = os.path.join(weights_dir, "2DFAN4.pth") if weights_dir else ""

    real_det_weights = bool(det_path and os.path.exists(det_path))
    if real_det_weights:
        det_params = convert_retinaface(load_torch_checkpoint(det_path), cfg)
    else:
        warnings.warn(
            "no RetinaFace checkpoint found — using RANDOM detector weights "
            "(set $E4S_WEIGHTS to a dir with RetinaFace-mobile0.25.pth)")
        det_params = _random_init(
            RetinaFace(backbone=cfg["backbone"],
                       out_channel=cfg["out_channel"]),
            (jnp.zeros((1, det_size, det_size, 3)),))
    fan = FAN(num_modules=fan_modules, features=fan_features,
              depth=fan_depth)
    if fan_path and os.path.exists(fan_path):
        fan_params = convert_fan(load_torch_checkpoint(fan_path),
                                 num_modules=fan_modules, depth=fan_depth)
    else:
        warnings.warn(
            "no 2DFAN4 checkpoint found — using RANDOM landmark weights")
        fan_params = _random_init(
            fan, (jnp.zeros((1, fan_resolution, fan_resolution, 3)),), 1)

    # With real weights, detection confidence is meaningful: disable the
    # best-candidate fallback and gate the single-face path on score_thresh
    # so a faceless frame yields None (and FaceSwapper.swap raises) instead
    # of a confident-garbage swap. Random-weight demo mode keeps the
    # fallback so the pipeline stays runnable end-to-end.
    det_config = DetectorConfig(det_size=det_size)
    det = RetinaFaceDetector(det_params, cfg, det_config,
                             fallback_best=not real_det_weights)
    return FaceLandmarkDetector(
        det, FANLandmarker(fan_params, num_modules=fan_modules,
                           features=fan_features, depth=fan_depth,
                           resolution=fan_resolution),
        min_score=det_config.score_thresh if real_det_weights else None)
