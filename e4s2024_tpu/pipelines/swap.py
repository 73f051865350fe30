"""Single-image face swapping — the end-to-end E4S pipeline, fused on device.

TPU-native re-design of the reference's `FaceSwap.face_swap_pipeline`
(reference Face_swap_with_two_imgs.py:796): where the reference ping-pongs
between CUDA modules, PIL and numpy at every stage (§3.2 of SURVEY.md), here
the whole aligned-crop swap — parsing, regional inversion, mask merge, style
mixing, synthesis, compositing — is ONE jitted XLA program; only landmark
detection (pluggable) and file IO stay on host.

Stages (enhancers/reenactment off — the reference's "PR1" CPU-runnable config):
  1. BiSeNet parse of driven + target crops -> 12-class maps        (:839)
  2. RGI style vectors for both                                      (:483)
  3. swapped mask (swap_head_mask) + mixed style vectors             (:455)
  4. regional StyleGAN2 synthesis with the swapped mask              (:889)
  5. compositing: soft-eroded content/border masks, linear content
     paste + multi-band border blend against the target              (:159-219)
  6. optional perspective paste-back onto the original frame         (:264-279)

Pose-drive (faceVid2Vid), enhancement (GPEN/...), recolor (Blender) slot in
between stages via the `driven_hook` once those modules are loaded.
"""

from __future__ import annotations

import functools
import warnings
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.data.labels import _FFHQ_TO_12, NUM_SEG_CLASSES
from e4s2024_tpu.models.bisenet import BiSeNet, bicubic_downsample
from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.ops.blend import laplacian_pyramid_blend_planar, soft_erosion_planar
from e4s2024_tpu.ops.morphology import dilation_planar
from e4s2024_tpu.ops.resize import resize_bilinear, resize_bilinear_planar
from e4s2024_tpu.utils.packing import BoundJit, pack_pytree, unpack_pytree
from e4s2024_tpu.pipelines.mask_merge import swap_head_mask, swap_comp_style_vector
from e4s2024_tpu.pipelines.alignment import (
    compute_transform_from_landmarks,
    quad_from_cxy,
    crop_quad,
    warp_perspective,
    paste_back_coefficients,
)

_SEG_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_SEG_STD = jnp.asarray([0.229, 0.224, 0.225])


def _as_u8(x) -> jnp.ndarray:
    """To uint8 [0,255] — on host for numpy inputs (so only 1/4 of the bytes
    cross the device tunnel), on device for already-resident arrays."""
    if isinstance(x, np.ndarray):
        if x.dtype == np.uint8:
            return jnp.asarray(x)
        return jnp.asarray(np.clip(x, 0, 255).astype(np.uint8))
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        return x
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


@dataclass
class SwapConfig:
    out_size: int = 1024
    num_seg_cls: int = NUM_SEG_CLASSES
    remaining_layer_idx: int = 13
    outer_dilation: int = 2
    # keep target {bg, glasses, hair, neck, ear, earring} (ct_mode branch,
    # reference Face_swap_with_two_imgs.py:469-473)
    keep_target_components: tuple[int, ...] = (0, 10, 4, 8, 7, 11)
    regional_mode: str = "exact"  # "fast" for ~K x faster masked layers
    num_blend_levels: int = 10
    # "staged" compiles parse / invert / synthesize+composite as separate XLA
    # programs (much faster to compile, arrays stay on device between stages);
    # "fused" compiles the whole swap as one program.
    jit_mode: str = "staged"
    # compute dtype for the neural nets ("bfloat16" halves HBM traffic and
    # doubles MXU rate; compositing stays float32 either way)
    compute_dtype: str = "float32"


class FaceSwapper:
    """Holds model params and the jitted swap program.

    Args:
      rgi_variables: {"params": ..., "buffers": {"latent_avg": ...}} for RGINet.
      bisenet_params: BiSeNet parser params.
      config: SwapConfig.
      landmark_fn: optional callable np.uint8 image -> (68, 2) landmarks (host).
    """

    def __init__(self, rgi_variables: dict, bisenet_params: dict,
                 config: SwapConfig = SwapConfig(),
                 landmark_fn: Callable[[np.ndarray], np.ndarray] | None = None):
        self.cfg = config
        self.rgi = RGINet(
            num_seg_cls=config.num_seg_cls,
            out_size=config.out_size,
            remaining_layer_idx=config.remaining_layer_idx,
        )
        self.bisenet = BiSeNet()
        self.landmark_fn = landmark_fn
        self._dtype = jnp.dtype(config.compute_dtype)
        if self._dtype != jnp.float32:
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(self._dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
            rgi_variables = cast(rgi_variables)
            bisenet_params = cast(bisenet_params)
        self._rgi_variables = rgi_variables
        self._bisenet_params = bisenet_params
        # params are passed as jit ARGUMENTS (not closed over): closures would
        # embed the weights as constants in the XLA program, which blows up
        # compile payloads (HTTP 413 on remote-compile backends) and forbids
        # weight updates without retracing. They are passed PACKED — one 1-D
        # buffer per dtype (utils/packing.py): on tunneled transports each
        # argument HANDLE costs ~10 us per call, so the ~500-leaf param trees
        # would add ~5 ms of pure marshalling to every swap.
        self._repack()

        def rgi_p(packed):
            return unpack_pytree(packed, self._pack_meta)["rgi"]

        def both_p(packed):
            t = unpack_pytree(packed, self._pack_meta)
            return t["rgi"], t["bise"]

        # the staged sub-programs exist in BOTH modes (jit compiles lazily, so
        # unused ones cost nothing): optimize_W, the video pipeline and the
        # profiler all drive individual stages even when swaps run fused.
        self._parse_p_jit = jax.jit(
            lambda packed, x: self._parse12_p(both_p(packed)[1], x))
        self._parse19_p_jit = jax.jit(
            lambda packed, x: self._parse19_p(both_p(packed)[1], x))
        self._invert_p_jit = jax.jit(
            lambda packed, img, oh: self._style_vectors_p(rgi_p(packed), img, oh))
        self._synth_p_jit = jax.jit(
            lambda packed, sv, m, hm, t: self._synth_and_composite_p(
                rgi_p(packed), sv, m, hm, t))
        self._pair_p_jit = jax.jit(
            lambda packed, pair: self._parse_invert_p(*both_p(packed), pair))
        self._merge_p_jit = jax.jit(
            lambda packed, dm, tm, dsv, tsv, t: self._merge_synth_composite_p(
                rgi_p(packed), dm, tm, dsv, tsv, t))
        # BoundJit exposes .jitted/.bound_args so cost analysis lowers the
        # underlying program with the packed weights as ARGUMENTS (re-jitting
        # the closure would constant-fold the weights into the HLO payload)
        bound = lambda jfn: BoundJit(jfn, lambda: self._packed)
        self._parse_jit = bound(self._parse_p_jit)
        self._invert_jit = bound(self._invert_p_jit)
        self._synth_jit = bound(self._synth_p_jit)
        self._pair_jit = bound(self._pair_p_jit)
        self._merge_jit = bound(self._merge_p_jit)
        if config.jit_mode == "fused":
            self._swap_fused_jit = jax.jit(
                lambda packed, d, t: self._swap_aligned_p(*both_p(packed), d, t))
            self._swap_jit = (lambda d, t: self._swap_fused_jit(
                self._packed, _as_u8(d), _as_u8(t)))
        else:
            self._swap_jit = self._swap_staged

    # weights are swappable (PTI/stitching write tuned params back); the
    # packed buffers are rebuilt on assignment, compiled fns need no retrace
    # (same shapes/dtypes)
    @property
    def rgi_variables(self):
        return self._rgi_variables

    @rgi_variables.setter
    def rgi_variables(self, v):
        self._repack(rgi=v)
        self._rgi_variables = v

    @property
    def bisenet_params(self):
        return self._bisenet_params

    @bisenet_params.setter
    def bisenet_params(self, v):
        self._repack(bise=v)
        self._bisenet_params = v

    def _repack(self, rgi=None, bise=None):
        """Rebuild the packed buffers; validates BEFORE committing state so a
        bad assignment leaves the swapper usable."""
        packed, meta = pack_pytree({
            "rgi": self._rgi_variables if rgi is None else rgi,
            "bise": self._bisenet_params if bise is None else bise,
        })
        # meta is trace-time constant: keep the FIRST one so weight updates
        # (same structure) never force a retrace via new meta identity
        if not hasattr(self, "_pack_meta"):
            self._pack_meta = meta
        elif (meta[0] != self._pack_meta[0]
              or meta[1] != self._pack_meta[1]):
            # a params assignment with a different tree structure / leaf
            # shapes would silently unpack garbage through the frozen meta
            raise ValueError(
                "params tree structure/shapes changed since the swapper was "
                "built; construct a new FaceSwapper for a different "
                "architecture (packed-buffer meta is frozen at first pack)")
        self._packed = packed

    # ---------------- jitted core ----------------

    def _parse19_p(self, bisenet_params, img01: jnp.ndarray) -> jnp.ndarray:
        """(B, S, S, 3) in [0,1] -> (B, 512, 512) 19-class label map
        (FaceParser preprocessing, reference face_parsing_demo.py:153-171)."""
        h = img01.shape[1]
        if h > 512:
            x = jnp.clip(bicubic_downsample(img01, h // 512), 0.0, 1.0)
        elif h < 512:
            x = resize_bilinear(img01, (512, 512))
        else:
            x = img01
        x = ((x - _SEG_MEAN) / _SEG_STD).astype(self._dtype)
        # logits at 1/8 res; upsample + argmax run PLANAR ((H, W) minor): the
        # full-res NHWC logits pad 19 -> 128 lanes and cost ~2 ms of pure HBM
        # streaming per crop (same align-corners bilinear math either way)
        logits, _, _ = self.bisenet.apply({"params": bisenet_params}, x,
                                          aux=False, upsample=False)
        lp = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)
        lp = resize_bilinear_planar(lp, (512, 512), align_corners=True)
        return jnp.argmax(lp, axis=1)

    def _parse19(self, img01: jnp.ndarray) -> jnp.ndarray:
        # jitted: an eager BiSeNet forward is ~300 per-op dispatches over the
        # device tunnel (~1 s/call) — this is on the recolor stage's path
        return self._parse19_p_jit(self._packed, img01)

    def _parse12_p(self, bisenet_params, img01: jnp.ndarray) -> jnp.ndarray:
        """(B, S, S, 3) in [0,1] -> (B, 512, 512) 12-class label map.

        The 19->12 LUT runs as a where-chain, not a gather (4.8 ms vs
        0.25 ms on TPU for a 512^2 map — see labels.lut_map_tpu)."""
        from e4s2024_tpu.data.labels import lut_map_tpu

        return lut_map_tpu(self._parse19_p(bisenet_params, img01), _FFHQ_TO_12)

    def _parse12(self, img01: jnp.ndarray) -> jnp.ndarray:
        return self._parse12_p(self.bisenet_params, img01)

    def _onehot(self, seg: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.one_hot(seg, self.cfg.num_seg_cls, dtype=jnp.float32)

    def _onehot_for_model(self, labels: jnp.ndarray) -> jnp.ndarray:
        """One-hot seg map at the highest resolution the nets consume.

        With remaining_layer_idx < 17 the deepest masked generator layer is
        at out_size/2 and the encoder pools at <= 64^2, so a full 512^2
        one-hot (which pads 12 -> 128 lanes, ~270 MB of HBM traffic to
        create+read) is never needed. Nearest-downsampling LABELS then
        one-hotting is identical to one-hotting then nearest-downsampling."""
        s = labels.shape[1]
        if self.cfg.remaining_layer_idx < 17:
            target = min(s, max(self.cfg.out_size // 2, 32))
            step = s // target
            if step > 1 and s % target == 0:
                labels = labels[:, ::step, ::step]
        return jax.nn.one_hot(labels, self.cfg.num_seg_cls,
                              dtype=self._dtype)

    def _style_vectors_p(self, rgi_variables, img_pm1, onehot):
        sv, _ = self.rgi.apply(rgi_variables, img_pm1.astype(self._dtype),
                               onehot.astype(self._dtype),
                               method=RGINet.get_style_vectors)
        return sv

    def _style_vectors(self, img_pm1, onehot):
        return self._style_vectors_p(self.rgi_variables, img_pm1, onehot)

    def _composite(self, swapped_pm1, target_pm1, swapped_msk, hole_mask):
        """Reference _past_back (:159-219): content paste + border multiband.

        swapped_msk / hole_mask: (B, Hm, Wm); images (B, S, S, 3)."""
        cfg = self.cfg
        bg = jnp.zeros_like(swapped_msk, dtype=bool)
        for c in (0, 11, 4, 7, 8):
            bg = bg | (swapped_msk == c)
        # The whole compositing stage runs PLANAR (B, C, H, W): NHWC tensors
        # with 1-7 channels pad C to the TPU's 128-lane HBM tile (measured
        # 5-25 ms PER OP at 512^2 in NHWC); with (H, W) minor the masks tile
        # the layout exactly and each op drops to its real bandwidth cost.
        fg = ((~bg) | hole_mask)[:, None].astype(jnp.float32)  # (B,1,Hm,Wm)

        r = cfg.outer_dilation
        # erosion(x) == -dilation(-x) for flat structuring elements, so both
        # morphology passes share ONE windowed reduction; the three soft
        # erosions run as one packed planar call.
        both = dilation_planar(jnp.concatenate([fg, -fg], axis=1), 2 * r + 1)
        full, eroded = both[:, 0:1], -both[:, 1:2]
        soft, _ = soft_erosion_planar(
            jnp.concatenate([full, eroded, fg], axis=1))
        border = jnp.clip(soft[:, 0:1] - soft[:, 1:2], 0.0, 1.0)
        content = soft[:, 2:3]

        size = (cfg.out_size, cfg.out_size)
        cb = resize_bilinear_planar(
            jnp.concatenate([content, border], axis=1), size)
        content, border = cb[:, 0:1], cb[:, 1:2]

        # to [0, 255] for blending, as the reference does
        sw255 = (swapped_pm1.transpose(0, 3, 1, 2) + 1.0) * 127.5
        tg255 = (target_pm1.transpose(0, 3, 1, 2) + 1.0) * 127.5
        out = sw255 * content + tg255 * (1.0 - content)
        out = laplacian_pyramid_blend_planar(
            tg255, out, border, num_levels=cfg.num_blend_levels)
        # emit uint8: the callers all quantize to uint8 anyway, and a 512^2
        # uint8 image streams 4x fewer bytes off-device than f32 (per-call IO
        # is the measured floor on tunneled backends)
        out = jnp.clip(out, 0.0, 255.0).transpose(0, 2, 3, 1)
        return out.astype(jnp.uint8)

    def _synth_and_composite_p(self, rgi_variables, swapped_sv, swapped_mask,
                               hole_mask, t_pm1):
        """Stage 3: codes -> regional synthesis -> composite (jitted).

        swapped_sv: (B, K, D); swapped_mask/hole_mask: (B, Hm, Wm)."""
        style_codes = self.rgi.apply(rgi_variables,
                                     swapped_sv.astype(self._dtype),
                                     method=RGINet.cal_style_codes)
        swapped_onehot = self._onehot_for_model(swapped_mask)
        swapped, _, _ = self.rgi.apply(
            rgi_variables, None, style_codes, swapped_onehot,
            method=RGINet.gen_img,
            regional_mode=self.cfg.regional_mode,
        )
        # compositing runs float32 (bf16 has ~1-unit precision at 255)
        return self._composite(swapped.astype(jnp.float32), t_pm1,
                               swapped_mask, hole_mask)

    def _merge_synth_composite_p(self, rgi_variables, d_masks, t_masks, d_sv,
                                 t_sv, t255):
        """Stages 3b-5 in ONE program: mask merge + style mixing + synthesis +
        compositing, batched over swaps — minimizes per-call dispatches on
        high-latency backends.

        d_masks/t_masks: (B, Hm, Wm); d_sv/t_sv: (B, K, D);
        t255: (B, S, S, 3) uint8 (or float in [0, 255]).
        """
        t_pm1 = t255.astype(jnp.float32) / 127.5 - 1.0
        merged = jax.vmap(lambda a, b: swap_head_mask(a, b))(d_masks, t_masks)
        comp = jnp.asarray(sorted(set(range(self.cfg.num_seg_cls))
                                  - set(self.cfg.keep_target_components)))
        swapped_sv = swap_comp_style_vector(t_sv, d_sv, comp)
        out255 = self._synth_and_composite_p(
            rgi_variables, swapped_sv, merged["mask"], merged["hole_mask"],
            t_pm1)
        return {
            "image": out255,
            "swapped_mask": merged["mask"],
            "hole_mask": merged["hole_mask"],
            "swapped_style_vectors": swapped_sv,
        }

    def _synth_and_composite(self, swapped_sv, swapped_mask, hole_mask, t_pm1):
        return self._synth_and_composite_p(self.rgi_variables, swapped_sv,
                                           swapped_mask, hole_mask, t_pm1)

    def _parse_invert_p(self, rgi_variables, bisenet_params, pair255):
        """Stages 1-2 in ONE program over the (driven, target) pair batch.

        pair255: (2B, S, S, 3) uint8 (or float in [0, 255])."""
        img01 = pair255.astype(jnp.float32) / 255.0
        masks = self._parse12_p(bisenet_params, img01)
        onehot = self._onehot_for_model(masks)
        sv = self._style_vectors_p(rgi_variables, img01 * 2.0 - 1.0, onehot)
        return masks, sv

    def _swap_staged(self, driven255, target255):
        """Staged-jit swap: 2 XLA programs (parse+invert batched over all
        driven+target crops; merge+mix+synth+composite fused and batched).

        driven255/target255: (B, S, S, 3) — B swaps at once."""
        b = driven255.shape[0]
        d_u8, t_u8 = _as_u8(driven255), _as_u8(target255)
        masks, sv = self._pair_jit(jnp.concatenate([d_u8, t_u8], axis=0))
        return self._merge_jit(masks[:b], masks[b:], sv[:b], sv[b:], t_u8)

    def _swap_aligned_p(self, rgi_variables, bisenet_params, driven255,
                        target255):
        """Fused one-program swap (params as explicit args — pure function,
        safe to retrace/jit concurrently).

        driven/target: (B, S, S, 3) uint8/float aligned crops in [0, 255].
        Returns dict with swapped uint8 image, swapped mask, hole mask —
        same math as the staged path, expressed as one traceable function."""
        b = driven255.shape[0]
        pair = jnp.concatenate([driven255, target255], axis=0)
        masks, sv = self._parse_invert_p(rgi_variables, bisenet_params, pair)
        return self._merge_synth_composite_p(
            rgi_variables, masks[:b], masks[b:], sv[:b], sv[b:], target255)

    # ---------------- host-side orchestration ----------------

    def ensure_landmark_fn(self):
        """The active landmark callable; builds the in-framework RetinaFace +
        FAN stack (pipelines/detect.py) on first use when none was supplied —
        the pipeline runs standalone from raw frames, no external hooks."""
        if self.landmark_fn is None:
            from e4s2024_tpu.pipelines.detect import default_landmarker

            self.landmark_fn = default_landmarker()
        return self.landmark_fn

    def swap_aligned(self, driven255, target255):
        """Jitted aligned-crop swap. Inputs (B, S, S, 3) uint8 or float in
        [0, 255]; the swapped image comes back uint8."""
        return self._swap_jit(_as_u8(driven255), _as_u8(target255))

    def swap(self, source_img: np.ndarray, target_img: np.ndarray,
             swap_fn=None) -> np.ndarray:
        """Full swap with alignment + paste-back, standalone: uses the
        supplied `landmark_fn` or the in-framework detector stack.

        source/target: (H, W, 3) uint8 frames. Returns the target frame with
        the swapped face pasted back (uint8). `swap_fn` optionally replaces
        the core aligned swap with another (B,S,S,3)->(B,S,S,3) uint8 swap —
        e.g. FullFaceSwapPipeline.swap_batch for the zoo-enhanced path."""
        landmark_fn = self.ensure_landmark_fn()
        s = self.cfg.out_size
        crops, quads = [], []
        for name, img in (("source", source_img), ("target", target_img)):
            lm = landmark_fn(img)
            if lm is None:
                raise ValueError(
                    f"no face found in the {name} image (no detection "
                    "cleared the confidence threshold)")
            c, x, y = compute_transform_from_landmarks(lm)
            quad = quad_from_cxy(c, x, y)
            crop = crop_quad(jnp.asarray(img, jnp.float32),
                             jnp.asarray(quad + 0.5), s)
            crops.append(crop[None])
            quads.append(quad)

        if swap_fn is not None:
            swapped = jnp.asarray(swap_fn(crops[0], crops[1])[0], jnp.float32)
        else:
            result = self.swap_aligned(crops[0], crops[1])
            swapped = result["image"][0].astype(jnp.float32)

        coeffs = paste_back_coefficients(quads[1], s)
        projected = warp_perspective(swapped, jnp.asarray(coeffs),
                                     target_img.shape[:2])
        # alpha-composite: inside the quad use the projection
        alpha = warp_perspective(jnp.ones((s, s, 1)), jnp.asarray(coeffs),
                                 target_img.shape[:2])
        out = (projected * alpha
               + jnp.asarray(target_img, jnp.float32) * (1.0 - alpha))
        return np.asarray(jnp.clip(out, 0, 255)).astype(np.uint8)

    def swap_all(self, source_img: np.ndarray, target_img: np.ndarray,
                 swap_fn=None, max_faces: int = 8,
                 min_score: float = 0.5) -> np.ndarray:
        """Multi-face raw-frame swap: the source identity onto EVERY face
        detected in the target frame. All F target crops go through the
        aligned swap as ONE batch (one program call), then paste back
        face by face. The reference swaps only one face per frame; its only
        multi-face path is GPEN's full-frame restore (gpen_demo.py:18-121).

        Needs the in-framework detector (FaceLandmarkDetector.detect_all);
        a plain single-face `landmark_fn` hook raises. Faces below
        `min_score` are skipped; at most `max_faces` (sorted by detector
        score) are swapped. Returns the frame unchanged when no face is
        found."""
        landmark_fn = self.ensure_landmark_fn()
        if not hasattr(landmark_fn, "detect_all"):
            raise RuntimeError(
                "swap_all needs the in-framework detector stack "
                "(pipelines.detect.FaceLandmarkDetector); the configured "
                "landmark_fn hook only yields one face — use swap() or "
                "supply a FaceLandmarkDetector")
        s = self.cfg.out_size
        src_lm = landmark_fn(source_img)
        if src_lm is None:
            raise ValueError("no face detected in the source image")
        c, x, y = compute_transform_from_landmarks(src_lm)
        src_crop = crop_quad(jnp.asarray(source_img, jnp.float32),
                             jnp.asarray(quad_from_cxy(c, x, y) + 0.5), s)

        _, scores, _, lm68 = landmark_fn.detect_all(target_img)
        order = np.argsort(np.asarray(scores))[::-1][:max_faces]
        order = [i for i in order if float(scores[i]) >= min_score]
        if not order:
            return np.asarray(target_img, np.uint8)
        quads, crops = [], []
        for i in order:
            # one degenerate detection in a group photo must not abort the
            # good swaps: skip it (warn) and keep going
            try:
                c, x, y = compute_transform_from_landmarks(
                    np.asarray(lm68[i]))
            except ValueError as e:
                warnings.warn(f"skipping face {i}: {e}")
                continue
            quad = quad_from_cxy(c, x, y)
            quads.append(quad)
            crops.append(crop_quad(jnp.asarray(target_img, jnp.float32),
                                   jnp.asarray(quad + 0.5), s))
        if not quads:
            raise ValueError(
                f"all {len(order)} detected faces had degenerate landmarks "
                "— nothing usable to swap")
        tgt_batch = jnp.stack(crops)
        src_batch = jnp.broadcast_to(src_crop, tgt_batch.shape)
        if swap_fn is not None:
            swapped = jnp.asarray(swap_fn(src_batch, tgt_batch), jnp.float32)
        else:
            swapped = self.swap_aligned(src_batch,
                                        tgt_batch)["image"].astype(jnp.float32)

        out = jnp.asarray(target_img, jnp.float32)
        for i, quad in enumerate(quads):
            coeffs = jnp.asarray(paste_back_coefficients(quad, s))
            projected = warp_perspective(swapped[i], coeffs,
                                         target_img.shape[:2])
            alpha = warp_perspective(jnp.ones((s, s, 1)), coeffs,
                                     target_img.shape[:2])
            out = projected * alpha + out * (1.0 - alpha)
        return np.asarray(jnp.clip(out, 0, 255)).astype(np.uint8)
