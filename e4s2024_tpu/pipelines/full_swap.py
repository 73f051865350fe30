"""Full-featured image face swap: reenactment + enhancement + recolor + inpaint.

The complete counterpart of the reference's `FaceSwap.face_swap_pipeline`
(reference Face_swap_with_two_imgs.py:796, SURVEY.md §3.2), composing the
whole model zoo around the core FaceSwapper:

  1-2. alignment + (pose-gap-gated) faceVid2Vid reenactment   (:645,:688)
  3.   enhancement of the driven face (gpen default)          (:836,:606-643)
  4-7. parse -> invert -> mask/style merge -> synthesis       (core FaceSwapper)
  8.   recolor: Blender at 256 + RealESRGAN upscale, edge-aware blend (:522)
  9.   compositing (+ GCFSR inpainting of the hole)           (:159-293)
  10.  perspective paste-back                                  (:264-279)

Every aux model is optional: absent components degrade to identity, so the
PR1 config (enhancers off) runs with just the core models.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.ops.blend import blend_with_mask, sobel_edge, soft_erosion
from e4s2024_tpu.ops.resize import resize_bilinear, resize_nearest
from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig
from e4s2024_tpu.utils.image import from_pm1, to_pm1


@dataclass
class SwapComponents:
    """Pluggable aux models (each may be None)."""

    enhancers: dict = field(default_factory=dict)  # name -> enhance_aligned fn
    pose_driver: Any = None        # FaceVid2VidDriver-like .drive(src01, tgt01)
    pose_estimator: Any = None     # PoseEstimator-like .pose_gap(a, b)
    recolorer: Any = None          # BlenderRecolorer-like .recolor(...)
    upscaler: Any = None           # RealESRGANUpscaler-like .upscale(img255)
    inpainter: Any = None          # FaceInpainter-like .inpaint(img255, hole)
    # params for the W-refinement criterion: "lpips" / "arcface" / "parser".
    # With these present, optimize_W runs the reference's full perceptual
    # objective (reference optimization.py:196-351, optim_options.py:37-39);
    # missing entries disable their term (L2 always on).
    loss_params: dict = field(default_factory=dict)


@dataclass
class FullSwapConfig:
    pose_gap_threshold: float = 20.0   # degrees; reenact only above this gap
    enhancement_mode: str = "gpen"     # reference fixes driven enhance to gpen
    ct_mode: str = "blender"           # "blender" | lct/rct/mkl/sot/... | "none"
    face_inpainting: bool = False
    # W-space refinement of both style vectors before swapping (reference
    # optimize_W path, Face_swap_with_two_imgs.py:483-507; 200 steps Adam 1e-2)
    optimize_w_steps: int = 0
    optimize_w_lr: float = 1e-2
    blend_up_ratio: float = 0.75       # edge-aware recolor blend (:910-924)
    # largest batch executed as ONE fused program call by swap_batch; bigger
    # batches are chunked. None = auto: keep the whole batch at every
    # resolution. Round 4 measured a 1024^2 batched regression (+10% bytes
    # per swap at B=4, scripts/profile_batch1024.py) and chunked to single
    # pairs there, but once the pipeline went device-resident and the
    # enhancer chunked internally the whole-batch program wins again on
    # chip: 5.44 swaps/s whole-batch vs 3.00 chunked-1 vs 3.58 single-pair
    # at B=4 1024^2 (BENCH_FULL_ZOO.json, round 5); at <= 512^2 batching
    # always won (134 vs 71 swaps/s at B=8, BENCH_r03.json). Sharded
    # serving (shard_inference) also keeps the whole batch — the mesh
    # splits it.
    max_fused_batch: int | None = None


class FullFaceSwapPipeline:
    def __init__(self, swapper: FaceSwapper,
                 components: SwapComponents = SwapComponents(),
                 cfg: FullSwapConfig = FullSwapConfig()):
        self.swapper = swapper
        self.comp = components
        self.cfg = cfg
        self._fused_call = None
        self._fused_batch = None
        self._fused_key = None
        self._fused_raw = None
        self._fused_parts = None
        self._shard_args = None

    def _fused_fingerprint(self):
        """Identity of everything the fused build depends on; a change in
        components or config after the first build triggers a rebuild
        instead of being silently ignored."""
        comp, cfg = self.comp, self.cfg
        return (
            cfg.optimize_w_steps, cfg.ct_mode, cfg.enhancement_mode,
            cfg.face_inpainting, cfg.blend_up_ratio,
            tuple(sorted((k, id(v)) for k, v in comp.enhancers.items())),
            id(comp.pose_driver), id(comp.recolorer), id(comp.upscaler),
            id(comp.inpainter),
        )

    # ---------------- stages ----------------

    def _pose_align(self, s_crop255, t_crop255):
        """Stage 2: drive the source toward the target pose when the gap is
        large (reference :688-743). Device-resident in, device-resident out
        (host round trips of full-res floats cost ~300 ms each over a
        tunneled transport)."""
        if self.comp.pose_driver is None:
            return s_crop255
        if self.comp.pose_estimator is not None:
            gap = self.comp.pose_estimator.pose_gap(
                jnp.asarray(s_crop255)[None], jnp.asarray(t_crop255)[None])
            if float(gap) < self.cfg.pose_gap_threshold:
                return s_crop255
        s256 = resize_bilinear(
            jnp.asarray(s_crop255, jnp.float32)[None] / 255.0, (256, 256))
        t256 = resize_bilinear(
            jnp.asarray(t_crop255, jnp.float32)[None] / 255.0, (256, 256))
        driven = self.comp.pose_driver.drive(s256, t256)
        h = s_crop255.shape[0]
        return (resize_bilinear(driven, (h, h)) * 255.0)[0]

    def _enhance(self, img255, mode: str | None = None):
        """Stage 3: face restoration (reference :606-643)."""
        mode = mode or self.cfg.enhancement_mode
        fn = self.comp.enhancers.get(mode)
        if fn is None:
            return img255
        return fn(jnp.asarray(img255, jnp.float32)[None])[0]

    def _recolor_composite(self, rec, swapped255):
        """Edge-aware composite of the low-res recolor onto the full-res swap
        (reference :910-924). Batched (B, h, h, 3) x (B, H, H, 3); traceable —
        the ONE implementation shared by the staged and fused paths."""
        h = swapped255.shape[1]
        rec = resize_bilinear(rec, (h, h))
        swapped = jnp.asarray(swapped255, jnp.float32)
        # edge-aware blend: keep original high-frequency edges
        edge = jnp.clip(sobel_edge(swapped) / 255.0, 0.0, 1.0)
        out = blend_with_mask(rec, swapped, edge,
                              up_ratio=self.cfg.blend_up_ratio)
        return jnp.clip(out, 0, 255)

    def _recolor(self, swapped255, target255, d_label19, t_label19):
        """Stage 8: Blender 256 recolor + x4 upscale + edge-aware blend
        (reference :522-560, :910-924) or classical color transfer."""
        cfg = self.cfg
        if cfg.ct_mode == "none":
            return swapped255
        if cfg.ct_mode == "blender" and self.comp.recolorer is not None:
            rec = self.comp.recolorer.recolor(
                jnp.asarray(swapped255[None], jnp.float32),
                jnp.asarray(target255[None], jnp.float32),
                jnp.asarray(d_label19[None]), jnp.asarray(t_label19[None]))
            if self.comp.upscaler is not None and rec.shape[1] * 4 <= swapped255.shape[0]:
                rec = self.comp.upscaler.upscale(rec)
            return self._recolor_composite(rec, swapped255[None])[0]
        # classical modes (host-side for idt/hist/mix)
        from e4s2024_tpu.ops.color import skin_color_transfer

        out = skin_color_transfer(np.asarray(swapped255) / 255.0,
                                  np.asarray(target255) / 255.0,
                                  cfg.ct_mode)
        return (np.asarray(out) * 255.0).astype(np.float32)

    def _inpaint_composite(self, img255, out, hole_mask):
        """Soft-eroded composite of the inpainted face into the hole
        (reference :223-258). Batched (B, H, H, 3) x (B, h, w); traceable —
        the ONE implementation shared by the staged and fused paths."""
        mask = jnp.asarray(hole_mask, jnp.float32)[..., None]
        mask = resize_bilinear(mask, (img255.shape[1], img255.shape[2]))
        soft, _ = soft_erosion(mask)
        blended = blend_with_mask(jnp.asarray(img255, jnp.float32), out,
                                  soft, 1.0)
        return jnp.clip(blended, 0, 255)

    def _inpaint(self, img255: np.ndarray, hole_mask: np.ndarray):
        """Stage 9b: GCFSR hole inpainting + soft blend (reference :223-258)."""
        if not self.cfg.face_inpainting or self.comp.inpainter is None:
            return img255
        out = self.comp.inpainter.inpaint(
            jnp.asarray(img255[None], jnp.float32), jnp.asarray(hole_mask[None]))
        return self._inpaint_composite(img255[None], out,
                                       hole_mask[None])[0]

    # ---------------- fused one-program path ----------------

    def _maybe_build_fused(self):
        """ONE XLA program for the whole device-side zoo path: enhance ->
        swap -> parse19 -> Blender recolor + x4 + edge blend -> inpaint ->
        uint8. On tunneled device transports every dispatch has a
        milliseconds-scale floor, so the staged path's ~10 program calls per
        swap cost more than the chip compute itself (measured: the RRDB x4
        256->1024 is 1.1 ms of chip time inside a 131 ms staged recolor
        stage). Component params enter as packed per-dtype buffers
        (utils/packing.py) so weight updates flow through without retraces.

        Built lazily; rebuilt whenever components or config changed since
        the last build (fingerprint check — a swapped-in enhancer or a
        toggled cfg flag takes effect on the next call instead of being
        silently ignored). Returns the fused callable or None when the
        config needs host-side logic (pose gating, optimize_W, classical ct
        modes) or a component doesn't expose its packed form."""
        key = self._fused_fingerprint()
        if self._fused_key == key:
            return self._fused_call
        self._fused_key = key
        self._fused_call = self._fused_batch = None
        self._fused_raw = self._fused_parts = None
        sw, comp, cfg = self.swapper, self.comp, self.cfg
        if (cfg.optimize_w_steps > 0 or comp.pose_driver is not None
                or cfg.ct_mode not in ("none", "blender")):
            return None
        # same mode-resolution as the staged path (__call__ -> _enhance)
        mode = "gpen" if "gpen" in comp.enhancers else cfg.enhancement_mode
        enh_fn = comp.enhancers.get(mode)
        enh = getattr(enh_fn, "__self__", None) if enh_fn is not None else None
        if enh_fn is not None and not hasattr(enh, "_fwd"):
            return None
        use_recolor = cfg.ct_mode == "blender" and comp.recolorer is not None
        rec = comp.recolorer if use_recolor else None
        up = comp.upscaler if use_recolor else None
        inp = comp.inpainter if cfg.face_inpainting else None
        for obj in (rec, up, inp):
            if obj is not None and not (hasattr(obj, "_fwd")
                                        and hasattr(obj, "_packed")):
                return None

        meta = sw._pack_meta

        def fused(sw_packed, enh_packed, rec_packed, up_packed, inp_packed,
                  src_u8, tgt_u8):
            # batched: src_u8/tgt_u8 are (B, S, S, 3); every component in the
            # zoo is batch-capable, so B pairs swap in one program (the
            # batched multi-pair mode of BASELINE config 5)
            from e4s2024_tpu.utils.packing import unpack_pytree

            tree = unpack_pytree(sw_packed, meta)
            rgi_vars, bise = tree["rgi"], tree["bise"]
            driven = src_u8.astype(jnp.float32)
            if enh is not None:
                driven = enh._fwd(enh_packed, driven)
            tgt_f = tgt_u8.astype(jnp.float32)
            result = sw._swap_aligned_p(rgi_vars, bise, driven, tgt_f)
            swapped = result["image"].astype(jnp.float32)
            h = swapped.shape[1]
            if rec is not None:
                d19 = sw._parse19_p(bise, driven / 255.0)
                t19 = sw._parse19_p(bise, tgt_f / 255.0)
                rec_out = rec._fwd(rec_packed, swapped, tgt_f, d19, t19)
                if up is not None and rec_out.shape[1] * 4 <= h:
                    rec_out = jnp.clip(up._fwd(up_packed, rec_out) * 255.0,
                                       0, 255)
                swapped = self._recolor_composite(rec_out, swapped)
            if inp is not None:
                out = inp._fwd(inp_packed, swapped, result["hole_mask"])
                swapped = self._inpaint_composite(swapped, out,
                                                  result["hole_mask"])
            return jnp.clip(swapped, 0, 255).astype(jnp.uint8)

        # un-jitted form + resolved components, re-jittable with shardings
        self._fused_raw = fused
        self._fused_parts = (enh, rec, up, inp)
        fused_jit = jax.jit(fused)

        def call_batch(src_u8, tgt_u8):
            return fused_jit(
                sw._packed,
                enh._packed if enh is not None else None,
                rec._packed if rec is not None else None,
                up._packed if up is not None else None,
                inp._packed if inp is not None else None,
                src_u8, tgt_u8)

        def call(src_u8, tgt_u8):
            return call_batch(src_u8[None], tgt_u8[None])[0]

        self._fused_batch = call_batch
        self._fused_call = call
        if self._shard_args is not None:
            # a rebuild must not silently drop serving shardings installed
            # by shard_inference — re-apply them to the fresh program
            self._apply_sharding(*self._shard_args)
        return call

    def shard_inference(self, mesh, axis: str = "dp") -> None:
        """Data-parallel multi-chip serving: re-jit the fused batched swap
        program over `mesh`, sharding the pair-batch axis across `axis` with
        every component's params replicated. One program call serves
        B pairs across all devices — XLA splits the batch, no per-device
        dispatch loop and no collectives on the forward path (each pair is
        independent). This is the serving-side counterpart of the trainer's
        'dp' mesh (parallel/mesh.py); the reference has no serving
        parallelism at all (single-GPU gradio/demo drivers).

        Requires the fused path (raises otherwise, same conditions as
        _maybe_build_fused) and batches divisible by the mesh axis size.
        Subsequent swap_batch calls go through the sharded program."""
        if self._maybe_build_fused() is None:
            raise RuntimeError(
                "sharded serving needs the fused path: disable optimize_W / "
                "pose driving / classical ct modes, and use packed-param "
                "components")
        self._shard_args = (mesh, axis)
        self._apply_sharding(mesh, axis)

    def _apply_sharding(self, mesh, axis: str) -> None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        shd = NamedSharding(mesh, PartitionSpec(axis))
        fused_jit = jax.jit(self._fused_raw,
                            in_shardings=(rep, rep, rep, rep, rep, shd, shd),
                            out_shardings=shd)
        sw = self.swapper
        enh, rec, up, inp = self._fused_parts
        n = mesh.shape[axis]

        def call_batch(src_u8, tgt_u8):
            if src_u8.shape[0] % n:
                raise ValueError(
                    f"batch {src_u8.shape[0]} not divisible by the "
                    f"{n}-device '{axis}' mesh axis")
            return fused_jit(
                sw._packed,
                enh._packed if enh is not None else None,
                rec._packed if rec is not None else None,
                up._packed if up is not None else None,
                inp._packed if inp is not None else None,
                src_u8, tgt_u8)

        self._fused_batch = call_batch

    def _batch_chunk(self, batch: int) -> int:
        """Largest per-call batch for the fused program (see
        FullSwapConfig.max_fused_batch; measured policy)."""
        if self.cfg.max_fused_batch is not None:
            return max(1, self.cfg.max_fused_batch)
        return batch

    def swap_batch(self, source_crops255, target_crops255) -> np.ndarray:
        """Swap B pre-aligned pairs at once: (B, S, S, 3) -> (B, S, S, 3)
        uint8. One fused program per chunk when the config allows it (the
        batched multi-pair path, reference gradio_swap.py batch mode /
        Face_swap_with_two_imgs.py main batch driver :966-1106); the chunk
        size auto-selects the measured-faster execution shape per resolution
        (FullSwapConfig.max_fused_batch). Falls back to per-pair staged
        swaps when the config forces host-side logic."""
        from e4s2024_tpu.pipelines.swap import _as_u8

        if self._maybe_build_fused() is not None:
            src = _as_u8(source_crops255)
            tgt = _as_u8(target_crops255)
            b = src.shape[0]
            chunk = b if self._shard_args is not None else \
                self._batch_chunk(b)
            if chunk >= b:
                return np.asarray(self._fused_batch(src, tgt))
            return np.concatenate([
                np.asarray(self._fused_batch(src[i:i + chunk],
                                             tgt[i:i + chunk]))
                for i in range(0, b, chunk)])
        return np.stack([self(s, t)["image"]
                         for s, t in zip(source_crops255, target_crops255)])

    def swap_raw(self, source_img: np.ndarray,
                 target_img: np.ndarray) -> np.ndarray:
        """Raw-frame entry: detect/align (FaceSwapper's landmark stack), run
        the zoo-enhanced swap on the crops, perspective paste-back — the
        reference's full `FaceSwap.face_swap_pipeline` from unaligned images
        (Face_swap_with_two_imgs.py:796)."""
        return self.swapper.swap(source_img, target_img,
                                 swap_fn=self.swap_batch)

    def swap_raw_multi(self, source_img: np.ndarray,
                       target_img: np.ndarray, **kw) -> np.ndarray:
        """Multi-face raw-frame entry: the source identity onto every face
        detected in the target frame, all crops through one zoo-enhanced
        batch (FaceSwapper.swap_all with the fused batched swap)."""
        return self.swapper.swap_all(source_img, target_img,
                                     swap_fn=self.swap_batch, **kw)

    # ---------------- full pipeline ----------------

    def __call__(self, source_crop255: np.ndarray, target_crop255: np.ndarray,
                 verbose: bool = False, timer=None,
                 return_intermediates: bool = False) -> dict:
        """Swap on pre-aligned crops (use FaceSwapper.swap for full frames).

        Returns dict with the final image; `return_intermediates=True` adds
        the driven face and the swap masks. Intermediates are opt-in because
        every returned array is a device->host fetch — on a tunneled
        transport they cost more than the whole swap's compute (~300 ms for
        the extra 1024^2 planes vs ~350 ms of chip time).

        With `timer` (a `utils.observability.StageTimer`) or `verbose`, each
        stage is timed with a device sync and the result carries
        `stage_times` — device syncs per stage cost throughput, so only
        profile runs should pass one."""
        from e4s2024_tpu.pipelines.swap import _as_u8

        if timer is None and verbose:
            from e4s2024_tpu.utils.observability import StageTimer
            timer = StageTimer()

        if timer is None and not return_intermediates:
            fused = self._maybe_build_fused()
            if fused is not None:
                img = fused(_as_u8(source_crop255), _as_u8(target_crop255))
                return {"image": np.asarray(img)}

        def timed(name, fn, *a):
            if timer is None:
                return fn(*a)
            with timer.stage(name):
                out = fn(*a)
                jax.block_until_ready(out)
            return out

        # host inputs cross the transport as uint8 (4x fewer bytes than the
        # float equivalent — a 1024^2 f32 upload costs ~300 ms on a tunnel);
        # all float casting happens on device
        src_dev = _as_u8(source_crop255)
        target_dev = _as_u8(target_crop255)
        driven = timed("pose_align", self._pose_align, src_dev, target_dev)
        driven = timed("enhance", self._enhance, driven,
                       "gpen" if "gpen" in self.comp.enhancers else None)

        if self.cfg.optimize_w_steps > 0:
            result = timed("optimize_w_swap", self._swap_with_optimized_w,
                           driven, target_dev)
        else:
            result = timed(
                "core_swap", lambda: self.swapper.swap_aligned(
                    jnp.asarray(driven, jnp.float32)[None],
                    target_dev.astype(jnp.float32)[None]))
        swapped = result["image"][0].astype(jnp.float32)  # device

        # 19-class labels for the recolorer
        if self.cfg.ct_mode == "blender" and self.comp.recolorer is not None:
            d19, t19 = timed("parse19", lambda: (
                self.swapper._parse19(
                    jnp.asarray(driven, jnp.float32)[None] / 255.0)[0],
                self.swapper._parse19(
                    target_dev.astype(jnp.float32)[None] / 255.0)[0]))
            swapped = timed("recolor", self._recolor, swapped, target_dev,
                            d19, t19)
        elif self.cfg.ct_mode not in ("none", "blender"):
            swapped = timed("recolor", self._recolor, swapped, target_dev,
                            None, None)

        swapped = timed("inpaint", self._inpaint, swapped,
                        result["hole_mask"][0])
        out = timed("package", self._package, swapped, driven, result,
                    return_intermediates)
        if timer is not None:
            out["stage_times"] = dict(timer.times)
        return out

    def _swap_with_optimized_w(self, driven255, target255):
        """Swap with per-image W-space refinement (reference :483-507)."""
        from e4s2024_tpu.losses.recon import ReconCriterion
        from e4s2024_tpu.training.optim import optimize_style_vectors

        sw = self.swapper
        # reference weights: LPIPS 0.8 + ID 0.1 + face-parsing 0.1 + L2 1.0
        # (ReconCriterion defaults); terms without params fall back to L2-only
        crit = ReconCriterion(self.comp.loss_params)
        pair = jnp.concatenate([
            jnp.asarray(driven255[None], jnp.float32),
            jnp.asarray(target255[None], jnp.float32)], axis=0)
        masks, _ = sw._pair_jit(pair)
        onehot = jax.nn.one_hot(masks, sw.cfg.num_seg_cls)
        svs = []
        for i, img255 in enumerate((driven255, target255)):
            img = jnp.asarray(img255[None], jnp.float32) / 127.5 - 1.0
            sv, _ = optimize_style_vectors(
                sw.rgi, sw.rgi_variables, crit, img, onehot[i:i + 1],
                steps=self.cfg.optimize_w_steps, lr=self.cfg.optimize_w_lr)
            svs.append(sv)
        t255 = jnp.asarray(target255[None], jnp.float32)
        return sw._merge_jit(masks[0:1], masks[1:2], svs[0], svs[1], t255)

    def _package(self, swapped, driven, result, intermediates: bool = False):
        # the ONE host conversion point — everything quantized to uint8 ON
        # DEVICE first (a 1024^2 float fetch costs ~300 ms on a tunneled
        # transport; uint8 is 4x fewer bytes); intermediates only fetched
        # on request
        img_u8 = jnp.clip(jnp.asarray(swapped), 0, 255).astype(jnp.uint8)
        out = {"image": np.asarray(img_u8)}
        if intermediates:
            drv_u8 = jnp.clip(jnp.asarray(driven), 0, 255).astype(jnp.uint8)
            out.update({
                "driven": np.asarray(drv_u8),
                "swapped_mask": np.asarray(
                    result["swapped_mask"][0].astype(jnp.uint8)),
                "hole_mask": np.asarray(result["hole_mask"][0]),
            })
        return out
