"""PTI per-video generator tuning + boundary-stitching tuning, frame-sharded.

Re-designs of the reference coaches:

- `PTICoach` ~ VideoSwapPTICoach (reference training/video_swap_ft_coach.py:239):
  fine-tune the generator on a clip so every frame's (fixed) style vectors
  reconstruct the driven frames, with a recolor-guidance term
  (recolor_lambda=5, foreground-masked). The reference loops frames serially,
  taking one optimizer step per frame per outer step (:242-317); here frames
  are a batch axis sharded over the device mesh, so one optimizer step uses
  the frame-MEAN gradient (the psum the mesh gives for free, SURVEY.md §5.7)
  — the natural TPU formulation of the same objective.

- `StitchingCoach` ~ VideoSwapStichingCoach (training/video_swap_stich_coach.py:208):
  tune the generator so synthesis matches the PTI result in the face (content)
  region and the target frame in the dilated border ring
  (calc_loss_withBorderMask, :153-205); lr 1e-2, 100 steps.

Mask preprocessing (`eroded_label_map` ~ erode_mask, video_swap_ft_coach.py:64-93)
runs on device via the morphology ops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from e4s2024_tpu.losses.recon import ReconCriterion
from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.ops.morphology import erosion
from e4s2024_tpu.ops.resize import resize_bilinear
from e4s2024_tpu.training.coach import _g_trainable_mask, TrainConfig


def to_pm1_f32(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> f32 [-1,1]; float inputs pass through (already pm1)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 127.5 - 1.0
    return x


def eroded_label_map(label: jnp.ndarray, radius: int = 3) -> jnp.ndarray:
    """Erode the face region of a (B, H, W) 12-class map; non-face (bg/hair/
    earring) and eroded-away pixels become background (reference
    video_swap_ft_coach.py:64-93)."""
    face = ~((label == 0) | (label == 4) | (label == 11))
    face_f = face[..., None].astype(jnp.float32)
    eroded = erosion(face_f, 2 * radius + 1)[..., 0] > 0.5
    return jnp.where(eroded, label, 0)


def foreground_mask_from_label(label: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, H, W) -> (B, size, size, 1) float foreground (non bg/hair/earring)
    mask (reference video_swap_ft_coach.py:296-300)."""
    fg = ~((label == 0) | (label == 4) | (label == 11))
    return resize_bilinear(fg[..., None].astype(jnp.float32), (size, size))


@dataclass
class PTIConfig:
    """Reference defaults: gradio_swap.py:146-148,
    our_swap_face_pipeline_options.py:20-45."""

    max_pti_steps: int = 80
    learning_rate: float = 1e-3
    recolor_lambda: float = 5.0
    erode_radius: int = 3
    erode: bool = False
    # loss weights (pti coach uses the standard recon combo)
    lpips_lambda: float = 0.8
    id_lambda: float = 0.1
    face_parsing_lambda: float = 0.1
    l2_lambda: float = 1.0
    # memory controls for full-res clips: the frame-mean gradient over a
    # whole clip at 1024^2/512^2 does not fit HBM if every frame's
    # activations are live at once. `remat` wraps the synthesis in
    # jax.checkpoint (recompute activations in the backward pass);
    # `frames_per_chunk` accumulates the gradient over frame chunks inside
    # ONE jitted step via lax.scan (exact same frame-mean objective when
    # the chunk size divides the frame count — tune() picks the largest
    # divisor <= this). Single-device only; on a mesh the frame axis is
    # already sharded across devices.
    regional_mode: str = "exact"
    remat: bool = True
    # 2 frames/chunk fits 512^2 exact-mode tuning in 16G HBM (the masked
    # layers carry a frames x 12-region batch; measured: 5 frames/chunk
    # peaks at 17.2G and OOMs)
    frames_per_chunk: int | None = 2
    # Stochastic frame mini-batches: each optimizer step uses a random
    # mini-batch of `frames_per_step` frames instead of the whole clip's
    # frame-mean gradient. Parity-faithful — the reference also never sees
    # the full clip per update (it steps per-FRAME serially,
    # video_swap_ft_coach.py:242-317); this is the standard SGD formulation
    # of the same objective and cuts per-step cost by F/frames_per_step.
    # None = full-clip frame-mean (the round-2 behavior). Single-device only
    # (on a mesh the frame axis is already sharded).
    frames_per_step: int | None = None
    # "bfloat16" runs synthesis + losses in bf16 (params/optimizer stay
    # f32): halves HBM traffic and doubles MXU rate on TPU
    compute_dtype: str = "float32"
    sample_seed: int = 0
    # Fuse this many optimizer steps into ONE device program (lax.scan over
    # steps): an 80-step tune becomes 8 dispatches instead of 80, so the
    # per-dispatch floor of high-latency transports (remote-TPU tunnels)
    # amortizes 10x and the whole segment schedules as one XLA program.
    # Identical update sequence to the per-step loop (same minibatch
    # permutation, same step math). None/1 = one dispatch per step.
    # Single-device paths only; a mesh already amortizes via sharding.
    scan_steps: int | None = 10


class PTICoach:
    """Per-video generator fine-tune with the frame axis on the mesh."""

    def __init__(self, net: RGINet, loss_params: dict, cfg: PTIConfig = PTIConfig(),
                 mesh=None):
        self.net = net
        self.cfg = cfg
        self.mesh = mesh
        self.criterion = ReconCriterion(
            loss_params, lpips_lambda=cfg.lpips_lambda, id_lambda=cfg.id_lambda,
            face_parsing_lambda=cfg.face_parsing_lambda, l2_lambda=cfg.l2_lambda)
        self.tx = None
        self._init_jit = None
        if mesh is not None:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("fr"))
            self._step = jax.jit(
                self._train_step,
                in_shardings=((repl, repl), repl, data, data, data, data),
                out_shardings=((repl, repl), repl),
                donate_argnums=(0,),
            )
        else:
            self._step = jax.jit(self._train_step, donate_argnums=(0,))
        self._scan_jit = None
        self._scan_full_jit = None

    def _build_tx(self, params):
        cfg_like = TrainConfig(out_size=self.net.out_size,
                               remaining_layer_idx=self.net.remaining_layer_idx)
        mask = _g_trainable_mask(params, cfg_like)
        self.tx = optax.multi_transform(
            {True: optax.adam(self.cfg.learning_rate), False: optax.set_to_zero()},
            mask)

    def _build_scan(self):
        """Jitted multi-step programs: lax.scan over optimizer steps, so a
        whole segment of the tune is ONE dispatch. Two flavors — stochastic
        mini-batch (scans precomputed index rows) and full-clip (scans a
        static step count). The scan body is `_train_step` verbatim, so the
        update sequence is bit-identical to the per-step loop."""
        def scan_mb(carry, buffers, frames, labels, svs, recolor, idxs):
            def body(c, idx):
                return self._train_step(c, buffers, frames, labels, svs,
                                        recolor, idx)
            return jax.lax.scan(body, carry, idxs)

        self._scan_jit = jax.jit(scan_mb, donate_argnums=(0,))

        def scan_full(n_steps, carry, buffers, frames, labels, svs, recolor):
            def body(c, _):
                return self._train_step(c, buffers, frames, labels, svs,
                                        recolor)
            return jax.lax.scan(body, carry, None, length=n_steps)

        self._scan_full_jit = jax.jit(scan_full, static_argnums=(0,),
                                      donate_argnums=(1,))

    def _synth(self, params, buffers, style_vectors, onehot):
        def synth(p, sv, oh):
            v = {"params": p, "buffers": buffers}
            codes = self.net.apply(v, sv, method=RGINet.cal_style_codes)
            recon, _, _ = self.net.apply(v, None, codes, oh,
                                         method=RGINet.gen_img,
                                         regional_mode=self.cfg.regional_mode)
            return recon

        if self.cfg.remat:
            synth = jax.checkpoint(synth)
        return synth(params, style_vectors, onehot)

    def _chunk_loss(self, params, buffers, frames, labels, style_vectors,
                    recolor):
        cfg = self.cfg
        # frames/recolor may be uint8 [0,255] (the resident form — 4x fewer
        # H2D bytes and HBM than f32 pm1; parity-faithful, the reference
        # round-trips driven/recolor frames through 8-bit image files between
        # stages): convert to pm1 on device. labels arrive as an int map and
        # one-hot HERE, inside the program — a resident f32 one-hot of a
        # 100-frame 512^2 clip is 1.26 GB (12x the label map) and was most of
        # the old tune() setup cost.
        frames, recolor = (to_pm1_f32(x) for x in (frames, recolor))
        onehot = jax.nn.one_hot(labels.astype(jnp.int32),
                                self.net.num_seg_cls, dtype=jnp.float32)
        if cfg.compute_dtype != "float32":
            # mixed precision: f32 master params, bf16 synthesis + losses;
            # grad of the cast is the cast back, so grads stay f32 for Adam
            dt = jnp.dtype(cfg.compute_dtype)
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(dt)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
            params, buffers = cast(params), cast(buffers)
            frames, onehot, style_vectors, recolor = (
                cast(frames), cast(onehot), cast(style_vectors), cast(recolor))
        recon = self._synth(params, buffers, style_vectors, onehot)
        loss, metrics = self.criterion(recon, frames)
        fg = jnp.max(onehot[..., [1, 2, 3, 5, 6, 7, 8, 9, 10]], axis=-1)
        fg = resize_bilinear(fg[..., None], (recon.shape[1], recon.shape[2]))
        rloss, _ = self.criterion(recon * fg, recolor * fg)
        loss = loss + cfg.recolor_lambda * rloss
        metrics["loss_recolor"] = rloss
        metrics["loss"] = loss
        # f32 loss/metrics regardless of compute dtype (bf16 accumulators
        # lose ~3 decimal digits over a scan)
        loss = loss.astype(jnp.float32)
        metrics = jax.tree_util.tree_map(
            lambda m: m.astype(jnp.float32), metrics)
        return loss, metrics

    def _train_step(self, carry, buffers, frames, labels, style_vectors,
                    recolor, idx=None):
        """One optimizer step on the frame-MEAN gradient. Inputs either
        (F, ...) — single pass — or chunked (n, cs, ...) — lax.scan gradient
        accumulation, identical objective (chunks are equal-sized). With
        `idx` (stochastic mini-batch mode) the full clip stays resident and
        the step gathers its mini-batch on device, then chunks it."""
        params, opt = carry
        if idx is not None:
            frames, labels, style_vectors, recolor = (
                jnp.take(x, idx, axis=0)
                for x in (frames, labels, style_vectors, recolor))
            m = idx.shape[0]
            cpc = self.cfg.frames_per_chunk
            if cpc and m > cpc:
                cs = max(d for d in range(1, cpc + 1) if m % d == 0)
                if cs < m:
                    frames, labels, style_vectors, recolor = (
                        x.reshape((m // cs, cs) + x.shape[1:])
                        for x in (frames, labels, style_vectors, recolor))
        grad_fn = jax.value_and_grad(self._chunk_loss, has_aux=True,
                                     argnums=0)

        if frames.ndim == 4:  # (F, H, W, 3): whole clip at once
            (_, metrics), grads = grad_fn(params, buffers, frames, labels,
                                          style_vectors, recolor)
        else:                 # (n, cs, ...): accumulate over chunks
            n = frames.shape[0]
            m_shape = jax.eval_shape(
                lambda p: self._chunk_loss(p, buffers, frames[0], labels[0],
                                           style_vectors[0], recolor[0])[1],
                params)
            zeros = (jax.tree_util.tree_map(jnp.zeros_like, params),
                     jax.tree_util.tree_map(
                         lambda s: jnp.zeros(s.shape, s.dtype), m_shape))

            def body(acc, xs):
                fr, lb, sv, rc = xs
                (_, m), g = grad_fn(params, buffers, fr, lb, sv, rc)
                g_acc = jax.tree_util.tree_map(jnp.add, acc[0], g)
                m_acc = jax.tree_util.tree_map(jnp.add, acc[1], m)
                return (g_acc, m_acc), None

            (grads, metrics), _ = jax.lax.scan(
                body, zeros, (frames, labels, style_vectors, recolor))
            grads = jax.tree_util.tree_map(lambda g: g / n, grads)
            metrics = jax.tree_util.tree_map(lambda m: m / n, metrics)

        updates, opt = self.tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt), metrics

    def _init_carry(self, params):
        """(copied params, fresh opt state) in ONE jitted dispatch. The step
        donates its carry, so the caller's arrays must not be aliased —
        jnp.copy inside jit materializes fresh buffers; eagerly tree-mapping
        jnp.copy dispatches hundreds of tiny ops (seconds over a tunneled
        transport)."""
        if self._init_jit is None:
            self._init_jit = jax.jit(lambda p: (
                jax.tree_util.tree_map(jnp.copy, p), self.tx.init(p)))
        return self._init_jit(params)

    @staticmethod
    def _sync_history(history: list) -> list:
        """Device metric dicts -> per-step host float dicts in one batched
        fetch per key. Entries are scalar dicts (per-step loop) or
        (S,)-stacked dicts (scan segments); both concatenate device-side so
        the host pays one fetch per key, not one per step — per-step float()
        syncs serialize the loop (measured: +80 ms/step on the tunnel, and
        they block async dispatch pipelining)."""
        if not history:
            return history
        keys = list(history[0].keys())
        flat = jax.device_get({
            k: jnp.concatenate([jnp.atleast_1d(h[k]) for h in history])
            for k in keys})
        n = len(flat[keys[0]])
        return [{k: float(flat[k][i]) for k in keys} for i in range(n)]

    def tune(self, variables: dict, frames, labels, style_vectors, recolor,
             steps: int | None = None):
        """Fine-tune the generator on a clip.

        frames/recolor: (F, S, S, 3) — uint8 [0,255] (preferred: 4x fewer
        transfer/HBM bytes; the reference passes these stages through 8-bit
        image files) or float in [-1, 1]; labels: (F, Hm, Wm) int 12-class
        (uint8 welcome); style_vectors: (F, K, 1280).

        Returns (tuned variables, per-step metrics list)."""
        cfg = self.cfg
        params = variables["params"]
        buffers = variables["buffers"]
        if self.tx is None:
            self._build_tx(params)
        if cfg.erode:
            labels = eroded_label_map(jnp.asarray(labels), cfg.erode_radius)
        labels = jnp.asarray(labels)
        frames = jnp.asarray(frames)
        recolor = jnp.asarray(recolor)
        style_vectors = jnp.asarray(style_vectors)

        f = frames.shape[0]
        n_steps = steps if steps is not None else cfg.max_pti_steps
        carry = self._init_carry(params)
        history = []

        if (self.mesh is None and cfg.frames_per_step
                and f > cfg.frames_per_step):
            # stochastic mini-batch mode: epoch-style coverage — a shuffled
            # permutation is consumed frames_per_step at a time, reshuffled
            # when exhausted, so every frame is visited before any repeats
            m = cfg.frames_per_step
            prng = np.random.default_rng(cfg.sample_seed)
            perm, pos = prng.permutation(f), 0
            rows = []
            for _ in range(n_steps):
                if pos + m > f:
                    perm, pos = prng.permutation(f), 0
                rows.append(perm[pos:pos + m])
                pos += m
            i = 0
            seg = cfg.scan_steps or 0
            if seg > 1 and n_steps >= seg:
                if self._scan_jit is None:
                    self._build_scan()
                while n_steps - i >= seg:
                    idxs = jnp.asarray(np.stack(rows[i:i + seg]))
                    carry, metrics = self._scan_jit(
                        carry, buffers, frames, labels, style_vectors,
                        recolor, idxs)
                    history.append(metrics)
                    i += seg
            for j in range(i, n_steps):  # remainder: per-step dispatch
                carry, metrics = self._step(carry, buffers, frames, labels,
                                            style_vectors, recolor,
                                            jnp.asarray(rows[j]))
                history.append(metrics)
            params, _ = carry
            return ({"params": params, "buffers": buffers},
                    self._sync_history(history))

        # frame-chunked gradient accumulation (single-device; on a mesh the
        # frame axis shards across devices instead): largest divisor of F
        # <= frames_per_chunk keeps the frame-mean objective exact
        if (self.mesh is None and cfg.frames_per_chunk
                and f > cfg.frames_per_chunk):
            cs = max(d for d in range(1, cfg.frames_per_chunk + 1)
                     if f % d == 0)
            n = f // cs
            frames, labels, style_vectors, recolor = (
                x.reshape((n, cs) + x.shape[1:])
                for x in (frames, labels, style_vectors, recolor))

        i = 0
        seg = cfg.scan_steps or 0
        if self.mesh is None and seg > 1 and n_steps >= seg:
            if self._scan_full_jit is None:
                self._build_scan()
            while n_steps - i >= seg:
                carry, metrics = self._scan_full_jit(
                    seg, carry, buffers, frames, labels, style_vectors,
                    recolor)
                history.append(metrics)
                i += seg
        for _ in range(i, n_steps):  # remainder: per-step dispatch
            carry, metrics = self._step(carry, buffers, frames, labels,
                                        style_vectors, recolor)
            history.append(metrics)
        params, _ = carry
        return ({"params": params, "buffers": buffers},
                self._sync_history(history))


@dataclass
class StitchingConfig:
    """Reference defaults: our_swap_face_pipeline_options.py:19,33,36."""

    max_steps: int = 100
    learning_rate: float = 1e-2
    outer_dilation: int = 15
    lpips_lambda: float = 0.8
    id_lambda: float = 0.0
    face_parsing_lambda: float = 0.0
    l2_lambda: float = 1.0
    # memory controls — same scheme as PTIConfig (remat + frame-chunked
    # gradient accumulation on a single device)
    regional_mode: str = "exact"
    remat: bool = True
    # 2 frames/chunk fits 512^2 exact-mode tuning in 16G HBM (the masked
    # layers carry a frames x 12-region batch; measured: 5 frames/chunk
    # peaks at 17.2G and OOMs)
    frames_per_chunk: int | None = 2
    # optimizer steps fused per device program (see PTIConfig.scan_steps)
    scan_steps: int | None = 10


class StitchingCoach:
    """Boundary-stitching generator tune (content vs PTI result, border vs
    target frame)."""

    def __init__(self, net: RGINet, loss_params: dict,
                 cfg: StitchingConfig = StitchingConfig(), mesh=None):
        self.net = net
        self.cfg = cfg
        self.mesh = mesh
        self.criterion = ReconCriterion(
            loss_params, lpips_lambda=cfg.lpips_lambda, id_lambda=cfg.id_lambda,
            face_parsing_lambda=cfg.face_parsing_lambda, l2_lambda=cfg.l2_lambda)
        self.tx = None
        self._init_jit = None
        if mesh is not None:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("fr"))
            self._step = jax.jit(
                self._train_step,
                in_shardings=((repl, repl), repl, data, data, data, data),
                out_shardings=((repl, repl), repl),
                donate_argnums=(0,),
            )
        else:
            self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def _chunk_loss(self, params, buffers, content_img, border_img, labels,
                    style_vectors):
        cfg = self.cfg
        content_img, border_img = (to_pm1_f32(x)
                                   for x in (content_img, border_img))
        onehot = jax.nn.one_hot(labels.astype(jnp.int32),
                                self.net.num_seg_cls, dtype=jnp.float32)

        def synth(p, sv, oh):
            variables = {"params": p, "buffers": buffers}
            codes = self.net.apply(variables, sv,
                                   method=RGINet.cal_style_codes)
            recon, _, _ = self.net.apply(variables, None, codes, oh,
                                         method=RGINet.gen_img,
                                         regional_mode=cfg.regional_mode)
            return recon

        if cfg.remat:
            synth = jax.checkpoint(synth)
        recon = synth(params, style_vectors, onehot)
        size = recon.shape[1]
        # foreground from the swapped mask; content/border via morphology
        fg = 1.0 - jnp.max(onehot[..., [0, 4, 11]], axis=-1)
        fg = fg[..., None]
        from e4s2024_tpu.ops.morphology import dilation
        full = dilation(fg, 2 * cfg.outer_dilation + 1)
        border = jnp.clip(full - fg, 0.0, 1.0)
        content = resize_bilinear(fg, (size, size))
        border = resize_bilinear(border, (size, size))

        c_loss, metrics = self.criterion(recon * content,
                                         content_img * content)
        b_l2 = jnp.mean(jnp.square(recon * border - border_img * border))
        loss = c_loss + cfg.l2_lambda * b_l2
        metrics["loss_border_l2"] = b_l2
        metrics["loss"] = loss
        return loss, metrics

    def _train_step(self, carry, buffers, content_img, border_img, labels,
                    style_vectors):
        """Inputs (F, ...) — single pass — or chunked (n, cs, ...) — scan
        gradient accumulation (see PTICoach._train_step)."""
        params, opt = carry
        grad_fn = jax.value_and_grad(self._chunk_loss, has_aux=True, argnums=0)

        if content_img.ndim == 4:
            (_, metrics), grads = grad_fn(params, buffers, content_img,
                                          border_img, labels, style_vectors)
        else:
            n = content_img.shape[0]
            m_shape = jax.eval_shape(
                lambda p: self._chunk_loss(p, buffers, content_img[0],
                                           border_img[0], labels[0],
                                           style_vectors[0])[1], params)
            zeros = (jax.tree_util.tree_map(jnp.zeros_like, params),
                     jax.tree_util.tree_map(
                         lambda s: jnp.zeros(s.shape, s.dtype), m_shape))

            def body(acc, xs):
                ci, bi, lb, sv = xs
                (_, m), g = grad_fn(params, buffers, ci, bi, lb, sv)
                return (jax.tree_util.tree_map(jnp.add, acc[0], g),
                        jax.tree_util.tree_map(jnp.add, acc[1], m)), None

            (grads, metrics), _ = jax.lax.scan(
                body, zeros, (content_img, border_img, labels, style_vectors))
            grads = jax.tree_util.tree_map(lambda g: g / n, grads)
            metrics = jax.tree_util.tree_map(lambda m: m / n, metrics)

        updates, opt = self.tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt), metrics

    def tune(self, variables, content_imgs, border_imgs, labels, style_vectors,
             steps: int | None = None):
        """content/border imgs: (F, S, S, 3) uint8 [0,255] or float [-1,1];
        labels (F, Hm, Wm) int (uint8 welcome)."""
        params = variables["params"]
        buffers = variables["buffers"]
        if self.tx is None:
            cfg_like = TrainConfig(out_size=self.net.out_size,
                                   remaining_layer_idx=self.net.remaining_layer_idx)
            mask = _g_trainable_mask(params, cfg_like)
            self.tx = optax.multi_transform(
                {True: optax.adam(self.cfg.learning_rate),
                 False: optax.set_to_zero()}, mask)
        labels = jnp.asarray(labels)
        content_imgs = jnp.asarray(content_imgs)
        border_imgs = jnp.asarray(border_imgs)
        style_vectors = jnp.asarray(style_vectors)
        cfg = self.cfg
        f = content_imgs.shape[0]
        if (self.mesh is None and cfg.frames_per_chunk
                and f > cfg.frames_per_chunk):
            cs = max(d for d in range(1, cfg.frames_per_chunk + 1)
                     if f % d == 0)
            n = f // cs
            content_imgs, border_imgs, labels, style_vectors = (
                x.reshape((n, cs) + x.shape[1:])
                for x in (content_imgs, border_imgs, labels, style_vectors))
        carry = PTICoach._init_carry(self, params)
        history = []
        n_steps = steps if steps is not None else self.cfg.max_steps
        i = 0
        seg = cfg.scan_steps or 0
        if self.mesh is None and seg > 1 and n_steps >= seg:
            # fuse `seg` optimizer steps per dispatch (see
            # PTICoach._build_scan — same update sequence as the loop)
            if getattr(self, "_scan_full_jit", None) is None:
                def scan_full(k, c, buffers, ci, bi, lb, sv):
                    def body(cc, _):
                        return self._train_step(cc, buffers, ci, bi, lb, sv)
                    return jax.lax.scan(body, c, None, length=k)
                self._scan_full_jit = jax.jit(
                    scan_full, static_argnums=(0,), donate_argnums=(1,))
            while n_steps - i >= seg:
                carry, metrics = self._scan_full_jit(
                    seg, carry, buffers, content_imgs, border_imgs, labels,
                    style_vectors)
                history.append(metrics)
                i += seg
        for _ in range(i, n_steps):  # remainder: per-step dispatch
            carry, metrics = self._step(
                carry, buffers, content_imgs, border_imgs, labels,
                style_vectors)
            history.append(metrics)
        params, _ = carry
        return ({"params": params, "buffers": buffers},
                PTICoach._sync_history(history))
