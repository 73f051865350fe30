"""SwinIR x4 real-world super-resolution in Flax.

Port of the reference's SwinIR-M real_sr config (reference
swap_face_fine/SwinIR/models/network_swinir.py:618; used via `SwinIRInfer`,
image_infer.py:39-84: window 8, embed 180, depths/heads [6]x6, mlp_ratio 2,
'nearest+conv' upsampler, scale 4): residual Swin transformer blocks over
shifted 8x8 windows with relative position bias.

Layout NHWC; the window partition/shift is pure reshape/roll, so XLA maps the
attention onto the MXU as batched (64 x 64) matmuls.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.ops.resize import resize_nearest

_RGB_MEAN = jnp.asarray([0.4488, 0.4371, 0.4040])


def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _kernel_interpret() -> bool:
    """True when the Pallas attention kernel should run in interpreter mode.
    CPU tests opt in by setting `ops.window_attention.INTERPRET = True`
    directly (see tests/test_window_attention.py / test_swin_fused.py)."""
    from e4s2024_tpu.ops import window_attention as wa

    return bool(getattr(wa, "INTERPRET", False))


class WindowAttention(nn.Module):
    dim: int
    window: int
    heads: int
    dtype: Any = jnp.float32
    use_kernel: bool = False

    def _bias_hnn(self, n):
        table = self.param(
            "rel_bias_table", nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads))
        idx = jnp.asarray(_rel_pos_index(self.window))
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads)
        return jnp.transpose(bias, (2, 0, 1))

    @nn.compact
    def __call__(self, x, labels=None, nhwc=False):
        """x: (nW*B, w*w, C) windowed — or (B, H, W, C) with nhwc=True, the
        Pallas fast path where window partition lives in the kernel's block
        index map (ops/window_attention.py swin_attention_nhwc). labels:
        (nW, w*w) int window-region labels for shifted windows ((nWy, nWx,
        w*w) in nhwc mode; None for unshifted). The additive -100 mask is
        computed IN-PROGRAM from the labels: materializing the dense
        (nW, n, n) float mask as a trace-time constant costs 67 MB per
        shifted block at 512^2 (numerically identical, the reference's
        attn_mask, network_swinir.py calculate_mask)."""
        n = self.window * self.window
        c = x.shape[-1]
        hd = c // self.heads
        qkv = nn.Dense(3 * c, name="qkv", dtype=self.dtype)(x)
        bias_hnn = self._bias_hnn(n)

        if nhwc:
            from e4s2024_tpu.ops.window_attention import swin_attention_nhwc

            out = swin_attention_nhwc(
                qkv, bias_hnn.astype(jnp.float32), labels,
                window=self.window, heads=self.heads,
                interpret=_kernel_interpret())
            return nn.Dense(c, name="proj", dtype=self.dtype)(out)

        bnw = x.shape[0]
        qkv = qkv.reshape(bnw, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k)
        att = att + bias_hnn[None].astype(att.dtype)
        if labels is not None:
            nw = labels.shape[0]
            neq = labels[:, None, :] != labels[:, :, None]  # (nW, n, n)
            mask = jnp.where(neq, jnp.asarray(-100.0, att.dtype),
                             jnp.asarray(0.0, att.dtype))
            att = att.reshape(bnw // nw, nw, self.heads, n, n) \
                + mask[None, :, None]
            att = att.reshape(bnw, self.heads, n, n)
        att = jax.nn.softmax(att, -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(c, name="proj", dtype=self.dtype)(out)


def _window_partition(x, w):
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(x, w, h, ww):
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


@functools.lru_cache(maxsize=None)
def _shift_labels(h, w, window, shift) -> np.ndarray:
    """(nW, window*window) int8 window-region labels of the cyclically
    shifted image — the compact form of the shifted-window attention mask
    (reference network_swinir.py calculate_mask): tokens in the same window
    may attend iff their labels match. Runs at trace time; int8 keeps the
    embedded constant at nW*window^2 bytes (262 KB at 512^2 vs 67 MB for
    the dense float mask)."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    return win.transpose(0, 2, 1, 3).reshape(
        -1, window * window).astype(np.int8)


def _shift_mask(h, w, window, shift) -> np.ndarray:
    """Dense (nW, n, n) additive mask — reference semantics, used by tests;
    the model itself keeps the compact label form (`_shift_labels`)."""
    win = _shift_labels(h, w, window, shift)
    diff = win[:, None, :].astype(np.int32) - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int = 8
    shift: int = 0
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32
    use_kernel: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            labels = jnp.asarray(
                _shift_labels(h, w, self.window, self.shift))
        else:
            labels = None
        attn = WindowAttention(self.dim, self.window, self.heads,
                               dtype=self.dtype, name="attn")
        if self.use_kernel:
            # Pallas NHWC path: window partition/reverse become the kernel's
            # block index map — no HBM-materialized transposes at all
            ws = self.window
            lab3 = (None if labels is None
                    else labels.reshape(h // ws, w // ws, ws * ws))
            x = attn(x, lab3, nhwc=True)
        else:
            xw = _window_partition(x, self.window)
            xw = attn(xw, labels)
            x = _window_reverse(xw, self.window, h, w)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x
        h2 = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x)
        h2 = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1",
                      dtype=self.dtype)(h2)
        h2 = nn.Dense(self.dim, name="fc2", dtype=self.dtype)(
            jax.nn.gelu(h2, approximate=False))
        return x + h2


class RSTB(nn.Module):
    dim: int
    depth: int
    heads: int
    window: int = 8
    dtype: Any = jnp.float32
    use_kernel: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.depth):
            x = SwinBlock(self.dim, self.heads, self.window,
                          shift=0 if i % 2 == 0 else self.window // 2,
                          dtype=self.dtype, use_kernel=self.use_kernel,
                          name=f"blocks_{i}")(x)
        x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        return x + res


class SwinIR(nn.Module):
    """real_sr M config; input (B, H, W, 3) in [0, 1], H/W multiples of 8.

    `dtype=jnp.bfloat16` runs all matmuls/convs in bf16 (params stay f32):
    2x MXU rate + half the HBM traffic; the output returns as f32. f32
    default keeps bit-level parity with the reference torch net
    (tests/test_ref_parity.py::test_swinir_forward_parity)."""

    embed_dim: int = 180
    depths: tuple = (6, 6, 6, 6, 6, 6)
    heads: tuple = (6, 6, 6, 6, 6, 6)
    window: int = 8
    scale: int = 4
    num_feat: int = 64
    dtype: Any = jnp.float32
    # route window attention through the fused Pallas kernel
    # (ops/window_attention.py swin_attention_nhwc)
    use_kernel: bool = False

    @nn.compact
    def __call__(self, x):
        x = (x - _RGB_MEAN).astype(self.dtype)
        feat = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_first")(x)
        # patch_embed norm (patch_norm=True in the reference config)
        body = nn.LayerNorm(epsilon=1e-5, name="patch_norm",
                            dtype=self.dtype)(feat)
        for i, (d, nh) in enumerate(zip(self.depths, self.heads)):
            body = RSTB(self.embed_dim, d, nh, self.window, dtype=self.dtype,
                        use_kernel=self.use_kernel, name=f"layers_{i}")(body)
        body = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(body)
        body = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_after_body")(body)
        feat = feat + body

        def lrelu(v):
            return jnp.where(v >= 0, v, jnp.asarray(0.2, v.dtype) * v)

        # conv_before_upsample's activation is nn.LeakyReLU() with the torch
        # DEFAULT slope 0.01 (network_swinir.py Sequential), unlike the 0.2
        # self.lrelu used after the up convs
        pre = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                      name="conv_before_upsample")(feat)
        feat = jnp.where(pre >= 0, pre, jnp.asarray(0.01, pre.dtype) * pre)
        h, w = feat.shape[1], feat.shape[2]
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                             dtype=self.dtype, name="conv_up1")(
            resize_nearest(feat, (2 * h, 2 * w))))
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                             dtype=self.dtype, name="conv_up2")(
            resize_nearest(feat, (4 * h, 4 * w))))
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                             dtype=self.dtype, name="conv_hr")(feat))
        out = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                      name="conv_last")(feat)
        return out.astype(jnp.float32) + _RGB_MEAN


def _conv3x3(x, p, dtype):
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"].astype(dtype)


def _layer_norm(x, p, dtype):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (out * p["scale"] + p["bias"]).astype(dtype)


def _block_weights(bp, window, heads):
    """SwinBlock param subtree -> the flat dict fused_swin_block takes."""
    n = window * window
    table = bp["attn"]["rel_bias_table"]
    idx = jnp.asarray(_rel_pos_index(window))
    bias = table[idx.reshape(-1)].reshape(n, n, heads)
    return {
        "ln1_scale": bp["norm1"]["scale"], "ln1_bias": bp["norm1"]["bias"],
        "qkv_w": bp["attn"]["qkv"]["kernel"],
        "qkv_b": bp["attn"]["qkv"]["bias"],
        "proj_w": bp["attn"]["proj"]["kernel"],
        "proj_b": bp["attn"]["proj"]["bias"],
        "bias_hnn": jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32),
        "ln2_scale": bp["norm2"]["scale"], "ln2_bias": bp["norm2"]["bias"],
        "fc1_w": bp["fc1"]["kernel"], "fc1_b": bp["fc1"]["bias"],
        "fc2_w": bp["fc2"]["kernel"], "fc2_b": bp["fc2"]["bias"],
    }


def apply_fused(model: "SwinIR", params, x, interpret=False):
    """SwinIR forward with every SwinBlock as ONE fused Pallas kernel
    (ops/swin_block.py) — x read once / written once per block instead of
    ~15 HBM round-trips. Numerically equivalent to `model.apply` (LN stats
    f32, matmuls f32-accumulated; tests/test_swin_fused.py pins it).

    Shifted blocks roll x before/after the kernel: the cyclic shift commutes
    with LN/MLP/residual, so only the attention's region-label mask differs
    (reference network_swinir.py SwinTransformerBlock.forward)."""
    from e4s2024_tpu.ops.swin_block import fused_swin_block

    dtype = model.dtype
    ws = model.window
    x = (jnp.asarray(x, jnp.float32) - _RGB_MEAN).astype(dtype)
    feat = _conv3x3(x, params["conv_first"], dtype)
    body = _layer_norm(feat, params["patch_norm"], dtype)
    b, h, w, c = body.shape
    for i, (depth, nh) in enumerate(zip(model.depths, model.heads)):
        lp = params[f"layers_{i}"]
        res = body
        for j in range(depth):
            shift = 0 if j % 2 == 0 else ws // 2
            wts = _block_weights(lp[f"blocks_{j}"], ws, nh)
            if shift:
                body = jnp.roll(body, (-shift, -shift), axis=(1, 2))
                labels = jnp.asarray(
                    _shift_labels(h, w, ws, shift)).reshape(
                        h // ws, w // ws, ws * ws)
            else:
                labels = None
            body = fused_swin_block(body, wts, labels, window=ws, heads=nh,
                                    interpret=interpret)
            if shift:
                body = jnp.roll(body, (shift, shift), axis=(1, 2))
        body = _conv3x3(body, lp["conv"], dtype) + res
    body = _layer_norm(body, params["norm"], dtype)
    feat = feat + _conv3x3(body, params["conv_after_body"], dtype)

    def lrelu(v, slope):
        return jnp.where(v >= 0, v, jnp.asarray(slope, v.dtype) * v)

    feat = lrelu(_conv3x3(feat, params["conv_before_upsample"], dtype), 0.01)
    feat = lrelu(_conv3x3(resize_nearest(feat, (2 * h, 2 * w)),
                          params["conv_up1"], dtype), 0.2)
    feat = lrelu(_conv3x3(resize_nearest(feat, (4 * h, 4 * w)),
                          params["conv_up2"], dtype), 0.2)
    feat = lrelu(_conv3x3(feat, params["conv_hr"], dtype), 0.2)
    out = _conv3x3(feat, params["conv_last"], dtype)
    return out.astype(jnp.float32) + _RGB_MEAN


class SwinIRUpscaler:
    """x4 upscale of [0,255] images with window-size padding (reference
    image_infer.py:50-66)."""

    def __init__(self, params: dict, model: SwinIR | None = None,
                 fused: bool | None = None):
        from e4s2024_tpu.utils.packing import jit_with_packed_params

        on_tpu = jax.default_backend() == "tpu"
        if fused is None:
            # Production default is platform-aware: on TPU, bf16 compute
            # with the whole SwinBlock as one Pallas kernel
            # (ops/swin_block.py — the attention-only kernel left the model
            # HBM-bound at 58% BW / 8% MFU; block fusion cuts body traffic
            # ~7x). Plain f32 XLA everywhere else (CPU keeps bit-parity with
            # the reference torch net; a CUDA/ROCm backend must not route
            # through a Mosaic-lowered TPU kernel).
            fused = on_tpu
        if model is None:
            model = SwinIR(dtype=jnp.bfloat16) if on_tpu else SwinIR()
        self.model = model
        self.params = params
        self.fused = fused
        if fused:
            fwd = lambda p, x: apply_fused(
                self.model, p, x, interpret=_kernel_interpret())
        else:
            fwd = lambda p, x: self.model.apply({"params": p}, x)
        # packed params: per-leaf argument marshalling costs ~10 us/leaf/call
        self._fwd = jit_with_packed_params(fwd, params)
        self._xla_fwd = None if not fused else jit_with_packed_params(
            lambda p, x: self.model.apply({"params": p}, x), params)

    def _forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Kernel forward with automatic XLA fallback: if the Pallas kernel
        fails to lower/execute on the running jaxlib (Mosaic version skew),
        permanently fall back to the plain XLA program rather than sinking
        the pipeline — the two paths are numerically equivalent within bf16
        accumulation (tests/test_swin_fused.py; on-chip delta recorded in
        BENCH_VIDEO.json kernel_numerics)."""
        if not self.fused:
            return self._fwd(x)
        try:
            return self._fwd(x)
        except Exception as e:  # Mosaic lowering/runtime failure
            import warnings

            warnings.warn(
                f"fused SwinBlock kernel failed on this jaxlib "
                f"({type(e).__name__}: {str(e)[:200]}); falling back to the "
                f"XLA path permanently for this upscaler")
            self.fused = False
            self._fwd = self._xla_fwd
            return self._fwd(x)

    def upscale(self, img255: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(img255, jnp.float32) / 255.0
        b, h, w, _ = x.shape
        ws = self.model.window
        hp = (h + ws - 1) // ws * ws - h
        wp = (w + ws - 1) // ws * ws - w
        if hp or wp:
            x = jnp.concatenate([x, jnp.flip(x[:, -hp:], 1)], 1) if hp else x
            x = jnp.concatenate([x, jnp.flip(x[:, :, -wp:], 2)], 2) if wp else x
        out = self._forward(x)
        out = out[:, : h * self.model.scale, : w * self.model.scale]
        return jnp.clip(out * 255.0, 0, 255)


class SwinIREnhancer:
    """Same-size face enhancement through x4 SR — the reference's "SwinIR"
    face-enhancement mode (reference Face_swap_with_two_imgs.py:627-631:
    `SwinIRInfer.infer` returns the x4 image, which the pipeline then resizes
    to its working resolution). Runs the SR at the crop's native size and
    bilinearly resizes the x4 output back, so it drops into the `enhancers`
    dict of `FullFaceSwapPipeline` / the video pipeline's `enhancer` hook with
    the same (B, S, S, 3) [0,255] -> same-shape contract as GPENEnhancer."""

    def __init__(self, upscaler: "SwinIRUpscaler", max_batch: int = 4):
        self.upscaler = upscaler
        # x4 SR of a 512^2 crop materializes 2048^2 activations: ~12 GB of
        # bf16 body features at batch 8 — over v5e HBM (measured: the batch-8
        # program fails to compile). Chunk internally so callers can hand any
        # batch (the video pipeline batches 8 frames per stage).
        self.max_batch = max_batch

    def enhance_aligned(self, crops255: jnp.ndarray) -> jnp.ndarray:
        from e4s2024_tpu.ops.resize import resize_bilinear

        h, w = crops255.shape[1], crops255.shape[2]
        b = crops255.shape[0]
        if b > self.max_batch:
            m = self.max_batch
            pad = (b + m - 1) // m * m - b  # pad the trailing chunk so every
            if pad:                         # chunk compiles to ONE shape
                crops255 = jnp.concatenate(
                    [crops255, jnp.repeat(crops255[-1:], pad, 0)])
            return jnp.concatenate([
                self.enhance_aligned(crops255[i:i + m])
                for i in range(0, b + pad, m)])[:b]
        out = self.upscaler.upscale(crops255)
        return resize_bilinear(out, (h, w))
