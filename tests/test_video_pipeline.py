"""Video pipeline e2e test on tiny models + synthetic frames, incl. PTI."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.bisenet import BiSeNet
from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig
from e4s2024_tpu.pipelines.video import FaceSwapVideoPipeline, VideoSwapConfig
from e4s2024_tpu.training.pti import PTIConfig, StitchingConfig
from e4s2024_tpu.config import E4SConfig


def fake_landmarks(img):
    h, w = img.shape[:2]
    lm = np.zeros((68, 2))
    lm[36:42] = [w * 0.35, h * 0.4]
    lm[42:48] = [w * 0.65, h * 0.4]
    lm[48] = [w * 0.4, h * 0.7]
    lm[54] = [w * 0.6, h * 0.7]
    return lm


@pytest.mark.slow
def test_video_pipeline_end_to_end(rng):
    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3)
    net = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(v, bise, cfg, landmark_fn=fake_landmarks)
    swapper.rgi = net  # tiny net override

    vcfg = VideoSwapConfig(
        swap=cfg, pti=PTIConfig(max_pti_steps=2, lpips_lambda=0.0,
                                id_lambda=0.0, face_parsing_lambda=0.0),
        stitching=StitchingConfig(max_steps=1, lpips_lambda=0.0),
        frames_per_batch=2)

    class FakeRecolorer:
        """Stands in for BlenderRecolorer: must be called per batch and its
        output must become the PTI recolor target."""
        calls = 0

        def recolor(self, a255, t255, a19, t19):
            FakeRecolorer.calls += 1
            return jnp.clip(0.5 * (a255 + t255), 0, 255)

    pipe = FaceSwapVideoPipeline(swapper, vcfg, recolorer=FakeRecolorer())

    frames = [(rng.random((96, 96, 3)) * 255).astype(np.uint8) for _ in range(3)]
    source = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    outs = pipe(source, frames)
    assert len(outs) == 3
    assert FakeRecolorer.calls >= 1
    for o in outs:
        assert o.shape == (96, 96, 3) and o.dtype == np.uint8


def test_video_enhancer_stage(rng):
    """The driven-frame enhancement stage runs batched through anything with
    the enhance_aligned contract (SwinIREnhancer/GPENEnhancer/...) —
    reference face_swap_video_pipeline.py:255-257."""
    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3)
    net = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(v, bise, cfg, landmark_fn=fake_landmarks)

    class FakeEnhancer:
        batches = []

        def enhance_aligned(self, crops255):
            FakeEnhancer.batches.append(crops255.shape[0])
            return jnp.clip(crops255 + 1.0, 0, 255)

    vcfg = VideoSwapConfig(swap=cfg, frames_per_batch=2)
    pipe = FaceSwapVideoPipeline(swapper, vcfg, enhancer=FakeEnhancer())
    driven = (rng.random((5, 64, 64, 3)) * 255).astype(np.float32)
    out = pipe.enhance_frames(driven)
    assert out.shape == driven.shape
    # the trailing chunk is PADDED to the compiled chunk shape (one program
    # per clip; pipelines/video.py _chunked), so every call sees batch 2
    assert FakeEnhancer.batches == [2, 2, 2]
    np.testing.assert_allclose(out, np.clip(driven + 1.0, 0, 255), atol=1e-4)


def test_config_tree_roundtrip():
    cfg = E4SConfig.from_args(["--batch_size", "4", "--d_every", "10"])
    assert cfg.train.batch_size == 4
    assert cfg.train.d_every == 10
    js = cfg.to_json()
    assert '"batch_size": 4' in js
