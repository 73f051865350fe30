"""Full pipeline orchestration test with tiny zoo components."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.bisenet import BiSeNet
from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.models.gpen import GPENFullGenerator, GPENEnhancer
from e4s2024_tpu.models.gcfsr import FaceInpainting, FaceInpainter
from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig
from e4s2024_tpu.pipelines.full_swap import (
    FullFaceSwapPipeline, SwapComponents, FullSwapConfig,
)


@pytest.mark.slow
def test_full_pipeline_with_zoo(rng):
    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3,
                     regional_mode="fast")
    rgi = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = rgi.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(v, bise, cfg)
    swapper.rgi = rgi

    gpen = GPENFullGenerator(size=64, narrow=0.25)
    gpen_params = gpen.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))["params"]
    inp_model = FaceInpainting(out_size=64, narrow=0.25)
    inp_params = inp_model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 4)),
                                jnp.zeros((1, 1)))["params"]

    comps = SwapComponents(
        enhancers={"gpen": GPENEnhancer(gpen_params, 64, gpen).enhance_aligned},
        inpainter=FaceInpainter(inp_params, model=inp_model),
    )
    pipe = FullFaceSwapPipeline(
        swapper, comps,
        FullSwapConfig(ct_mode="rct", face_inpainting=True))
    src = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    tgt = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    out = pipe(src, tgt)
    assert out["image"].shape == (64, 64, 3)
    assert out["image"].dtype == np.uint8
    assert out["driven"].shape == (64, 64, 3)


def test_pipeline_no_components(rng):
    """PR1 config: everything off degrades to the core swap."""
    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3,
                     regional_mode="fast")
    rgi = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = rgi.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(v, bise, cfg)
    swapper.rgi = rgi
    pipe = FullFaceSwapPipeline(swapper, SwapComponents(),
                                FullSwapConfig(ct_mode="none"))
    src = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    tgt = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    out = pipe(src, tgt)
    assert out["image"].shape == (64, 64, 3)


def test_pipeline_optimize_w(rng):
    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3,
                     regional_mode="fast")
    rgi = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = rgi.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(v, bise, cfg)
    swapper.rgi = rgi
    pipe = FullFaceSwapPipeline(
        swapper, SwapComponents(),
        FullSwapConfig(ct_mode="none", optimize_w_steps=3))
    src = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    tgt = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    out = pipe(src, tgt)
    assert out["image"].shape == (64, 64, 3)


@pytest.mark.slow
def test_pipeline_optimize_w_perceptual(rng):
    """optimize_W with the reference's LPIPS-enabled criterion (VERDICT r1 #7):
    loss_params present -> the refinement optimizes LPIPS*0.8 + L2, not L2-only."""
    from e4s2024_tpu.models.lpips import LPIPS

    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3,
                     regional_mode="fast")
    rgi = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = rgi.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(v, bise, cfg)
    swapper.rgi = rgi
    lpips_params = LPIPS().init(jax.random.PRNGKey(2),
                                jnp.zeros((1, 64, 64, 3)),
                                jnp.zeros((1, 64, 64, 3)))["params"]
    pipe = FullFaceSwapPipeline(
        swapper, SwapComponents(loss_params={"lpips": lpips_params}),
        FullSwapConfig(ct_mode="none", optimize_w_steps=2))
    src = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    tgt = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    out = pipe(src, tgt)
    assert out["image"].shape == (64, 64, 3)
