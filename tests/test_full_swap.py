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
    out = pipe(src, tgt, return_intermediates=True)
    assert out["image"].shape == (64, 64, 3)
    assert out["image"].dtype == np.uint8
    assert out["driven"].shape == (64, 64, 3)
    # intermediates are opt-in: the default fetch is the final image only
    lean = pipe(src, tgt)
    assert set(lean) == {"image"}


@pytest.mark.slow
def test_fused_path_matches_staged(rng):
    """The one-program fused path (default when no host-side logic is
    configured) computes the same image as the staged multi-dispatch path."""
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
    gpen_params = gpen.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    inp_model = FaceInpainting(out_size=64, narrow=0.25)
    inp_params = inp_model.init(jax.random.PRNGKey(3),
                                jnp.zeros((1, 64, 64, 4)),
                                jnp.zeros((1, 1)))["params"]
    comps = SwapComponents(
        enhancers={"gpen": GPENEnhancer(gpen_params, 64, gpen).enhance_aligned},
        inpainter=FaceInpainter(inp_params, model=inp_model),
    )
    pipe = FullFaceSwapPipeline(
        swapper, comps, FullSwapConfig(ct_mode="none", face_inpainting=True))
    src = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    tgt = (rng.random((64, 64, 3)) * 255).astype(np.float32)

    fused = pipe(src, tgt)
    assert pipe._fused_call is not None  # fused path actually engaged
    staged = pipe(src, tgt, return_intermediates=True)
    # the one-program trace fuses the parse differently than the staged
    # 2-program path, so argmax label flips at segmentation-class boundaries
    # are expected (the regional painter then amplifies a flipped pixel to a
    # different style color) — check distribution-level agreement, not
    # bit-exactness
    diff = np.abs(fused["image"].astype(np.int32)
                  - staged["image"].astype(np.int32))
    assert diff.mean() < 2.0
    # random weights on noise inputs leave the parse logits near-tied at
    # most pixels, so a few % of label flips (locally large pixel diffs) is
    # the expected ceiling; trained weights produce confident classes and
    # far fewer flips
    assert (diff > 8).mean() < 0.05

    # batched multi-pair path: same program at B=2, per-pair results match
    # the single-pair fused calls exactly (same ops, same math, batch axis
    # only)
    src2 = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    tgt2 = (rng.random((64, 64, 3)) * 255).astype(np.float32)
    batch = pipe.swap_batch(np.stack([src, src2]), np.stack([tgt, tgt2]))
    assert batch.shape == (2, 64, 64, 3) and batch.dtype == np.uint8
    single2 = pipe(src2, tgt2)
    for got, want in ((batch[0], fused["image"]), (batch[1], single2["image"])):
        d = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert d.mean() < 2.0 and (d > 8).mean() < 0.05

    # host-side ct modes can't fuse -> staged fallback, same API
    pipe_rct = FullFaceSwapPipeline(swapper, comps,
                                    FullSwapConfig(ct_mode="rct"))
    assert pipe_rct._maybe_build_fused() is None
    out = pipe_rct(src, tgt)
    assert out["image"].shape == (64, 64, 3)

    # chunked batched execution (FullSwapConfig.max_fused_batch): identical
    # results to the whole-batch program call, any chunk size
    pipe.cfg.max_fused_batch = 1
    chunked = pipe.swap_batch(np.stack([src, src2]), np.stack([tgt, tgt2]))
    pipe.cfg.max_fused_batch = None
    np.testing.assert_array_equal(chunked[1], single2["image"])
    d = np.abs(chunked.astype(np.int32) - batch.astype(np.int32))
    assert d.mean() < 2.0  # chunk-1 call == single fused call (label flips
    # vs the B=2 trace are the same fusion-boundary effect as above)
    # the auto policy keeps the whole batch (measured-faster on chip at
    # every resolution once the pipeline went device-resident, round 5)
    assert pipe._batch_chunk(8) == 8
    # fallback swap_batch loops the staged path with the same contract
    batch_staged = pipe_rct.swap_batch(np.stack([src, src2]),
                                       np.stack([tgt, tgt2]))
    assert batch_staged.shape == (2, 64, 64, 3)
    assert batch_staged.dtype == np.uint8


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


@pytest.mark.slow
def test_swap_raw_full_zoo(rng):
    """Raw-frame entry for the zoo pipeline: detect/align -> zoo swap on
    crops -> perspective paste-back (the reference's full
    face_swap_pipeline from unaligned images). A stub landmark_fn keeps the
    test deterministic and cheap."""
    cfg = SwapConfig(out_size=64, remaining_layer_idx=7, num_blend_levels=3,
                     regional_mode="fast")
    rgi = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = rgi.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]

    # plausible 68-pt landmarks centered in a 160x160 frame
    base = np.zeros((68, 2), np.float64)
    base[:17] = np.stack([np.linspace(40, 120, 17), np.full(17, 110.0)], 1)
    base[36:42] = [60, 70]
    base[42:48] = [100, 70]
    base[48:68] = [80, 100]
    base[27:36] = [80, 85]
    base[17:27] = np.stack([np.linspace(55, 105, 10), np.full(10, 60.0)], 1)

    swapper = FaceSwapper(v, bise, cfg, landmark_fn=lambda img: base)
    swapper.rgi = rgi
    pipe = FullFaceSwapPipeline(swapper, SwapComponents(),
                                FullSwapConfig(ct_mode="none"))
    src = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    tgt = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    out = pipe.swap_raw(src, tgt)
    assert out.shape == (160, 160, 3) and out.dtype == np.uint8
    # the FFHQ quad from these landmarks covers most of the 160^2 frame, so
    # the projected swap dominates the output; it must differ from a plain
    # passthrough of the target
    assert not np.array_equal(out, tgt)


@pytest.mark.slow
def test_sharded_swap_batch_matches_unsharded(rng):
    """Data-parallel serving: shard_inference() re-jits the fused batched
    swap over an 8-device 'dp' mesh; per-pair outputs match the unsharded
    fused program (each pair is independent — batch sharding must not
    change the math)."""
    from e4s2024_tpu.parallel import make_mesh

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

    B = 8
    src = (rng.random((B, 64, 64, 3)) * 255).astype(np.float32)
    tgt = (rng.random((B, 64, 64, 3)) * 255).astype(np.float32)
    want = pipe.swap_batch(src, tgt)  # unsharded fused program
    assert pipe._fused_call is not None

    pipe.shard_inference(make_mesh(8))
    got = pipe.swap_batch(src, tgt)
    assert got.shape == (B, 64, 64, 3) and got.dtype == np.uint8
    # same ops, same math — only partitioned; XLA may still fuse the parse
    # argmax differently per partition, so tolerate boundary label flips
    # (same criterion as test_fused_path_matches_staged)
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert d.mean() < 2.0 and (d > 8).mean() < 0.05

    # indivisible batches are rejected rather than silently repartitioned
    with pytest.raises(ValueError):
        pipe.swap_batch(src[:3], tgt[:3])


def test_shard_inference_requires_fused():
    """Configs that force the staged path (host-side ct modes) cannot be
    mesh-served; shard_inference must say so, not degrade silently."""
    from e4s2024_tpu.parallel import make_mesh

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
                                FullSwapConfig(ct_mode="rct"))
    with pytest.raises(RuntimeError):
        pipe.shard_inference(make_mesh(8))


@pytest.mark.slow
def test_fused_cache_invalidation(rng):
    """Components/config changed after the first fused build must take
    effect on the next call (rebuild), not be silently ignored."""
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
    src = (rng.random((1, 64, 64, 3)) * 255).astype(np.float32)
    tgt = (rng.random((1, 64, 64, 3)) * 255).astype(np.float32)
    out1 = pipe.swap_batch(src, tgt)
    assert pipe._maybe_build_fused() is not None

    # install an enhancer AFTER the first fused build: output must change
    gpen = GPENFullGenerator(size=64, narrow=0.25)
    gpen_params = gpen.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    pipe.comp.enhancers["gpen"] = GPENEnhancer(
        gpen_params, 64, gpen).enhance_aligned
    out2 = pipe.swap_batch(src, tgt)
    assert not np.array_equal(out1, out2)

    # switching to a host-side ct mode drops the fused path entirely
    pipe.cfg.ct_mode = "rct"
    assert pipe._maybe_build_fused() is None
    out3 = pipe.swap_batch(src, tgt)  # staged fallback still works
    assert out3.shape == (1, 64, 64, 3)
