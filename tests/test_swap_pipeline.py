"""End-to-end image-swap pipeline test (random-weight models, small config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.bisenet import BiSeNet
from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig


@pytest.fixture(scope="module")
def swapper():
    # n_latent at 128px is 12, so remaining_layer_idx must be < 12 here
    cfg = SwapConfig(out_size=128, remaining_layer_idx=9, num_blend_levels=4)
    rgi = RGINet(out_size=128, remaining_layer_idx=9)
    img = jnp.zeros((1, 128, 128, 3))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 128, 128), int)])
    rgi_vars = rgi.init(jax.random.PRNGKey(0), img, seg)
    bise = BiSeNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 512, 512, 3)))["params"]
    return FaceSwapper(rgi_vars, bise, cfg)


def test_swap_aligned_end_to_end(swapper, rng):
    src = rng.random((1, 128, 128, 3)).astype(np.float32) * 255
    tgt = rng.random((1, 128, 128, 3)).astype(np.float32) * 255
    out = swapper.swap_aligned(src, tgt)
    assert out["image"].shape == (1, 128, 128, 3)
    assert float(out["image"].min()) >= 0.0 and float(out["image"].max()) <= 255.0
    assert out["swapped_mask"].shape == (1, 512, 512)
    assert out["swapped_style_vectors"].shape == (1, 12, 1280)
    assert bool(jnp.isfinite(out["image"]).all())


def test_swap_full_with_landmarks(swapper, rng):
    def fake_landmarks(img):
        h, w = img.shape[:2]
        lm = np.zeros((68, 2))
        lm[36:42] = [w * 0.35, h * 0.4]
        lm[42:48] = [w * 0.65, h * 0.4]
        lm[48] = [w * 0.4, h * 0.7]
        lm[54] = [w * 0.6, h * 0.7]
        return lm

    swapper.landmark_fn = fake_landmarks
    src = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    tgt = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    out = swapper.swap(src, tgt)
    assert out.shape == (160, 160, 3)
    assert out.dtype == np.uint8


def test_pack_meta_frozen_structure_guard(swapper):
    """A params assignment with a different tree structure/shape must raise,
    not silently unpack garbage through the frozen packed-buffer meta."""
    # same structure, new values: allowed (this is the PTI write-back path)
    swapper.rgi_variables = jax.tree_util.tree_map(
        lambda x: x, swapper.rgi_variables)

    bad = dict(swapper.rgi_variables)
    bad["extra_leaf"] = jnp.zeros((3,))
    with pytest.raises(ValueError, match="structure"):
        swapper.rgi_variables = bad

    # shape change with identical structure must also raise
    good = swapper.rgi_variables
    leaves, treedef = jax.tree_util.tree_flatten(good)
    leaves = list(leaves)
    leaves[0] = jnp.zeros(tuple(d + 1 for d in leaves[0].shape),
                          leaves[0].dtype)
    with pytest.raises(ValueError, match="structure"):
        swapper.rgi_variables = jax.tree_util.tree_unflatten(treedef, leaves)
    # restore for other tests
    swapper.rgi_variables = good
