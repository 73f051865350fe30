"""App/gated-UI, mask-merge variants, pose-drive registry tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from e4s2024_tpu.app import build_gradio_app
from e4s2024_tpu.pipelines.mask_merge import (
    swap_head_mask_consider_glass, swap_head_mask_target_bg_dilation,
)
from e4s2024_tpu.pipelines.pose_drive import make_pose_driver


def test_gradio_gated():
    with pytest.raises(RuntimeError, match="gradio"):
        build_gradio_app(None)


def test_consider_glass_variant(rng):
    src = jnp.asarray(rng.integers(0, 12, (32, 32)))
    tgt = jnp.asarray(rng.integers(0, 12, (32, 32)))
    res, hole, line = swap_head_mask_consider_glass(src, tgt)
    assert res.shape == (32, 32)
    assert int(res.max()) < 12
    # target background preserved except where source hair / target glasses
    # paint over it (reference order: hair and glasses painted after bg)
    keep = (np.asarray(tgt) == 0) & (np.asarray(src) != 4) & (np.asarray(tgt) != 10)
    np.testing.assert_array_equal(np.asarray(res)[keep], 0)


def test_bg_dilation_variant(rng):
    src = jnp.asarray(rng.integers(0, 12, (32, 32)))
    tgt = jnp.asarray(rng.integers(0, 12, (32, 32)))
    res = swap_head_mask_target_bg_dilation(src, tgt, radius=1, iters=2)
    assert res.shape == (32, 32)


def test_pose_drive_registry():
    with pytest.raises(ValueError, match="TPSMM"):
        make_pose_driver("TPSMM")  # implemented, but needs converted params
    with pytest.raises(KeyError):
        make_pose_driver("nope")


def test_inpaint_registry():
    from e4s2024_tpu.pipelines.inpaint_registry import make_inpainter
    with pytest.raises(ValueError, match="MISF"):
        make_inpainter("misf")  # implemented, but needs converted params
    with pytest.raises(KeyError):
        make_inpainter("nah")
