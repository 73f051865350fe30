"""faceVid2Vid tests: grid sampling parity, keypoint math, end-to-end drive."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.facevid2vid import (
    grid_sample_3d, make_grid_3d, kp2gaussian3d,
    headpose_to_degree, rotation_matrix, keypoint_transformation,
    KPDetector, HEEstimator, OcclusionAwareSPADEGenerator, FaceVid2VidDriver,
)


def test_grid_sample_3d_matches_torch(rng):
    vol = rng.standard_normal((2, 4, 6, 5, 3)).astype(np.float32)
    grid = (rng.random((2, 4, 6, 5, 3)).astype(np.float32) * 2 - 1) * 0.9
    got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid)))
    vt = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)  # NCDHW
    want = F.grid_sample(vt, torch.from_numpy(grid), align_corners=False)
    want = want.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_make_grid_range():
    g = np.asarray(make_grid_3d(4, 8, 8))
    assert g.shape == (4, 8, 8, 3)
    np.testing.assert_allclose(g.min(), -1.0)
    np.testing.assert_allclose(g.max(), 1.0)


def test_kp2gaussian_peak(rng):
    kp = jnp.zeros((1, 2, 3))  # center keypoints
    g = np.asarray(kp2gaussian3d(kp, (5, 9, 9)))
    assert g.shape == (1, 2, 5, 9, 9)
    # peak at the volume center
    assert g[0, 0].argmax() == np.ravel_multi_index((2, 4, 4), (5, 9, 9))


def test_headpose_degree_and_rotation():
    logits = jnp.zeros((1, 66)).at[0, 33].set(100.0)  # bin 33 -> 0 degrees
    deg = headpose_to_degree(logits)
    assert float(deg[0]) == pytest.approx(0.0, abs=0.5)
    r = rotation_matrix(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(r[0]), np.eye(3), atol=1e-5)


def test_keypoint_transformation_identity():
    kp = {"value": jnp.asarray(np.random.default_rng(0)
                               .standard_normal((1, 15, 3)).astype(np.float32))}
    he = {
        "yaw": jnp.zeros((1, 66)).at[0, 33].set(100.0),
        "pitch": jnp.zeros((1, 66)).at[0, 33].set(100.0),
        "roll": jnp.zeros((1, 66)).at[0, 33].set(100.0),
        "t": jnp.zeros((1, 3)),
        "exp": jnp.zeros((1, 45)),
    }
    out = keypoint_transformation(kp, he)
    np.testing.assert_allclose(np.asarray(out["value"]), np.asarray(kp["value"]),
                               atol=1e-3)


@pytest.mark.slow
def test_drive_end_to_end_tiny(rng):
    """Full reenactment chain at the real 256^2 geometry, narrow channels."""
    src = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32))
    tgts = jnp.asarray(rng.random((2, 256, 256, 3)).astype(np.float32))

    kp = KPDetector(block_expansion=4, max_features=32, reshape_features=64,
                    reshape_depth=4)
    he = HEEstimator(block_expansion=8, width=16)
    gen = OcclusionAwareSPADEGenerator(
        block_expansion=8, max_features=32, reshape_channel=8,
        reshape_depth=4, num_resblocks=1, dm_block_expansion=4,
        dm_max_features=32, decoder_ic=8)
    key = jax.random.PRNGKey(0)
    kp_params = kp.init(key, src)["params"]
    he_params = he.init(jax.random.fold_in(key, 1), src)["params"]
    kpd = kp.apply({"params": kp_params}, src)
    hed = he.apply({"params": he_params}, src)
    kps = keypoint_transformation(kpd, hed)
    gen_params = gen.init(jax.random.fold_in(key, 2), src, kps, kps)["params"]

    driver = FaceVid2VidDriver({
        "kp_detector": kp_params, "he_estimator": he_params,
        "generator": gen_params,
    }, kp=kp, he=he, gen=gen)
    out = driver.drive(src, tgts)
    assert out.shape == (2, 256, 256, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_free_view_set_pose(rng):
    """Free-view re-pose (reference drive_demo free_view mode): fixed-angle
    overrides flow through keypoint_transformation; yaw=0/pitch=0/roll=0
    frontalizes and differs from the estimated-pose transform unless the
    estimate is already frontal."""
    from e4s2024_tpu.models.facevid2vid import (
        headpose_to_degree,
        keypoint_transformation,
    )

    b = 2
    kp = {"value": jnp.asarray(rng.standard_normal((b, 5, 3)), jnp.float32)}
    he = {
        "yaw": jnp.asarray(rng.standard_normal((b, 66)), jnp.float32),
        "pitch": jnp.asarray(rng.standard_normal((b, 66)), jnp.float32),
        "roll": jnp.asarray(rng.standard_normal((b, 66)), jnp.float32),
        "t": jnp.zeros((b, 3)),
        "exp": jnp.zeros((b, 15)),
    }
    est = keypoint_transformation(kp, he)
    fr = keypoint_transformation(kp, he, yaw=0.0, pitch=0.0, roll=0.0)
    assert fr["value"].shape == est["value"].shape
    # frontal override == the estimated path only if the estimate is frontal
    assert not np.allclose(np.asarray(fr["value"]), np.asarray(est["value"]))
    # overriding with the ESTIMATED angles must reproduce the estimate path
    same = keypoint_transformation(
        kp, he, yaw=float(headpose_to_degree(he["yaw"])[0]))
    # (scalar override broadcasts one angle across the batch; check sample 0)
    np.testing.assert_allclose(np.asarray(same["value"][0]),
                               np.asarray(est["value"][0]), atol=1e-5)


def test_set_pose_end_to_end_tiny(rng):
    """Driver.set_pose (free-view frontalization) through the packed jitted
    program at the tiny 256^2 config."""
    src = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32))
    kp = KPDetector(block_expansion=4, max_features=32, reshape_features=64,
                    reshape_depth=4)
    he = HEEstimator(block_expansion=8, width=16)
    gen = OcclusionAwareSPADEGenerator(
        block_expansion=8, max_features=32, reshape_channel=8,
        reshape_depth=4, num_resblocks=1, dm_block_expansion=4,
        dm_max_features=32, decoder_ic=8)
    key = jax.random.PRNGKey(0)
    kp_params = kp.init(key, src)["params"]
    he_params = he.init(jax.random.fold_in(key, 1), src)["params"]
    kpd = kp.apply({"params": kp_params}, src)
    hed = he.apply({"params": he_params}, src)
    kps = keypoint_transformation(kpd, hed)
    gen_params = gen.init(jax.random.fold_in(key, 2), src, kps, kps)["params"]
    driver = FaceVid2VidDriver({
        "kp_detector": kp_params, "he_estimator": he_params,
        "generator": gen_params,
    }, kp=kp, he=he, gen=gen)
    out = driver.set_pose(src)                      # frontalize
    assert out.shape == (1, 256, 256, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    tilted = driver.set_pose(src, yaw=30.0)
    assert not np.allclose(np.asarray(out), np.asarray(tilted))
