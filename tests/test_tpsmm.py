"""TPSMM reenactment: TPS math vs a numpy oracle, grid_sample vs torch,
module shapes, converter structure round-trip."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.tpsmm import (
    TPSDenseMotion,
    TPSInpainting,
    TPSKPDetector,
    TPSMMDriver,
    grid_sample_2d,
    kp2gaussian2d,
    make_grid_2d,
    tps_warp_grid,
)


def test_grid_sample_2d_matches_torch(rng):
    img = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    grid = (rng.random((2, 5, 6, 2)).astype(np.float32) * 2.4 - 1.2)
    got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    want = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                         torch.from_numpy(grid), align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def _tps_oracle(kp1, kp2, coords):
    """Direct numpy solve of the TPS system (reference util.py:20-48), per
    batch/transform."""
    b, k, n, _ = kp1.shape
    out = np.zeros((b, k, coords.shape[0], 2))
    for bi in range(b):
        for ki in range(k):
            p1, p2 = kp1[bi, ki], kp2[bi, ki]
            d2 = ((p1[:, None] - p1[None]) ** 2).sum(-1)
            kmat = d2 * np.log(d2 + 1e-9)
            p = np.concatenate([p1, np.ones((n, 1))], 1)
            lmat = np.zeros((n + 3, n + 3))
            lmat[:n, :n] = kmat
            lmat[:n, n:] = p
            lmat[n:, :n] = p.T
            lmat += np.eye(n + 3) * 0.01
            y = np.concatenate([p2, np.zeros((3, 2))], 0)
            param = np.linalg.solve(lmat, y)
            w, a = param[:n], param[n:]
            d2c = ((coords[:, None] - p1[None]) ** 2).sum(-1)
            u = d2c * np.log(d2c + 1e-9)
            out[bi, ki] = (coords @ a[:2] + a[2:3] + u @ w)
    return out


def test_tps_warp_matches_oracle(rng):
    b, k, h, w = 1, 3, 6, 5
    kp1 = rng.uniform(-0.8, 0.8, (b, k, 5, 2)).astype(np.float32)
    kp2 = rng.uniform(-0.8, 0.8, (b, k, 5, 2)).astype(np.float32)
    got = np.asarray(tps_warp_grid(jnp.asarray(kp1), jnp.asarray(kp2), h, w))
    coords = np.asarray(make_grid_2d(h, w)).reshape(-1, 2).astype(np.float64)
    want = _tps_oracle(kp1.astype(np.float64), kp2.astype(np.float64),
                       coords).reshape(b, k, h, w, 2)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_tps_identity_kp(rng):
    """Same control points for driving and source -> near-identity warp."""
    kp = rng.uniform(-0.8, 0.8, (1, 2, 5, 2)).astype(np.float32)
    grid = np.asarray(tps_warp_grid(jnp.asarray(kp), jnp.asarray(kp), 8, 8))
    ident = np.asarray(make_grid_2d(8, 8))
    # regularized solve (0.01 ridge) is approximate, so loose tolerance
    np.testing.assert_allclose(grid[0, 0], ident, atol=0.05)


def test_kp2gaussian_peak(rng):
    kp = jnp.asarray([[[0.0, 0.0]]])
    g = np.asarray(kp2gaussian2d(kp, (9, 9), var=0.01))[0, :, :, 0]
    assert g[4, 4] == g.max()
    np.testing.assert_allclose(g[4, 4], 1.0, atol=1e-6)


@pytest.fixture(scope="module")
def small_nets():
    kp = TPSKPDetector(num_tps=2)
    dm = TPSDenseMotion(num_tps=2, block_expansion=8, max_features=64,
                        num_blocks=5)
    inp = TPSInpainting(block_expansion=8, max_features=32)
    return kp, dm, inp


def test_tpsmm_end_to_end(rng, small_nets):
    # 256^2 like the vox config: the 5-block hourglass needs the 0.25-scaled
    # motion input to survive 5 halvings
    kp, dm, inp = small_nets
    src = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32))
    drv = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32))
    kp_params = kp.init(jax.random.PRNGKey(0), src)["params"]
    kp_s = kp.apply({"params": kp_params}, src)
    kp_d = kp.apply({"params": kp_params}, drv)
    assert kp_s.shape == (1, 10, 2)
    assert float(jnp.abs(kp_s).max()) <= 1.0

    dm_params = dm.init(jax.random.PRNGKey(1), src, kp_d, kp_s)["params"]
    dense = dm.apply({"params": dm_params}, src, kp_d, kp_s)
    assert dense["deformation"].shape == (1, 64, 64, 2)
    assert len(dense["occlusion_map"]) == 4
    # multi-res: occ[0] taps the half-res decoder output (torch
    # prediction[-2]), then 64/128/256
    assert dense["occlusion_map"][0].shape == (1, 32, 32, 1)
    assert dense["occlusion_map"][-1].shape == (1, 256, 256, 1)

    in_params = inp.init(jax.random.PRNGKey(2), src, dense)["params"]
    out = inp.apply({"params": in_params}, src, dense)
    assert out.shape == (1, 256, 256, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0

    driver = TPSMMDriver.__new__(TPSMMDriver)
    driver.kp, driver.dm, driver.inp = kp, dm, inp
    driver.params = {"kp_detector": kp_params, "dense_motion": dm_params,
                     "inpainting": in_params}
    from e4s2024_tpu.utils.packing import jit_with_packed_params
    driver._animate = jit_with_packed_params(driver._animate_p, driver.params)
    out2 = driver(src, drv)
    # jit vs eager differ by fusion rounding through the TPS solve
    np.testing.assert_allclose(np.asarray(out2), o, atol=2e-3)


def test_converter_structure(rng):
    """Fake torch state dicts -> convert -> must match init structure and
    run."""
    from e4s2024_tpu.convert.torch_loader import convert_tpsmm

    t = torch.randn

    def conv(p, ci, co, k):
        return {f"{p}.weight": t(co, ci, k, k).numpy(),
                f"{p}.bias": t(co).numpy()}

    def conv_nb(p, ci, co, k):
        return {f"{p}.weight": t(co, ci, k, k).numpy()}

    def bn(p, c):
        return {f"{p}.weight": t(c).numpy(), f"{p}.bias": t(c).numpy(),
                f"{p}.running_mean": t(c).numpy(),
                f"{p}.running_var": torch.rand(c).numpy() + 0.5}

    def norm(p, c):
        return {f"{p}.weight": t(c).numpy(), f"{p}.bias": t(c).numpy()}

    def cn(p, ci, co, k=3):
        return {**conv(f"{p}.conv", ci, co, k), **norm(f"{p}.norm", co)}

    def res(p, c):
        return {**conv(f"{p}.conv1", c, c, 3), **conv(f"{p}.conv2", c, c, 3),
                **norm(f"{p}.norm1", c), **norm(f"{p}.norm2", c)}

    num_tps = 2
    kp_sd = {**conv_nb("fg_encoder.conv1", 3, 64, 7),
             **bn("fg_encoder.bn1", 64),
             "fg_encoder.fc.weight": t(num_tps * 10, 512).numpy(),
             "fg_encoder.fc.bias": t(num_tps * 10).numpy()}
    chans = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for li, (ci, co) in chans.items():
        for bi in range(2):
            p = f"fg_encoder.layer{li}.{bi}"
            cin = ci if bi == 0 else co
            kp_sd.update(conv_nb(f"{p}.conv1", cin, co, 3))
            kp_sd.update(bn(f"{p}.bn1", co))
            kp_sd.update(conv_nb(f"{p}.conv2", co, co, 3))
            kp_sd.update(bn(f"{p}.bn2", co))
            if bi == 0 and li > 1:
                kp_sd.update(conv_nb(f"{p}.downsample.0", cin, co, 1))
                kp_sd.update(bn(f"{p}.downsample.1", co))

    # dense motion: be=8, mf=64, 5 blocks, in = 3*(K+1) + K*5 + 1 = 20
    be, mf = 8, 64
    dm_sd = {}
    enc_in = [20] + [min(mf, be * 2 ** (i + 1)) for i in range(4)]
    for i in range(5):
        dm_sd.update(cn(f"hourglass.encoder.down_blocks.{i}", enc_in[i],
                        min(mf, be * 2 ** (i + 1))))
    dec_out = []
    for j, i in enumerate(range(5)[::-1]):
        in_f = (1 if i == 4 else 2) * min(mf, be * 2 ** (i + 1))
        dm_sd.update(cn(f"hourglass.decoder.up_blocks.{j}", in_f,
                        min(mf, be * 2 ** i)))
        dec_out.append(min(mf, be * 2 ** i) + (enc_in[i] if i > 0 else 20))
    last = dec_out[-1]
    dm_sd.update(conv("maps", last, num_tps + 1, 7))
    dm_sd.update(conv("occlusion.0", dec_out[-2], 1, 7))
    dm_sd.update(conv("occlusion.1", last, 1, 7))
    dm_sd.update(cn("up.0", last, last // 2))
    dm_sd.update(conv("occlusion.2", last // 2, 1, 7))
    dm_sd.update(cn("up.1", last // 2, last // 4))
    dm_sd.update(conv("occlusion.3", last // 4, 1, 7))

    # inpainting: be=8, mf=32, 3 down blocks
    be, mf = 8, 32
    in_sd = {**cn("first", 3, be, 7), **conv("final", be, 3, 7)}
    downs = [min(mf, be * 2 ** (i + 1)) for i in range(3)]  # 16, 32, 32
    ins = [be] + downs[:-1]
    for i in range(3):
        in_sd.update(cn(f"down_blocks.{i}", ins[i], downs[i]))
    # torch stores up_blocks/resblock REVERSED; build in stored order
    dec_in = [downs[2], downs[1] * 2, downs[0] * 2]  # 32, 64, 32
    dec_out_i = [downs[1], downs[0], be]
    for i in range(3):
        in_sd.update(cn(f"up_blocks.{i}", dec_in[i], dec_out_i[i]))
        in_sd.update(res(f"resblock.{2 * i}", dec_in[i]))
        in_sd.update(res(f"resblock.{2 * i + 1}", dec_in[i]))

    params = convert_tpsmm({"kp_detector": kp_sd,
                            "dense_motion_network": dm_sd,
                            "inpainting_network": in_sd})

    kp = TPSKPDetector(num_tps=num_tps)
    dm = TPSDenseMotion(num_tps=num_tps, block_expansion=8, max_features=64)
    inp = TPSInpainting(block_expansion=8, max_features=32)
    src = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32))
    kp_ref = kp.init(jax.random.PRNGKey(0), src)["params"]
    assert jax.tree_util.tree_structure(params["kp_detector"]) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, kp_ref))

    kp_s = kp.apply({"params": params["kp_detector"]}, src)
    dm_ref = dm.init(jax.random.PRNGKey(1), src, kp_s, kp_s)["params"]
    assert jax.tree_util.tree_structure(params["dense_motion"]) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, dm_ref))
    dense = dm.apply({"params": params["dense_motion"]}, src, kp_s, kp_s)

    in_ref = inp.init(jax.random.PRNGKey(2), src, dense)["params"]
    assert jax.tree_util.tree_structure(params["inpainting"]) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, in_ref))
    out = inp.apply({"params": params["inpainting"]}, src, dense)
    assert bool(jnp.isfinite(out).all())


def test_registry():
    from e4s2024_tpu.pipelines.pose_drive import make_pose_driver

    with pytest.raises(ValueError, match="TPSMM"):
        make_pose_driver("TPSMM")
