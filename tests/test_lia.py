"""LIA reenactment: direction orthogonality, encoder/synthesis shapes,
end-to-end driver, converter structure round-trip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.lia import (
    Direction,
    LIADriver,
    LIAEncoderApp,
    LIAGenerator,
)


def test_direction_orthogonal(rng):
    d = Direction(motion_dim=8)
    params = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))["params"]
    q = d.apply({"params": params}, None)
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(8), atol=1e-5)
    # direction(alpha) = alpha @ Q^T
    alpha = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    out = d.apply({"params": params}, alpha)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(alpha @ q.T), atol=1e-6)


def test_encoder_app_feats(rng):
    enc = LIAEncoderApp(size=64)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    w, feats = enc.apply({"params": params}, x)
    assert w.shape == (1, 512)
    # feats run from 8px up to full resolution
    assert [f.shape[1] for f in feats] == [8, 16, 32, 64]


def test_generator_end_to_end(rng):
    gen = LIAGenerator(size=64, motion_dim=4)
    src = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    drv = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), src, drv)
    out = gen.apply(variables, src, drv)
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())

    # the driver path: h_start = source motion -> latent = wa + dir(drv)
    h_start = gen.apply(variables, src, method=LIAGenerator.enc_motion)
    assert h_start.shape == (1, 4)
    out2 = gen.apply(variables, src, drv, h_start)
    assert bool(jnp.isfinite(out2).all())
    # with h_start == source motion the two formulas agree exactly
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=2e-3)

    driver = LIADriver.__new__(LIADriver)
    driver.gen = gen
    driver.params = variables["params"]
    from e4s2024_tpu.utils.packing import jit_with_packed_params
    driver._animate = jit_with_packed_params(driver._animate_p, driver.params)
    out3 = np.asarray(driver(src, drv))
    np.testing.assert_allclose(out3, np.asarray(out), atol=5e-3)


def test_converter_structure(rng):
    from e4s2024_tpu.convert.torch_loader import convert_lia

    t = torch.randn
    size, motion = 64, 4
    ch = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256}

    sd = {}
    # encoder: convs.0 = ConvLayer(3, ch[64], 1)
    sd["enc.net_app.convs.0.0.weight"] = t(ch[64], 3, 1, 1).numpy()
    sd["enc.net_app.convs.0.1.bias"] = t(ch[64]).numpy()
    res_ch = [(ch[64], ch[32]), (ch[32], ch[16]), (ch[16], ch[8]),
              (ch[8], ch[4])]
    for j, (ci, co) in enumerate(res_ch):
        p = f"enc.net_app.convs.{j + 1}"
        sd[f"{p}.conv1.0.weight"] = t(ci, ci, 3, 3).numpy()
        sd[f"{p}.conv1.1.bias"] = t(ci).numpy()
        sd[f"{p}.conv2.1.weight"] = t(co, ci, 3, 3).numpy()
        sd[f"{p}.conv2.2.bias"] = t(co).numpy()
        sd[f"{p}.skip.1.weight"] = t(co, ci, 1, 1).numpy()
    sd["enc.net_app.convs.5.weight"] = t(512, ch[8], 4, 4).numpy()
    for i in range(4):
        sd[f"enc.fc.{i}.weight"] = t(512, 512).numpy()
        sd[f"enc.fc.{i}.bias"] = t(512).numpy()
    sd["enc.fc.4.weight"] = t(motion, 512).numpy()
    sd["enc.fc.4.bias"] = t(motion).numpy()

    def styled(p, ci, co):
        sd[f"{p}.conv.weight"] = (t(1, co, ci, 3, 3) * 0.02).numpy()
        sd[f"{p}.conv.modulation.weight"] = t(ci, 512).numpy()
        sd[f"{p}.conv.modulation.bias"] = torch.ones(ci).numpy()
        sd[f"{p}.noise.weight"] = torch.zeros(1).numpy()
        sd[f"{p}.activate.bias"] = torch.zeros(co).numpy()

    def to_rgb(p, ci):
        # LIA's ToRGB is UNmodulated (styledecoder.py:374): ConvLayer
        # [EqualConv2d, FusedLeakyReLU] + standalone (1, 3, 1, 1) bias
        sd[f"{p}.conv.0.weight"] = (t(3, ci, 1, 1) * 0.1).numpy()
        sd[f"{p}.conv.1.bias"] = torch.zeros(3).numpy()
        sd[f"{p}.bias"] = torch.zeros(1, 3, 1, 1).numpy()

    sd["dec.direction.weight"] = t(512, motion).numpy()
    sd["dec.input.input"] = t(1, ch[4], 4, 4).numpy()
    styled("dec.conv1", ch[4], ch[4])
    plan = [(ch[4], ch[8]), (ch[8], ch[8]), (ch[8], ch[16]),
            (ch[16], ch[16]), (ch[16], ch[32]), (ch[32], ch[32]),
            (ch[32], ch[64]), (ch[64], ch[64])]
    for i, (ci, co) in enumerate(plan):
        styled(f"dec.convs.{i}", ci, co)
    for j, r in enumerate((8, 16, 32, 64)):
        to_rgb(f"dec.to_rgbs.{j}", ch[r])
        sd[f"dec.to_flows.{j}.conv.weight"] = (t(1, 3, ch[r], 1, 1)
                                               * 0.1).numpy()
        sd[f"dec.to_flows.{j}.conv.modulation.weight"] = t(ch[r], 512).numpy()
        sd[f"dec.to_flows.{j}.conv.modulation.bias"] = \
            torch.ones(ch[r]).numpy()
        sd[f"dec.to_flows.{j}.bias"] = torch.zeros(1, 3, 1, 1).numpy()

    params = convert_lia(sd, size=size)

    gen = LIAGenerator(size=size, motion_dim=motion)
    src = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    ref = gen.init(jax.random.PRNGKey(0), src, src)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(jax.tree_util.tree_map(np.asarray, ref))
    out = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                    src, src)
    assert bool(jnp.isfinite(out).all())


def test_registry():
    from e4s2024_tpu.pipelines.pose_drive import make_pose_driver

    with pytest.raises(ValueError, match="LIA"):
        make_pose_driver("LIA")
    with pytest.raises(NotImplementedError, match="PIRender"):
        make_pose_driver("PIRender")
