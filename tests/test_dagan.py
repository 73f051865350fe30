"""DaGAN reenactment: keypoint/jacobian properties, dense-motion identity,
end-to-end shapes, converter structure round-trip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.dagan import (
    DaGANDenseMotion,
    DaGANDriver,
    DaGANKPDetector,
    DepthAwareGenerator,
    DepthDecoder,
    DepthResnetEncoder,
)


@pytest.fixture(scope="module")
def kp_small():
    kp = DaGANKPDetector(num_kp=3, block_expansion=8, max_features=32,
                         num_blocks=2, scale_factor=0.5)
    x = jnp.zeros((1, 64, 64, 4))
    params = kp.init(jax.random.PRNGKey(0), x)["params"]
    return kp, params


def test_kp_detector_properties(rng, kp_small):
    kp, params = kp_small
    x = jnp.asarray(rng.random((2, 64, 64, 4)).astype(np.float32))
    out = kp.apply({"params": params}, x)
    assert out["value"].shape == (2, 3, 2)
    # soft-argmax of a softmax heatmap stays inside the grid
    assert float(jnp.abs(out["value"]).max()) <= 1.0
    # jacobian head is zero-init with identity bias -> exactly identity
    assert out["jacobian"].shape == (2, 3, 2, 2)
    np.testing.assert_allclose(np.asarray(out["jacobian"]),
                               np.tile(np.eye(2), (2, 3, 1, 1)), atol=1e-6)


def test_dense_motion_identity_kp(rng):
    """Same keypoints + identity jacobians -> every sparse motion is the
    identity grid, so the combined flow is identity regardless of masks."""
    dm = DaGANDenseMotion(num_kp=3, block_expansion=8, max_features=32,
                          num_blocks=2, scale_factor=1)
    src = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    kp = {"value": jnp.asarray(rng.uniform(-0.5, 0.5, (1, 3, 2))
                               .astype(np.float32)),
          "jacobian": jnp.tile(jnp.eye(2), (1, 3, 1, 1))}
    params = dm.init(jax.random.PRNGKey(0), src, kp, kp)["params"]
    out = dm.apply({"params": params}, src, kp, kp)
    from e4s2024_tpu.models.tpsmm import make_grid_2d
    np.testing.assert_allclose(np.asarray(out["deformation"])[0],
                               np.asarray(make_grid_2d(32, 32)), atol=1e-5)
    assert out["occlusion_map"].shape == (1, 32, 32, 1)
    assert out["mask"].shape == (1, 32, 32, 4)


def test_depth_network_shapes(rng):
    enc = DepthResnetEncoder(layers=(1, 1, 1, 1))
    dec = DepthDecoder(num_ch_dec=(4, 8, 16, 32, 64))
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    ep = enc.init(jax.random.PRNGKey(0), img)["params"]
    feats = enc.apply({"params": ep}, img)
    assert [f.shape[-1] for f in feats] == [64, 256, 512, 1024, 2048]
    dp = dec.init(jax.random.PRNGKey(1), feats)["params"]
    disp = dec.apply({"params": dp}, feats)
    assert disp.shape == (1, 64, 64, 1)
    d = np.asarray(disp)
    assert d.min() >= 0.0 and d.max() <= 1.0


def test_generator_end_to_end(rng):
    gen = DepthAwareGenerator(
        num_kp=3, block_expansion=8, max_features=32, num_down_blocks=2,
        num_bottleneck_blocks=2,
        dense_motion=dict(block_expansion=8, max_features=32, num_blocks=2,
                          scale_factor=0.25))
    src = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
    kp = {"value": jnp.zeros((1, 3, 2)),
          "jacobian": jnp.tile(jnp.eye(2), (1, 3, 1, 1))}
    params = gen.init(jax.random.PRNGKey(0), src, kp, kp, depth)["params"]
    out = gen.apply({"params": params}, src, kp, kp, depth)
    assert out["prediction"].shape == (1, 64, 64, 3)
    p = np.asarray(out["prediction"])
    assert np.isfinite(p).all() and p.min() >= 0.0 and p.max() <= 1.0
    assert out["occlusion_map"].shape == (1, 16, 16, 1)


def test_converter_structure(rng):
    from e4s2024_tpu.convert.torch_loader import convert_dagan

    t = torch.randn

    def conv(p, ci, co, k, bias=True):
        sd = {f"{p}.weight": t(co, ci, k, k).numpy()}
        if bias:
            sd[f"{p}.bias"] = t(co).numpy()
        return sd

    def bn(p, c):
        return {f"{p}.weight": t(c).numpy(), f"{p}.bias": t(c).numpy(),
                f"{p}.running_mean": t(c).numpy(),
                f"{p}.running_var": torch.rand(c).numpy() + 0.5}

    def cn(p, ci, co, k=3):
        return {**conv(f"{p}.conv", ci, co, k), **bn(f"{p}.norm", co)}

    def res(p, c):
        return {**conv(f"{p}.conv1", c, c, 3), **conv(f"{p}.conv2", c, c, 3),
                **bn(f"{p}.norm1", c), **bn(f"{p}.norm2", c)}

    def hourglass(prefix, in_ch, be, mf, nb):
        sd = {}
        enc_in = [in_ch] + [min(mf, be * 2 ** (i + 1)) for i in range(nb - 1)]
        for i in range(nb):
            sd.update(cn(f"{prefix}.encoder.down_blocks.{i}", enc_in[i],
                         min(mf, be * 2 ** (i + 1))))
        for j, i in enumerate(range(nb)[::-1]):
            in_f = (1 if i == nb - 1 else 2) * min(mf, be * 2 ** (i + 1))
            sd.update(cn(f"{prefix}.decoder.up_blocks.{j}", in_f,
                         min(mf, be * 2 ** i)))
        return sd

    num_kp, be, mf, nb = 3, 8, 32, 2
    # generator (be 8, mf 32, 2 down blocks, 2 bottleneck)
    g_sd = {**cn("first", 3, 8, 7), **cn("src_first", 1, 8, 7),
            **conv("final", 8, 3, 7)}
    for i, (ci, co) in enumerate(((8, 16), (16, 32))):
        g_sd.update(cn(f"down_blocks.{i}", ci, co))
        g_sd.update(cn(f"src_down_blocks.{i}", ci, co))
        g_sd.update(cn(f"up_blocks.{i}", (32, 16)[i], (16, 8)[i]))
    for i in range(2):
        g_sd.update(res(f"bottleneck.r{i}", 32))
    g_sd.update({"AttnModule.gamma": np.zeros(1, np.float32)})
    g_sd.update(conv("AttnModule.query_conv", 32, 4, 1))
    g_sd.update(conv("AttnModule.key_conv", 32, 4, 1))
    g_sd.update(conv("AttnModule.value_conv", 32, 32, 1))
    g_sd.update(hourglass("dense_motion_network.hourglass",
                          (num_kp + 1) * 4, be, mf, nb))
    hg_out = be + (num_kp + 1) * 4
    g_sd.update(conv("dense_motion_network.mask", hg_out, num_kp + 1, 7))
    g_sd.update(conv("dense_motion_network.occlusion", hg_out, 1, 7))

    kp_sd = {**hourglass("predictor", 4, be, mf, nb),
             **conv("kp", be + 4, num_kp, 7),
             **conv("jacobian", be + 4, 4 * num_kp, 7)}

    # depth resnet50-style with 1 block per layer
    enc_sd = {**conv("encoder.conv1", 3, 64, 7, bias=False),
              **bn("encoder.bn1", 64)}
    cins = (64, 256, 512, 1024)
    for li, f in enumerate((64, 128, 256, 512)):
        p = f"encoder.layer{li + 1}.0"
        enc_sd.update(conv(f"{p}.conv1", cins[li], f, 1, bias=False))
        enc_sd.update(bn(f"{p}.bn1", f))
        enc_sd.update(conv(f"{p}.conv2", f, f, 3, bias=False))
        enc_sd.update(bn(f"{p}.bn2", f))
        enc_sd.update(conv(f"{p}.conv3", f, f * 4, 1, bias=False))
        enc_sd.update(bn(f"{p}.bn3", f * 4))
        enc_sd.update(conv(f"{p}.downsample.0", cins[li], f * 4, 1,
                           bias=False))
        enc_sd.update(bn(f"{p}.downsample.1", f * 4))

    dch = (4, 8, 16, 32, 64)
    ech = (64, 256, 512, 1024, 2048)
    dec_sd = {}
    for i in range(4, -1, -1):
        n0 = 2 * (4 - i)
        cin0 = ech[-1] if i == 4 else dch[i + 1]
        dec_sd.update(conv(f"decoder.{n0}.conv.conv", cin0, dch[i], 3))
        cin1 = dch[i] + (ech[i - 1] if i > 0 else 0)
        dec_sd.update(conv(f"decoder.{n0 + 1}.conv.conv", cin1, dch[i], 3))
    dec_sd.update(conv("decoder.10.conv", dch[0], 1, 3))

    params = convert_dagan(g_sd, kp_sd, enc_sd, dec_sd, num_kp=num_kp,
                           num_blocks=nb, num_down_blocks=2,
                           num_bottleneck=2, resnet_layers=(1, 1, 1, 1))

    enc = DepthResnetEncoder(layers=(1, 1, 1, 1))
    dec = DepthDecoder(num_ch_dec=dch)
    kp = DaGANKPDetector(num_kp=num_kp, block_expansion=be, max_features=mf,
                         num_blocks=nb, scale_factor=0.5)
    gen = DepthAwareGenerator(
        num_kp=num_kp, block_expansion=8, max_features=32, num_down_blocks=2,
        num_bottleneck_blocks=2,
        dense_motion=dict(block_expansion=be, max_features=mf, num_blocks=nb,
                          scale_factor=0.25))

    driver = DaGANDriver.__new__(DaGANDriver)
    driver.enc, driver.dec, driver.kp, driver.gen = enc, dec, kp, gen
    driver.params = params
    from e4s2024_tpu.utils.packing import jit_with_packed_params
    driver._animate = jit_with_packed_params(driver._animate_p, driver.params)

    src = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    drv = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    # structure check against init
    ref = {
        "depth_encoder": enc.init(jax.random.PRNGKey(0), src)["params"],
    }
    assert jax.tree_util.tree_structure(params["depth_encoder"]) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, ref["depth_encoder"]))

    out = np.asarray(driver(src, drv))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_registry():
    from e4s2024_tpu.pipelines.pose_drive import make_pose_driver

    with pytest.raises(ValueError, match="DaGAN"):
        make_pose_driver("DaGAN")
    # LIA is implemented; without converted params it must fail loudly
    with pytest.raises(ValueError, match="LIA"):
        make_pose_driver("LIA")
    # PIRender stays a documented stub (unshippable in the reference too)
    with pytest.raises(NotImplementedError, match="PIRender"):
        make_pose_driver("PIRender")
