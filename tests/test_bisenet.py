"""BiSeNet parser tests: shapes, bicubic downsample torch-parity, converter."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.bisenet import BiSeNet, bicubic_downsample, face_parsing
from e4s2024_tpu.convert import convert_bisenet


def torch_bicubic_downsample(x_nchw, factor, a=-0.5):
    """Oracle: separable bicubic AA filter, stride=factor, reflect padding."""
    size = factor * 4
    xs = (np.arange(size) - np.floor(size / 2) + 0.5) / factor
    ax = np.abs(xs)
    k = np.where(
        ax <= 1.0, (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2.0, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0))
    k = (k / k.sum()).astype(np.float32)
    c = x_nchw.shape[1]
    k1 = torch.from_numpy(k).reshape(1, 1, size, 1).repeat(c, 1, 1, 1)
    k2 = torch.from_numpy(k).reshape(1, 1, 1, size).repeat(c, 1, 1, 1)
    pad = size - factor
    x = F.pad(x_nchw, (0, 0, pad // 2, pad - pad // 2), "reflect")
    x = F.conv2d(x, k1, stride=(factor, 1), groups=c)
    x = F.pad(x, (pad // 2, pad - pad // 2, 0, 0), "reflect")
    return F.conv2d(x, k2, stride=(1, factor), groups=c)


def test_bicubic_downsample_matches_oracle(rng):
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    for f in (2, 4):
        got = np.asarray(bicubic_downsample(jnp.asarray(x), f))
        want = torch_bicubic_downsample(torch.from_numpy(x).permute(0, 3, 1, 2), f)
        want = want.permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_bisenet_shapes(rng):
    net = BiSeNet()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out, out16, out32 = net.apply({"params": params}, x)
    assert out.shape == (1, 64, 64, 19)
    assert out16.shape == (1, 64, 64, 19)
    assert out32.shape == (1, 64, 64, 19)


def test_bisenet_converter_structure(rng):
    """Synthetic torch-named dict converts to exactly the flax init tree."""
    net = BiSeNet()
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]

    # build a torch state dict from the flax tree by inverting the converter
    sd = {}

    def conv_inv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in p:
            sd[f"{name}.bias"] = np.asarray(p["bias"])

    def bn_inv(name, p):
        sd[f"{name}.running_mean"] = np.asarray(p["mean"])
        sd[f"{name}.running_var"] = np.asarray(p["var"])
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def cbr_inv(name, p):
        conv_inv(f"{name}.conv", p["conv"])
        bn_inv(f"{name}.bn", p["bn"])

    r = params["resnet"]
    conv_inv("cp.resnet.conv1", r["conv1"])
    bn_inv("cp.resnet.bn1", r["bn1"])
    for layer in range(1, 5):
        for blk in range(2):
            b = r[f"layer{layer}_{blk}"]
            t = f"cp.resnet.layer{layer}.{blk}"
            conv_inv(f"{t}.conv1", b["conv1"]); bn_inv(f"{t}.bn1", b["bn1"])
            conv_inv(f"{t}.conv2", b["conv2"]); bn_inv(f"{t}.bn2", b["bn2"])
            if "down_conv" in b:
                conv_inv(f"{t}.downsample.0", b["down_conv"])
                bn_inv(f"{t}.downsample.1", b["down_bn"])
    for arm in ("arm16", "arm32"):
        cbr_inv(f"cp.{arm}.conv", params[arm]["conv"])
        conv_inv(f"cp.{arm}.conv_atten", params[arm]["conv_atten"])
        bn_inv(f"cp.{arm}.bn_atten", params[arm]["bn_atten"])
    for h in ("conv_head32", "conv_head16", "conv_avg"):
        cbr_inv(f"cp.{h}", params[h])
    cbr_inv("ffm.convblk", params["ffm"]["convblk"])
    conv_inv("ffm.conv1", params["ffm"]["conv1"])
    conv_inv("ffm.conv2", params["ffm"]["conv2"])
    for o in ("conv_out", "conv_out16", "conv_out32"):
        cbr_inv(f"{o}.conv", params[o]["conv"])
        conv_inv(f"{o}.conv_out", params[o]["conv_out"])

    got = convert_bisenet(sd)
    fa = jax.tree_util.tree_flatten_with_path(got)[0]
    fb = jax.tree_util.tree_flatten_with_path(params)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (pa, va), (_, vb) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))


def test_face_parsing_entry(rng):
    params = BiSeNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))["params"]
    img = jnp.asarray(rng.random((1, 1024, 1024, 3)).astype(np.float32))
    seg = face_parsing(params, img)
    assert seg.shape == (1, 512, 512)
    assert int(seg.max()) < 19
