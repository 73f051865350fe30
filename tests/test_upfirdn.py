"""Golden tests for upfirdn2d against a from-the-math torch oracle.

Oracle semantics (the mathematical definition, cf. SURVEY.md §2.1): zero-stuff by
`up` (after each sample), pad (pad0, pad1), convolve with the flipped FIR kernel,
subsample by `down`.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from e4s2024_tpu.ops import upfirdn2d, make_kernel, upsample_2x, downsample_2x, blur


def torch_upfirdn2d(x_nchw, kernel, up, down, pad):
    """Reference-math oracle in torch: NCHW in/out."""
    n, c, h, w = x_nchw.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    # zero-stuff
    out = torch.zeros(n, c, h * up, w * up, dtype=x_nchw.dtype)
    out[:, :, ::up, ::up] = x_nchw
    # pad (negative pads crop)
    out = F.pad(out, [max(pad0, 0), max(pad1, 0), max(pad0, 0), max(pad1, 0)])
    out = out[
        :,
        :,
        max(-pad0, 0): out.shape[2] - max(-pad1, 0),
        max(-pad0, 0): out.shape[3] - max(-pad1, 0),
    ]
    # convolve with flipped kernel, depthwise
    wk = torch.flip(kernel, [0, 1])[None, None].repeat(c, 1, 1, 1)
    out = F.conv2d(out, wk, groups=c)
    # subsample
    return out[:, :, ::down, ::down]


@pytest.mark.parametrize(
    "up,down,pad,hw",
    [
        (1, 1, (2, 1), (16, 16)),
        (2, 1, (2, 1), (8, 8)),
        (1, 2, (2, 2), (16, 16)),
        (2, 1, (1, 1), (7, 9)),
        (1, 2, (1, 1), (14, 10)),
        (1, 1, (1, 2), (5, 5)),
    ],
)
def test_upfirdn2d_matches_oracle(rng, up, down, pad, hw):
    h, w = hw
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    k = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k2 = np.outer(k, k)
    k2 /= k2.sum()

    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k2), up=up, down=down, pad=pad))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch_upfirdn2d(xt, torch.from_numpy(k2), up, down, pad)
    want = want.permute(0, 2, 3, 1).numpy()

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_make_kernel_normalized():
    k = make_kernel([1, 3, 3, 1])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, atol=1e-6)


def test_upsample_downsample_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    assert upsample_2x(x, k).shape == (1, 32, 32, 4)
    assert downsample_2x(x, k).shape == (1, 8, 8, 4)
    assert blur(x, k, pad=(2, 1)).shape == (1, 16, 16, 4)


def test_upsample_preserves_mean(rng):
    # FIR interpolation with a normalized kernel * factor^2 preserves the DC level.
    x = jnp.ones((1, 16, 16, 1))
    k = make_kernel([1, 3, 3, 1])
    up = upsample_2x(x, k)
    np.testing.assert_allclose(np.asarray(up[0, 8:24, 8:24, 0]), 1.0, atol=1e-5)
