"""Research-driver tests: pair index, grids, mouth transfer, interpolation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.research import (
    comparison_grid,
    expansion_seam,
    interpolation_strip,
    load_pair_index,
    mouth_transfer,
    run_comp_figs,
)


def test_load_pair_index(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text("src tgt\n28001 28002\n28003 28004\n")
    assert load_pair_index(str(p)) == [("28001", "28002"),
                                       ("28003", "28004")]


def test_comparison_grid_mixed_sizes(rng):
    a = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    b = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    g = comparison_grid([a, b], pad=2)
    assert g.shape == (32, 32 + 2 + 32, 3) and g.dtype == np.uint8


def test_expansion_seam_is_two_sided():
    m = np.zeros((1, 32, 32, 1), np.float32)
    m[:, 8:24, 8:24] = 1.0
    seam = np.asarray(expansion_seam(jnp.asarray(m), radius=2))[0, ..., 0]
    assert seam[8, 8] == 1.0          # just inside the edge
    assert seam[6, 16] == 1.0         # just outside the edge
    assert seam[16, 16] == 0.0        # deep interior
    assert seam[0, 0] == 0.0          # far outside


def test_mouth_transfer_semantics(rng):
    src = np.full((64, 64, 3), 200.0, np.float32)
    tgt = np.full((64, 64, 3), 50.0, np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[40:56, 20:44] = 1.0
    out, m_u8, seam_u8 = mouth_transfer(src, tgt, mask, seam_radius=2)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # mouth interior comes from source, far field from target
    assert abs(int(out[48, 32, 0]) - 200) < 20
    assert abs(int(out[8, 8, 0]) - 50) < 20
    assert m_u8.max() == 255 and seam_u8.max() == 255


def test_run_comp_figs(tmp_path, rng):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    for idx in ("1", "2"):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(
            np.uint8)).save(d / f"{idx}.jpg")
    pairs = [("1", "2")]

    def swap_fn(s, t):
        return ((s.astype(np.float32) + t) / 2).astype(np.uint8)

    written = run_comp_figs(swap_fn, pairs, str(d), str(tmp_path / "out"))
    assert len(written) == 1
    g = np.asarray(Image.open(written[0]))
    assert g.shape[0] == 32 and g.shape[1] >= 3 * 32


def test_run_comp_figs_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        run_comp_figs(lambda s, t: s, [("9", "9")], str(tmp_path),
                      str(tmp_path / "o"))


def test_interpolation_strip(rng):
    """End-to-end interpolation figure on a tiny RGI net."""
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.editor import Editor

    net = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64),
                                                            int)])
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    ed = Editor(v, net=net)
    a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    b = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    la = rng.integers(0, 12, (64, 64))
    lb = rng.integers(0, 12, (64, 64))
    strip = interpolation_strip(ed, a, b, la, lb, steps=2)
    assert strip.dtype == np.uint8 and strip.shape[0] == 64
    assert strip.shape[1] >= 4 * 64  # a + 2 interpolants + b + gutters
