"""Editor API tests (tiny random-weight RGI net)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.pipelines.editor import Editor


@pytest.fixture(scope="module")
def editor():
    net = RGINet(out_size=64, remaining_layer_idx=7, channel_multiplier=1,
                 encoder_input_size=64, encoder_num_units=(1, 1, 2, 1))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, 64, 64), int)])
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), seg)
    return Editor(v, net)


def _inputs(rng):
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.3)
    lbl = jnp.asarray(rng.integers(0, 12, (1, 64, 64)))
    return img, lbl


def test_invert_and_generate(editor, rng):
    img, lbl = _inputs(rng)
    sv = editor.invert(img, lbl)
    assert sv.shape == (1, 12, 1280)
    out = editor.generate_from_label(sv, lbl, regional_mode="fast")
    assert out.shape == (1, 64, 64, 3)


def test_component_style_swap(editor, rng):
    img, lbl = _inputs(rng)
    sv_a = editor.invert(img, lbl)
    sv_b = sv_a * 2.0
    mixed = editor.swap_component_style(sv_a, sv_b, ["hair", 5])
    np.testing.assert_allclose(np.asarray(mixed[0, 4]), np.asarray(sv_b[0, 4]))
    np.testing.assert_allclose(np.asarray(mixed[0, 5]), np.asarray(sv_b[0, 5]))
    np.testing.assert_allclose(np.asarray(mixed[0, 6]), np.asarray(sv_a[0, 6]))


def test_interpolation(editor, rng):
    img, lbl = _inputs(rng)
    sv_a = editor.invert(img, lbl)
    sv_b = sv_a + 1.0
    mid = editor.interpolate_styles(sv_a, sv_b, 0.5)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(sv_a) + 0.5, atol=1e-5)
    only_nose = editor.interpolate_styles(sv_a, sv_b, 0.5, components=["nose"])
    np.testing.assert_allclose(np.asarray(only_nose[0, 4]), np.asarray(sv_a[0, 4]))
    np.testing.assert_allclose(np.asarray(only_nose[0, 5]),
                               np.asarray(sv_a[0, 5]) + 0.5, atol=1e-5)


def test_mask_edits(editor):
    lbl = jnp.zeros((1, 16, 16), jnp.int32)
    lbl = lbl.at[:, 4:6, 4:6].set(5)       # nose blob
    moved = Editor.translate_component(lbl, 5, dy=3, dx=2)
    assert int(moved[0, 4, 4]) == 6        # vacated -> skin
    assert int(moved[0, 7, 6]) == 5        # moved nose
    lbl_b = jnp.zeros((1, 16, 16), jnp.int32).at[:, 10:12, 10:12].set(5)
    swapped = Editor.swap_component_mask(lbl, lbl_b, "nose")
    assert int(swapped[0, 4, 4]) == 6
    assert int(swapped[0, 10, 10]) == 5


def test_latent_direction(editor, rng):
    sv = jnp.zeros((1, 12, 1280))
    d = jnp.ones((1280,))
    out = editor.apply_latent_direction(sv, d, 2.5)
    np.testing.assert_allclose(np.asarray(out), 2.5)
    d2 = jnp.ones((12, 1280))
    out2 = editor.apply_latent_direction(sv, d2, -1.0)
    np.testing.assert_allclose(np.asarray(out2), -1.0)
