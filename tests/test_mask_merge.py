"""Tests for the vectorized mask-merge against a plain-numpy loop oracle
implementing the reference algorithm (swap_face_mask.py:194-333)."""

import numpy as np
import jax.numpy as jnp

from e4s2024_tpu.pipelines import swap_head_mask, swap_comp_style_vector


def oracle_swap_head_mask(source, target):
    H, W = target.shape
    bg = lambda m: np.isin(m, [0, 4, 7, 8, 11])
    source_face = ~bg(source)
    target_face = ~bg(target)
    hole_mask = np.logical_xor(source_face & target_face, target_face)

    eye_line = int(2 / 5 * H)
    nose_line = int(3 / 5 * H)
    if np.any(source == 3):
        eye_line = np.where(source == 3)[0].max()
    elif np.any(source == 2):
        eye_line = np.where(source == 2)[0].max()
    if np.any(source == 5):
        nose_line = np.where(source == 5)[0].max()
    hole_mask[:eye_line, :] = False

    res = np.zeros_like(target)
    res[target == 0] = 99
    res[target == 8] = 8
    res[target == 7] = 7
    res[target == 11] = 11
    res[source == 1] = 1
    res[source == 2] = 2
    res[np.logical_and(source == 4, target == 2)] = 2
    res[source == 3] = 3
    res[source == 5] = 5
    res[source == 6] = 6
    res[source == 9] = 9

    # hat-occlusion: per-column highest skin row scan (loop form)
    skin_high = np.full(W, H)
    for w in range(W):
        rows = np.where(target[:, w] == 6)[0]
        if len(rows):
            skin_high[w] = rows.min()
    for h in range(H):
        for w in range(W):
            if target[h, w] == 0 and h <= skin_high[w] != H:
                res[h, w] = 98

    res[target == 4] = 4
    res[target == 10] = 10
    res[res == 0] = 6
    res[res == 99] = 0
    res[res == 98] = 0
    hole_map = res.copy()
    hole_map[hole_mask] = 17
    return res, hole_mask, hole_map, nose_line


def _random_face_masks(rng, h=48, w=48):
    """Synthetic but face-like label maps: bg top, hair band, face blob, neck."""
    def one():
        m = np.zeros((h, w), np.int32)
        m[h // 3:, :] = 6  # skin
        m[h // 6: h // 3, w // 4: 3 * w // 4] = 4  # hair
        m[h // 2: h // 2 + 3, w // 3: w // 3 + 5] = 3  # eyes
        m[h // 2 - 3: h // 2, w // 3: w // 3 + 5] = 2  # brows
        m[2 * h // 3: 2 * h // 3 + 4, w // 2 - 2: w // 2 + 2] = 5  # nose
        m[5 * h // 6:, :] = 8  # neck
        m[3 * h // 4: 3 * h // 4 + 2, w // 2 - 3: w // 2 + 3] = 1  # lips
        # random jitter
        jit = rng.integers(0, 12, size=(h, w))
        sel = rng.random((h, w)) < 0.05
        m[sel] = jit[sel]
        return m
    return one(), one()


def test_swap_head_mask_matches_oracle(rng):
    for _ in range(5):
        src, tgt = _random_face_masks(rng)
        got = swap_head_mask(jnp.asarray(src), jnp.asarray(tgt))
        want_mask, want_hole, want_map, want_nose = oracle_swap_head_mask(src, tgt)
        np.testing.assert_array_equal(np.asarray(got["mask"]), want_mask)
        np.testing.assert_array_equal(np.asarray(got["hole_mask"]), want_hole)
        np.testing.assert_array_equal(np.asarray(got["hole_map"]), want_map)
        assert int(got["nose_line"]) == int(want_nose)


def test_swap_head_mask_no_eyes_fallback(rng):
    src = np.full((20, 20), 6, np.int32)  # all skin, no eyes/brows/nose
    tgt = np.full((20, 20), 6, np.int32)
    got = swap_head_mask(jnp.asarray(src), jnp.asarray(tgt))
    assert int(got["nose_line"]) == 12  # 3/5 * 20


def test_swap_comp_style_vector(rng):
    t = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
    comp = jnp.asarray([1, 2, 3, 5, 6, 9])
    out = np.asarray(swap_comp_style_vector(t, s, comp))
    np.testing.assert_allclose(out[0, 1], np.asarray(s)[0, 1])   # lip from source
    np.testing.assert_allclose(out[0, 4], np.asarray(t)[0, 4])   # hair from target
    np.testing.assert_allclose(out[0, 7], (np.asarray(t)[0, 7] + np.asarray(s)[0, 7]) / 2)
    np.testing.assert_allclose(out[0, 11], np.asarray(t)[0, 11])
    # teeth fallback when source has none
    s0 = s.at[:, 9].set(0.0)
    out2 = np.asarray(swap_comp_style_vector(t, s0, comp))
    np.testing.assert_allclose(out2[0, 9], np.asarray(t)[0, 9])
