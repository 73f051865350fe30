"""Swapped-segmentation computation — the core mask-merge of face swapping.

TPU-native (fully vectorized, jit-able) re-design of the reference's
`swap_head_mask_hole_first` (reference swap_face_fine/swap_face_mask.py:194-333)
and `swap_comp_style_vector` (:336-367). The reference runs this on CPU numpy
with ~30 boolean-index assignments and a Python loop over background pixels for
the hat-occlusion fix; here everything is jnp `where` painting and min-reductions,
so it fuses into the on-device swap pipeline.

Class ids: 0 bg, 1 lip, 2 eyebrow, 3 eye, 4 hair, 5 nose, 6 skin, 7 ear,
8 neck, 9 tooth, 10 eyeglass, 11 earring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BG_CLASSES = (0, 4, 7, 8, 11)  # bg, hair, ear, neck, earring
_SOURCE_FACE_PAINT = (1, 2, 3, 5, 6, 9)  # lip, brow, eye, nose, skin, tooth


def _is_bg(mask: jnp.ndarray) -> jnp.ndarray:
    out = jnp.zeros_like(mask, dtype=bool)
    for c in _BG_CLASSES:
        out = out | (mask == c)
    return out


@jax.jit
def swap_head_mask(source: jnp.ndarray, target: jnp.ndarray):
    """Merge source inner-face onto target background/foreground.

    Args:
      source/target: (H, W) int 12-class label maps (aligned crops).

    Returns dict with:
      mask:      (H, W) merged label map,
      hole_mask: (H, W) bool — target-face pixels not covered by the source face
                 (below the source eye line),
      hole_map:  (H, W) label map with holes marked 17 (for visualization),
      nose_line: scalar int (lowest source-nose row).

    Semantics match reference swap_face_mask.py:194-333 ("hole first" variant,
    cairong path): target bg/neck/ear/earring as background, source
    lip/brow/eye/nose/skin/tooth painted over, source-hair-over-target-brow
    kept as brow, hat-occlusion fix via per-column highest-skin scan, target
    hair/eyeglass on top, leftover holes filled with skin.
    """
    h, w = target.shape
    rows = jnp.arange(h)[:, None]

    source_face = ~_is_bg(source)
    target_face = ~_is_bg(target)
    hole_mask = jnp.logical_xor(source_face & target_face, target_face)

    # eye/nose lines from the source (reference :232-239)
    def lowest_row(cond, default):
        any_ = jnp.any(cond)
        val = jnp.max(jnp.where(cond, rows, -1))
        return jnp.where(any_, val, default)

    eye_line = lowest_row(source == 3, 2 * h // 5)
    eye_line = jnp.where(
        jnp.any(source == 3), eye_line, lowest_row(source == 2, 2 * h // 5)
    )
    nose_line = lowest_row(source == 5, 3 * h // 5)

    hole_mask = hole_mask & (rows >= eye_line)  # (reference :243-244)

    # painter's algorithm: later paints overwrite earlier ones
    res = jnp.zeros_like(target)
    paints = [
        (target == 0, 99),
        (target == 8, 8),
        (target == 7, 7),
        (target == 11, 11),
    ]
    paints += [(source == c, c) for c in (1, 2)]
    paints += [((source == 4) & (target == 2), 2)]  # src hair over tgt brow
    paints += [(source == c, c) for c in (3, 5, 6, 9)]

    # hat-occlusion fix (reference :278-301): target-bg pixels at or above the
    # highest target-skin row of their column become foreground.
    skin_rows = jnp.where(target == 6, rows, h)
    skin_highest = jnp.min(skin_rows, axis=0)  # (W,)
    tgt_fg = (target == 0) & (rows <= skin_highest[None, :]) & (skin_highest != h)[None, :]
    paints += [
        (tgt_fg, 98),
        (target == 4, 4),
        (target == 10, 10),
    ]
    for cond, val in paints:
        res = jnp.where(cond, val, res)

    res = jnp.where(res == 0, 6, res)   # fill remaining holes with skin
    res = jnp.where(res == 99, 0, res)  # restore background
    res = jnp.where(res == 98, 0, res)  # restore additional foreground as bg
    hole_map = jnp.where(hole_mask, 17, res)

    return {
        "mask": res,
        "hole_mask": hole_mask,
        "hole_map": hole_map,
        "nose_line": nose_line,
    }


@jax.jit
def swap_comp_style_vector(
    target_sv: jnp.ndarray,
    source_sv: jnp.ndarray,
    comp_indices: jnp.ndarray,
    belowface_interpolation: bool = False,
) -> jnp.ndarray:
    """Mix per-component style vectors for swapping (reference :336-367).

    Args:
      target_sv / source_sv: (1, 12, D) style vectors of target / source.
      comp_indices: int array of component ids to take from the source.

    Rules on top of the index swap: ears averaged, earrings from target, teeth
    fall back to target when the source has none, optional neck interpolation.
    """
    k = target_sv.shape[1]
    take_src = jnp.zeros((k,), bool)
    take_src = take_src.at[comp_indices].set(True)
    sv = jnp.where(take_src[None, :, None], source_sv, target_sv)

    sv = sv.at[:, 7].set((target_sv[:, 7] + source_sv[:, 7]) / 2)  # ears
    sv = sv.at[:, 11].set(target_sv[:, 11])  # earrings from target
    if belowface_interpolation:
        sv = sv.at[:, 8].set((target_sv[:, 8] + source_sv[:, 8]) / 2)
    # per-sample teeth fallback (the reference runs with B=1, :364)
    src_has_teeth = (jnp.sum(source_sv[:, 9], axis=-1, keepdims=True) != 0)
    sv = sv.at[:, 9].set(jnp.where(src_has_teeth, sv[:, 9], target_sv[:, 9]))
    return sv


@jax.jit
def swap_head_mask_consider_glass(source: jnp.ndarray, target: jnp.ndarray):
    """Earlier-generation mask merge (reference swap_face_mask.py:93-154
    `swap_head_mask_revisit_considerGlass`): source face painted only where
    the target is not background; source hair wins over target hair.

    Returns (mask, hole_map, eyebrows_line)."""
    res = jnp.zeros_like(target)
    res = jnp.where(target == 0, 99, res)
    res = jnp.where(target == 8, 8, res)
    for c in (7, 11, 1, 2, 3, 5, 6, 9):
        res = jnp.where((source == c) & (res != 99), c, res)
    res = jnp.where(target == 10, 10, res)
    res = jnp.where(source == 4, 4, res)
    hole_map = jnp.where(res == 0, 255, 0)
    res = jnp.where(res == 0, 6, res)
    res = jnp.where(res == 99, 0, res)
    rows = jnp.arange(target.shape[0])[:, None]
    has_brow = jnp.any(res == 2)
    brow_line = jnp.where(
        has_brow, jnp.min(jnp.where(res == 2, rows, target.shape[0])), 0)
    return res, hole_map, brow_line


def swap_head_mask_target_bg_dilation(source: jnp.ndarray, target: jnp.ndarray,
                                      radius: int = 3, iters: int = 7):
    """Dilated-target-background variant (reference swap_face_mask.py:370-438):
    grow the target's non-face regions before painting the source face."""
    from e4s2024_tpu.ops.morphology import dilation as _dilate

    bg = _is_bg(target)
    bg_vals = jnp.where(bg, target, 1)
    bg_vals = jnp.where(bg_vals == 0, 99, bg_vals).astype(jnp.float32)
    m = bg_vals[None, ..., None]
    for _ in range(iters):
        m = _dilate(m, 2 * radius + 1)
    res = m[0, ..., 0].astype(target.dtype)
    res = jnp.where(res == 99, 0, res)
    for c in (1, 2, 3, 5, 6, 9):
        res = jnp.where(source == c, c, res)
    res = jnp.where(target == 4, 4, res)
    res = jnp.where(target == 10, 10, res)
    return res
