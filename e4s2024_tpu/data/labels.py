"""Segmentation label taxonomy + format converters.

The framework's internal mask format is the reference's 12-class "faceParser
detailed" taxonomy (reference datasets/dataset.py:30):

    0 background, 1 lip, 2 eyebrows, 3 eyes, 4 hair, 5 nose, 6 skin,
    7 ears, 8 belowface(neck), 9 mouth(teeth), 10 eye_glass, 11 ear_rings

Converters map the two 19-class source taxonomies onto it with lookup tables
(vectorized; the reference builds ~12 boolean masks per image,
dataset.py:156-211 / :58-108 — an LUT gather is one pass).
"""

from __future__ import annotations

import numpy as np

FACE_PARSER_LABELS = [
    "background", "lip", "eyebrows", "eyes", "hair", "nose", "skin",
    "ears", "belowface", "mouth", "eye_glass", "ear_rings",
]
NUM_SEG_CLASSES = len(FACE_PARSER_LABELS)

# CelebAMask-HQ taxonomy, 0=bg then 18 attributes (reference swap_face_mask.py:19).
CELEBAHQ_LABELS = [
    "bg", "skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow",
    "l_ear", "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat", "ear_r",
    "neck_l", "neck", "cloth",
]

# face-parsing.PyTorch taxonomy (reference swap_face_mask.py:25).
FFHQ_LABELS = [
    "bg", "skin", "l_brow", "r_brow", "l_eye", "r_eye", "eye_g", "l_ear",
    "r_ear", "ear_r", "nose", "mouth", "u_lip", "l_lip", "neck", "neck_l",
    "cloth", "hair", "hat",
]

# 19 -> 12 lookup tables (identical semantics to dataset.py:156-211 and :58-108;
# unmapped classes (hat, cloth, neck_l) fall to background).
_CELEBAHQ_TO_12 = np.zeros(19, dtype=np.uint8)
for src, dst in {
    1: 6,   # skin
    2: 5,   # nose
    3: 10,  # eye_g
    4: 3, 5: 3,     # eyes
    6: 2, 7: 2,     # brows
    8: 7, 9: 7,     # ears
    10: 9,  # mouth interior (teeth)
    11: 1, 12: 1,   # lips
    13: 4,  # hair
    15: 11,  # ear_r
    17: 8,  # neck
}.items():
    _CELEBAHQ_TO_12[src] = dst

_FFHQ_TO_12 = np.zeros(19, dtype=np.uint8)
for src, dst in {
    1: 6,   # skin
    2: 2, 3: 2,     # brows
    4: 3, 5: 3,     # eyes
    6: 10,  # eye_g
    7: 7, 8: 7,     # ears
    9: 11,  # ear_r
    10: 5,  # nose
    11: 9,  # mouth interior
    12: 1, 13: 1,   # lips
    14: 8,  # neck
    17: 4,  # hair
}.items():
    _FFHQ_TO_12[src] = dst


def lut_map_tpu(labels, lut: np.ndarray):
    """Apply a small integer LUT to a label map ON DEVICE as a compare/
    select chain. A jnp gather (`lut[labels]`) costs ~4.8 ms for a
    (2, 512, 512) map on TPU; the 19-way where-chain is ~0.25 ms and
    numerically identical."""
    import jax.numpy as jnp

    out = jnp.zeros_like(labels)
    for k in range(len(lut)):
        v = int(lut[k])
        if v != 0:
            out = jnp.where(labels == k, v, out)
    return out


def celebahq19_to_face12(mask: np.ndarray) -> np.ndarray:
    """CelebAMask-HQ 19-label map -> internal 12-class map (dataset.py:156)."""
    return _CELEBAHQ_TO_12[np.asarray(mask, dtype=np.int64)]


def ffhq19_to_face12(mask: np.ndarray) -> np.ndarray:
    """face-parsing.PyTorch 19-label map -> internal 12-class map (dataset.py:58)."""
    return _FFHQ_TO_12[np.asarray(mask, dtype=np.int64)]


# The BiSeNet face parser emits the same taxonomy as face-parsing.PyTorch.
faceparser19_to_face12 = ffhq19_to_face12


def label_map_to_one_hot(label_map, num_classes: int = NUM_SEG_CLASSES):
    """(..., H, W) integer map -> (..., H, W, num_classes) float32 one-hot
    (the NHWC counterpart of reference utils/torch_utils.py:207)."""
    import jax.numpy as jnp

    lbl = jnp.asarray(label_map).astype(jnp.int32)
    return jnp.eye(num_classes, dtype=jnp.float32)[lbl]
