"""Face editing API — the library form of the reference's editing tools.

Covers the operations of reference good_editing.py:122-620 (`Editor`) and the
interactive mask-painting UI's recompute path (reference run_UI.py:35,
ui_run/mouse_event.py — every brush stroke edits the 12-class label map and
re-synthesizes, same as `generate_from_label` here):

- reconstruct an image from its (possibly hand-edited) label map,
- swap a component's style between two faces (good_editing.py:149-191),
- swap a component's mask/shape between two faces (:193-240),
- translate a component inside the mask (:242-262),
- interpolate styles between two faces (:459-533),
- global latent-direction editing (w +/- alpha * direction, :586-620).

Everything is jitted; the editor holds the frozen RGI net variables.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.data.labels import FACE_PARSER_LABELS, NUM_SEG_CLASSES
from e4s2024_tpu.models.rgi import RGINet


class Editor:
    def __init__(self, rgi_variables: dict, net: RGINet | None = None):
        self.net = net or RGINet()
        self.variables = rgi_variables
        self._gen = jax.jit(self._generate, static_argnames=("regional_mode",))
        self._styles = jax.jit(self._style_vectors)

    # ---------------- core ----------------

    def _style_vectors(self, img, onehot):
        sv, _ = self.net.apply(self.variables, img, onehot,
                               method=RGINet.get_style_vectors)
        return sv

    def _generate(self, style_vectors, onehot, *, regional_mode="exact"):
        codes = self.net.apply(self.variables, style_vectors,
                               method=RGINet.cal_style_codes)
        img, _, _ = self.net.apply(self.variables, None, codes, onehot,
                                   method=RGINet.gen_img,
                                   regional_mode=regional_mode)
        return img

    def invert(self, img, label_map):
        """img (1,S,S,3) [-1,1]; label_map (1,H,W) int -> style vectors (1,K,1280)."""
        onehot = self.onehot(label_map)
        return self._styles(jnp.asarray(img), onehot)

    def generate_from_label(self, style_vectors, label_map, regional_mode="exact"):
        """Re-synthesize with a (possibly edited) label map — the UI hot path."""
        return self._gen(style_vectors, self.onehot(label_map),
                         regional_mode=regional_mode)

    @staticmethod
    def onehot(label_map):
        return jax.nn.one_hot(jnp.asarray(label_map), NUM_SEG_CLASSES,
                              dtype=jnp.float32)

    # ---------------- edits ----------------

    @staticmethod
    def component_index(name: str) -> int:
        return FACE_PARSER_LABELS.index(name)

    def swap_component_style(self, sv_a, sv_b, components):
        """Take `components` (names or indices) of b's style into a's
        (good_editing.py:172)."""
        idx = jnp.asarray([self.component_index(c) if isinstance(c, str) else c
                           for c in components])
        take = jnp.zeros((sv_a.shape[1],), bool).at[idx].set(True)
        return jnp.where(take[None, :, None], sv_b, sv_a)

    def interpolate_styles(self, sv_a, sv_b, t, components=None):
        """Linear style interpolation, optionally restricted to components
        (good_editing.py:459)."""
        mixed = (1.0 - t) * sv_a + t * sv_b
        if components is None:
            return mixed
        idx = jnp.asarray([self.component_index(c) if isinstance(c, str) else c
                           for c in components])
        sel = jnp.zeros((sv_a.shape[1],), bool).at[idx].set(True)
        return jnp.where(sel[None, :, None], mixed, sv_a)

    @staticmethod
    def swap_component_mask(label_a, label_b, component):
        """Replace component's region in a with b's shape (good_editing.py:193):
        a's old region becomes skin; b's region paints the component."""
        comp = Editor.component_index(component) if isinstance(component, str) \
            else component
        out = jnp.where(label_a == comp, 6, label_a)
        return jnp.where(label_b == comp, comp, out)

    @staticmethod
    @partial(jax.jit, static_argnames=("component",))
    def translate_component(label_map, component: int, dy: int = 0, dx: int = 0):
        """Shift a component's mask region (good_editing.py:242): the vacated
        region is filled with skin (6), the shifted region painted on top."""
        region = label_map == component
        out = jnp.where(region, 6, label_map)
        shifted = jnp.roll(region, shift=(dy, dx), axis=(-2, -1))
        return jnp.where(shifted, component, out)

    def apply_latent_direction(self, style_vectors, direction, alpha: float):
        """Global editing: move every component's style vector along a learned
        direction (good_editing.py:586). direction: (1280,) or (K, 1280)."""
        d = jnp.asarray(direction)
        if d.ndim == 1:
            d = d[None, None]
        elif d.ndim == 2:
            d = d[None]
        return style_vectors + alpha * d
