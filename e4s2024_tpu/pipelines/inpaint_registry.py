"""Inpainting backend registry.

The reference offers GCFSR-based inpainting (the live default,
swap_face_fine/face_inpainting.py) and MISF as an alternative
(swap_face_fine/MISF/inpainting.py). Both architectures are implemented here;
note MISF's reference checkpoint points at an internal cluster path
(inpainting.py:16: /apdcephfs_cq2/...), so using it requires converting your
own weights (convert.torch_loader.convert_misf).
"""

from __future__ import annotations

_BACKENDS = {}


def register_inpainter(name):
    def deco(fn):
        _BACKENDS[name] = fn
        return fn
    return deco


@register_inpainter("gcfsr")
def _gcfsr(params, **kw):
    from e4s2024_tpu.models.gcfsr import FaceInpainter

    return FaceInpainter(params, **kw)


@register_inpainter("misf")
def _misf(params=None, **kw):
    if params is None:
        raise ValueError(
            "MISF needs converted InpaintGenerator params (the reference "
            "ships no public checkpoint — internal cluster path, "
            "MISF/inpainting.py:16; convert your own via "
            "convert.torch_loader.convert_misf)")
    from e4s2024_tpu.models.misf import MISFInpainter

    return MISFInpainter(params, **kw)


def make_inpainter(name, params=None, **kw):
    if name not in _BACKENDS:
        raise KeyError(f"unknown inpainting backend {name!r}; "
                       f"available: {sorted(_BACKENDS)}")
    return _BACKENDS[name](params, **kw)
