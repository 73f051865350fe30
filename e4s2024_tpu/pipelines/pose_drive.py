"""Pose-drive backend registry.

The reference selects among faceVid2Vid / TPSMM / DaGAN / LIA / PIRender via
`pose_drive` (reference Face_swap_with_two_imgs.py:705-769). Its own README
notes only faceVid2Vid ships with public checkpoints — the others point at
internal cluster paths (SURVEY.md §2.8). This registry mirrors that surface:
faceVid2Vid is implemented (e4s2024_tpu.models.facevid2vid); the others raise
with a clear message until their checkpoints/ports land.
"""

from __future__ import annotations

from typing import Any, Callable

_BACKENDS: dict[str, Callable[..., Any]] = {}


def register_pose_driver(name: str):
    def deco(fn):
        _BACKENDS[name] = fn
        return fn
    return deco


@register_pose_driver("faceVid2Vid")
def _facevid2vid(params: dict, **kw):
    from e4s2024_tpu.models.facevid2vid import FaceVid2VidDriver

    return FaceVid2VidDriver(params, **kw)


for _name in ("TPSMM", "DaGAN", "LIA", "PIRender"):
    def _missing(params=None, _n=_name, **kw):
        raise NotImplementedError(
            f"pose-drive backend {_n!r} has no public checkpoint in the "
            "reference (internal cluster paths only); use 'faceVid2Vid'")
    _BACKENDS[_name] = _missing


def make_pose_driver(name: str, params: dict | None = None, **kw):
    if name not in _BACKENDS:
        raise KeyError(f"unknown pose-drive backend {name!r}; "
                       f"available: {sorted(_BACKENDS)}")
    return _BACKENDS[name](params, **kw)
