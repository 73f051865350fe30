"""Pose-drive backend registry.

The reference selects among faceVid2Vid / TPSMM / DaGAN / LIA / PIRender via
`pose_drive` (reference Face_swap_with_two_imgs.py:705-769). Its own README
notes only faceVid2Vid ships with public checkpoints — the others point at
internal cluster paths (SURVEY.md §2.8). This registry mirrors that surface:
faceVid2Vid (models.facevid2vid), TPSMM (models.tpsmm), DaGAN
(models.dagan) and LIA (models.lia) are implemented; PIRender raises with a
clear message (it depends on Deep3DFaceRecon + licensed BFM morphable-model
assets the reference does not ship).
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


@register_pose_driver("TPSMM")
def _tpsmm(params: dict, **kw):
    if params is None:
        raise ValueError(
            "TPSMM needs converted params (the reference's checkpoint is an "
            "internal cluster path, TPSMM/demo.py:145; convert your own via "
            "convert.torch_loader.convert_tpsmm)")
    from e4s2024_tpu.models.tpsmm import TPSMMDriver

    return TPSMMDriver(params, **kw)


@register_pose_driver("DaGAN")
def _dagan(params: dict, **kw):
    if params is None:
        raise ValueError(
            "DaGAN needs converted params (the reference's checkpoints are "
            "internal cluster paths, face_swap_for_video.py:311-313; convert "
            "your own via convert.torch_loader.convert_dagan)")
    from e4s2024_tpu.models.dagan import DaGANDriver

    return DaGANDriver(params, **kw)


@register_pose_driver("LIA")
def _lia(params: dict, **kw):
    if params is None:
        raise ValueError(
            "LIA needs converted params (the reference's checkpoint is an "
            "internal cluster path, LIA/run_demo.py:54; convert your own "
            "via convert.torch_loader.convert_lia)")
    from e4s2024_tpu.models.lia import LIADriver

    return LIADriver(params, **kw)


def _pirender_missing(params=None, **kw):
    raise NotImplementedError(
        "pose-drive backend 'PIRender' is not runnable even in the reference:"
        " it imports Deep3DFaceRecon_pytorch.drive, a package the reference "
        "does not ship (face_swap_for_video.py:285), and depends on licensed "
        "BFM 3DMM assets; use 'faceVid2Vid', 'TPSMM', 'DaGAN' or 'LIA'")


_BACKENDS["PIRender"] = _pirender_missing


def make_pose_driver(name: str, params: dict | None = None, **kw):
    if name not in _BACKENDS:
        raise KeyError(f"unknown pose-drive backend {name!r}; "
                       f"available: {sorted(_BACKENDS)}")
    return _BACKENDS[name](params, **kw)
