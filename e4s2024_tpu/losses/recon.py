"""Shared reconstruction criterion (LPIPS + ID + face-parsing + L2).

The same weighted combination the reference uses in Coach.calc_loss
(reference training/coach.py:453-503), Optimizer.calc_loss (optimization.py),
the PTI coach and the stitching coach — factored into one callable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from e4s2024_tpu.losses.losses import (
    feature_cosine_loss,
    id_loss_crop,
    multiscale_lpips,
)
from e4s2024_tpu.models.arcface import ArcFaceBackbone
from e4s2024_tpu.models.lpips import LPIPS
from e4s2024_tpu.models.parser_unet import ParsingUNet
from e4s2024_tpu.ops.pool import adaptive_avg_pool2d


@dataclass
class ReconCriterion:
    """loss_params may hold "lpips" / "arcface" / "parser" params; missing
    entries disable the corresponding term."""

    loss_params: dict
    lpips_lambda: float = 0.8
    id_lambda: float = 0.1
    face_parsing_lambda: float = 0.1
    l2_lambda: float = 1.0

    def __post_init__(self):
        self.lpips = LPIPS() if "lpips" in self.loss_params else None
        self.arcface = ArcFaceBackbone() if "arcface" in self.loss_params else None
        self.parser = ParsingUNet() if "parser" in self.loss_params else None

    def __call__(self, recon: jnp.ndarray, img: jnp.ndarray):
        """recon/img: (B, S, S, 3) in [-1, 1]. Returns (loss, metrics)."""
        loss = 0.0
        metrics = {}
        if self.l2_lambda > 0:
            l2 = jnp.mean(jnp.square(recon - img))
            loss += self.l2_lambda * l2
            metrics["loss_l2"] = l2
        if self.lpips_lambda > 0 and self.lpips is not None:
            lp = multiscale_lpips(
                lambda a, b: self.lpips.apply(
                    {"params": self.loss_params["lpips"]}, a, b),
                recon, img)
            loss += self.lpips_lambda * lp
            metrics["loss_lpips"] = lp
        if self.id_lambda > 0 and self.arcface is not None:
            feats = lambda x: self.arcface.apply(
                {"params": self.loss_params["arcface"]}, id_loss_crop(x),
                multi_scale=True)
            idl = feature_cosine_loss(feats(recon), feats(img))
            loss += self.id_lambda * idl
            metrics["loss_id"] = idl
        if self.face_parsing_lambda > 0 and self.parser is not None:
            pool = (lambda x: adaptive_avg_pool2d(x, (512, 512))
                    if x.shape[1] != 512 else x)
            pfeats = lambda x: self.parser.apply(
                {"params": self.loss_params["parser"]}, pool(x),
                method=ParsingUNet.extract_feats)
            fpl = feature_cosine_loss(pfeats(recon), pfeats(img))
            loss += self.face_parsing_lambda * fpl
            metrics["loss_face_parsing"] = fpl
        metrics["loss"] = loss
        return loss, metrics
