"""Model-zoo checkpoint IO: one save/load pair for every params pytree.

The reference distributes ~10 separate torch .pth files (pretrained_ckpts/ in
its README) and each pipeline hand-rolls its own torch.load calls. Here every
model family (RGI, BiSeNet, GPEN, Blender, CodeFormer, SwinIR, GFPGAN,
faceVid2Vid, ...) stores its params/variables pytree through the same orbax
interface, so a "model dir" is a set of named orbax checkpoints plus the
on-disk layout stays introspectable.

Use `e4s2024_tpu.convert.torch_loader` to produce the pytrees from the
reference's torch checkpoints once, then `save_zoo` them; pipelines restore
with `load_zoo` / `load_pytree`.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_pytree(path: str, tree) -> None:
    """Save one params/variables pytree as an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abspath(path), jax.tree_util.tree_map(np.asarray, tree),
               force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like=None):
    """Restore a pytree; `like` (a template tree) restores exact structure
    and dtypes — without it, orbax returns the raw stored tree."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_abspath(path), like)


def save_zoo(root: str, zoo: dict) -> None:
    """Save {"rgi": variables, "bisenet": params, ...} under root/<name>."""
    for name, tree in zoo.items():
        save_pytree(os.path.join(root, name), tree)


def load_zoo(root: str, like: dict | None = None) -> dict:
    """Load every checkpoint directory under `root` into a dict.

    `like` supplies per-name template trees (missing names load raw)."""
    root = _abspath(root)
    out = {}
    for name in sorted(os.listdir(root)):
        sub = os.path.join(root, name)
        if os.path.isdir(sub):
            out[name] = load_pytree(sub, (like or {}).get(name))
    return out
