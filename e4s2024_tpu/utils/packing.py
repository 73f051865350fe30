"""Pytree packing: flatten a params tree into ONE buffer per dtype.

On tunneled/remote device transports every jit argument handle costs ~10 us
per call (measured: a 512-leaf tree adds ~6 ms to a trivial program's call
overhead, independent of byte size). Model pytrees have hundreds of leaves,
so inference hot paths pass a PACKED form — one 1-D buffer per dtype — and
slice the leaves back out INSIDE the program (static offsets; XLA fuses the
slices into their consumers).

pack_pytree runs once per weight update; unpack_pytree is traced.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def pack_pytree(tree):
    """tree -> ({dtype_name: 1-D buffer}, meta). Leaves keep dtype/shape."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups: dict[str, list[int]] = {}
    for i, leaf in enumerate(leaves):
        groups.setdefault(str(jnp.asarray(leaf).dtype), []).append(i)
    buffers = {}
    meta_groups = {}
    for dt, idxs in groups.items():
        parts, metas, offset = [], [], 0
        for i in idxs:
            leaf = jnp.asarray(leaves[i])
            n = int(leaf.size)
            metas.append((i, offset, tuple(leaf.shape)))
            parts.append(leaf.reshape(-1))
            offset += n
        buffers[dt] = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        meta_groups[dt] = metas
    return buffers, (treedef, meta_groups, len(leaves))


def unpack_pytree(buffers, meta):
    """Inverse of pack_pytree; traceable (static offsets/shapes)."""
    treedef, meta_groups, n = meta
    leaves = [None] * n
    for dt, metas in meta_groups.items():
        buf = buffers[dt]
        for i, off, shape in metas:
            size = int(np.prod(shape)) if shape else 1
            leaves[i] = jax.lax.slice(buf, (off,), (off + size,)).reshape(shape)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class BoundJit:
    """Callable that binds leading args (e.g. packed weight buffers) to a
    jitted fn while exposing `.jitted` / `.bound_args`, so cost analysis
    (utils/mfu.program_cost) can lower the UNDERLYING program with the
    weights as arguments. Re-jitting the bound closure would bake the packed
    buffers into the HLO as literal constants — a hundreds-of-MB program
    payload on remote-compile transports.

    `get_bound` is called per use so rebindable state (FaceSwapper repacks
    on weight assignment) stays live."""

    def __init__(self, jfn, get_bound):
        self.jitted = jfn
        self._get_bound = get_bound

    @property
    def bound_args(self):
        b = self._get_bound()
        return b if isinstance(b, tuple) else (b,)

    def __call__(self, *a, **kw):
        return self.jitted(*self.bound_args, *a, **kw)


def jit_with_packed_params(fn, params):
    """jax.jit(fn) with `params` packed once into per-dtype buffers.

    `fn(params, *args)` -> returned callable takes `(*args)`. Model wrappers
    use this so every call passes 1-3 buffer handles instead of a
    hundreds-of-leaves pytree (~10 us per leaf per call on tunneled
    transports).
    """
    packed, meta = pack_pytree(params)
    jfn = jax.jit(lambda pk, *a: fn(unpack_pytree(pk, meta), *a))
    call = lambda *a: jfn(packed, *a)
    # cost-analysis hooks (utils/mfu.program_cost): lower the UNDERLYING
    # jitted fn with the packed buffers as ARGUMENTS. Re-jitting the closure
    # would bake the weights into the HLO as literal constants — a
    # hundreds-of-MB program upload on remote-compile transports.
    call.jitted = jfn
    call.bound_args = (packed,)
    return call
