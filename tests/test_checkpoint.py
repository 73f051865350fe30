"""Round-trip tests for the zoo checkpoint IO (orbax-backed)."""

import numpy as np

import jax
import jax.numpy as jnp

from e4s2024_tpu.utils.checkpoint import (
    load_pytree,
    load_zoo,
    save_pytree,
    save_zoo,
)


def _tree(rng):
    return {
        "params": {
            "conv": {"kernel": rng.standard_normal((3, 3, 4, 8)).astype(
                np.float32)},
            "dense": {"kernel": rng.standard_normal((8, 2)).astype(
                np.float32), "bias": np.zeros(2, np.float32)},
        },
        "buffers": {"latent_avg": rng.standard_normal((18, 512)).astype(
            np.float32)},
    }


def test_pytree_roundtrip(tmp_path, rng):
    tree = _tree(rng)
    save_pytree(tmp_path / "m", tree)
    back = load_pytree(tmp_path / "m", jax.tree_util.tree_map(jnp.asarray,
                                                              tree))
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(tree)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_pytree_overwrite(tmp_path, rng):
    save_pytree(tmp_path / "m", {"w": np.ones(3, np.float32)})
    save_pytree(tmp_path / "m", {"w": np.full(3, 2.0, np.float32)})
    back = load_pytree(tmp_path / "m", {"w": jnp.zeros(3)})
    np.testing.assert_array_equal(np.asarray(back["w"]), 2.0)


def test_zoo_roundtrip(tmp_path, rng):
    zoo = {"rgi": _tree(rng), "bisenet": {"k": np.arange(5, dtype=np.float32)}}
    save_zoo(tmp_path / "zoo", zoo)
    like = {k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in zoo.items()}
    back = load_zoo(tmp_path / "zoo", like)
    assert sorted(back) == ["bisenet", "rgi"]
    np.testing.assert_array_equal(np.asarray(back["bisenet"]["k"]),
                                  zoo["bisenet"]["k"])
    np.testing.assert_array_equal(
        np.asarray(back["rgi"]["buffers"]["latent_avg"]),
        zoo["rgi"]["buffers"]["latent_avg"])
