"""End-to-end CLI test: orbax checkpoints -> swap_cli -> output image."""

import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from e4s2024_tpu.models.bisenet import BiSeNet
from e4s2024_tpu.models.rgi import RGINet
from e4s2024_tpu.swap_cli import main
from e4s2024_tpu.utils.checkpoint import save_pytree


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpts")
    rgi = RGINet(out_size=128, remaining_layer_idx=9)
    variables = rgi.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                         jnp.zeros((1, 128, 128, 12)))
    save_pytree(d / "rgi", variables)
    bise = BiSeNet().init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 512, 512, 3)))["params"]
    save_pytree(d / "bisenet", bise)
    return d


def test_cli_aligned_swap(tmp_path, ckpts, rng):
    src = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    tgt = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    Image.fromarray(src).save(tmp_path / "s.png")
    Image.fromarray(tgt).save(tmp_path / "t.png")

    main(["--source", str(tmp_path / "s.png"),
          "--target", str(tmp_path / "t.png"),
          "--out", str(tmp_path / "o.png"),
          "--rgi", str(ckpts / "rgi"),
          "--bisenet", str(ckpts / "bisenet"),
          "--size", "128", "--remaining_layer_idx", "9",
          "--compute_dtype", "float32", "--aligned"])

    out = np.asarray(Image.open(tmp_path / "o.png"))
    assert out.shape == (128, 128, 3)
    assert out.dtype == np.uint8


def test_cli_unaligned_uses_default_detector(tmp_path, ckpts, rng):
    """Without --landmarks-json the CLI falls back to the in-framework
    RetinaFace+FAN stack (random weights in tests -> runnable end-to-end,
    landmarks meaningless), so unaligned inputs swap hookless."""
    img = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "s.png")
    Image.fromarray(img).save(tmp_path / "t.png")
    main(["--source", str(tmp_path / "s.png"),
          "--target", str(tmp_path / "t.png"),
          "--out", str(tmp_path / "o.png"),
          "--rgi", str(ckpts / "rgi"),
          "--bisenet", str(ckpts / "bisenet"),
          "--size", "128", "--remaining_layer_idx", "9"])
    out = np.asarray(Image.open(tmp_path / "o.png"))
    assert out.shape == (160, 160, 3)


def test_cli_landmarks_json(tmp_path, ckpts, rng):
    img = (rng.random((160, 160, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "s.png")
    Image.fromarray(img).save(tmp_path / "t.png")
    lm = np.zeros((68, 2))
    lm[36:42] = [56, 64]
    lm[42:48] = [104, 64]
    lm[48] = [64, 112]
    lm[54] = [96, 112]
    import os
    table = {os.path.abspath(str(tmp_path / "s.png")): lm.tolist(),
             os.path.abspath(str(tmp_path / "t.png")): lm.tolist()}
    (tmp_path / "lm.json").write_text(json.dumps(table))

    main(["--source", str(tmp_path / "s.png"),
          "--target", str(tmp_path / "t.png"),
          "--out", str(tmp_path / "o.png"),
          "--rgi", str(ckpts / "rgi"),
          "--bisenet", str(ckpts / "bisenet"),
          "--size", "128", "--remaining_layer_idx", "9",
          "--compute_dtype", "float32",
          "--landmarks-json", str(tmp_path / "lm.json")])
    out = np.asarray(Image.open(tmp_path / "o.png"))
    assert out.shape == (160, 160, 3)
