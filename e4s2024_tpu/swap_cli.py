"""Command-line face swap — the reference's `Face_swap_with_two_imgs.py`
main driver (:966) as a CLI.

Checkpoints load either from torch files (converted on the fly via
e4s2024_tpu.convert) or from orbax directories saved with
`utils.checkpoint.save_zoo`. Landmark detection defaults to the
in-framework RetinaFace+FAN stack (weights from $E4S_WEIGHTS or
--weights-dir); `--landmarks-json` overrides with precomputed 68-point
landmarks, and `--aligned` skips detection for FFHQ-aligned crops.

Usage:
  python -m e4s2024_tpu.swap_cli --source s.png --target t.png --out o.png \
      --rgi rgi_ckpt --bisenet bisenet_ckpt [--aligned] [--size 1024]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_params(path: str, kind: str):
    """torch .pt/.pth file -> converted pytree; directory -> orbax tree."""
    if os.path.isdir(path):
        from e4s2024_tpu.utils.checkpoint import load_pytree

        return load_pytree(path)
    from e4s2024_tpu.convert.torch_loader import (
        convert_bisenet,
        convert_rgi,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path)
    return {"rgi": convert_rgi, "bisenet": convert_bisenet}[kind](sd)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="identity image")
    ap.add_argument("--target", required=True, help="attribute/pose image")
    ap.add_argument("--out", required=True, help="output image path")
    ap.add_argument("--rgi", required=True,
                    help="RGI checkpoint (torch file or orbax dir)")
    ap.add_argument("--bisenet", required=True,
                    help="BiSeNet checkpoint (torch file or orbax dir)")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--remaining_layer_idx", type=int, default=13)
    ap.add_argument("--regional_mode", default="fast",
                    choices=("fast", "exact"))
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--aligned", action="store_true",
                    help="inputs are already aligned crops (skip warping)")
    ap.add_argument("--landmarks-json", default=None,
                    help="json {path: [[x, y] * 68]} of precomputed "
                         "landmarks for unaligned inputs (overrides the "
                         "in-framework detector)")
    ap.add_argument("--weights-dir", default=None,
                    help="dir holding RetinaFace-mobile0.25.pth / 2DFAN4.pth "
                         "for the default detector (else $E4S_WEIGHTS)")
    args = ap.parse_args(argv)

    from PIL import Image

    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig

    rgi_vars = load_params(args.rgi, "rgi")
    if "params" not in rgi_vars:
        rgi_vars = {"params": rgi_vars}
    bise = load_params(args.bisenet, "bisenet")
    if "params" in bise:
        bise = bise["params"]

    landmark_fn = None
    if args.landmarks_json:
        with open(args.landmarks_json) as f:
            table = {os.path.abspath(k): np.asarray(v, np.float64)
                     for k, v in json.load(f).items()}
        paths = iter([os.path.abspath(args.source),
                      os.path.abspath(args.target)])

        def landmark_fn(_img):  # noqa: ANN001
            return table[next(paths)]

    cfg = SwapConfig(out_size=args.size,
                     remaining_layer_idx=args.remaining_layer_idx,
                     regional_mode=args.regional_mode,
                     compute_dtype=args.compute_dtype)
    swapper = FaceSwapper(rgi_vars, bise, cfg, landmark_fn=landmark_fn)

    src = np.asarray(Image.open(args.source).convert("RGB"))
    tgt = np.asarray(Image.open(args.target).convert("RGB"))

    if args.aligned:
        s = args.size
        if src.shape[:2] != (s, s):
            src = np.asarray(Image.fromarray(src).resize((s, s)))
        if tgt.shape[:2] != (s, s):
            tgt = np.asarray(Image.fromarray(tgt).resize((s, s)))
        result = swapper.swap_aligned(src[None], tgt[None])
        out = np.asarray(result["image"][0])
    else:
        if landmark_fn is None and args.weights_dir:
            from e4s2024_tpu.pipelines.detect import default_landmarker

            swapper.landmark_fn = default_landmarker(args.weights_dir)
        # otherwise FaceSwapper.swap falls back to the in-framework
        # detector with $E4S_WEIGHTS (random weights + a warning if unset)
        out = swapper.swap(src, tgt)

    Image.fromarray(out).save(args.out)
    print(f"wrote {args.out} ({out.shape[1]}x{out.shape[0]})")


if __name__ == "__main__":
    main()
