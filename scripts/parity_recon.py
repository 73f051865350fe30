"""Reconstruction-parity harness vs reference checkpoints.

Given the reference's released weights (E4S `iteration_300000.pt` +
BiSeNet `79999_iter.pth`), converts them with the torch->JAX name maps,
inverts+reconstructs each test image through the RGI net, and reports
SSIM/PSNR/RMSE — the reference's recon protocol
(reference metric/metric_utils.py:22-67, img_recon.py) — plus, when a
directory of reference-side recon outputs is supplied, direct PSNR between
this framework's recon and the reference's recon of the SAME image (the
near-pixel-parity check from BASELINE.md).

Usage:
  python scripts/parity_recon.py \
      --e4s_ckpt pretrained/iteration_300000.pt \
      --bisenet_ckpt pretrained/79999_iter.pth \
      --images dir_of_test_pngs/ [--ref_recons dir_of_reference_recons/] \
      [--out_dir /tmp/parity] [--limit 100] [--size 1024]

No released checkpoints ship in this image; the harness is exercised by
tests with random weights and is the entry point to run the moment real
weights are mounted.
"""

from __future__ import annotations

import argparse
import json
import os


def load_rgi_from_reference(e4s_ckpt: str):
    """iteration_300000.pt -> RGINet variables (reference coach.py:88-103
    layout: {state_dict, latent_avg, opts, ...}; convert_rgi picks up
    latent_avg from the checkpoint extras)."""
    from e4s2024_tpu.convert import convert_rgi
    from e4s2024_tpu.convert.torch_loader import load_torch_checkpoint

    return convert_rgi(load_torch_checkpoint(e4s_ckpt))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--e4s_ckpt", required=True)
    ap.add_argument("--bisenet_ckpt", required=True)
    ap.add_argument("--images", required=True,
                    help="directory of aligned test images")
    ap.add_argument("--ref_recons", default=None,
                    help="reference-side recon outputs (same filenames)")
    ap.add_argument("--out_dir", default="/tmp/parity_recon")
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args(argv)

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from e4s2024_tpu.convert import convert_bisenet
    from e4s2024_tpu.convert.torch_loader import load_torch_checkpoint
    from e4s2024_tpu.metrics import reconstruction_metrics, psnr
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig

    variables = load_rgi_from_reference(args.e4s_ckpt)
    bise = convert_bisenet(load_torch_checkpoint(args.bisenet_ckpt))
    cfg = SwapConfig(out_size=args.size, jit_mode="staged")
    sw = FaceSwapper(variables, bise, cfg)

    from e4s2024_tpu.data.datasets import list_images

    paths = sorted(list_images(args.images))[: args.limit]
    os.makedirs(args.out_dir, exist_ok=True)
    recons, gts, ref_psnrs = [], [], []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB").resize(
            (args.size, args.size), Image.BILINEAR), np.float32)
        lbl = sw._parse_jit(jnp.asarray(img[None]) / 255.0)
        onehot = jax.nn.one_hot(lbl, cfg.num_seg_cls)
        sv = sw._invert_jit(jnp.asarray(img[None]) / 127.5 - 1.0, onehot)
        codes = sw.rgi.apply(sw.rgi_variables, sv, method=RGINet.cal_style_codes)
        recon, _, _ = sw.rgi.apply(sw.rgi_variables, None, codes, onehot,
                                   method=RGINet.gen_img)
        r255 = np.asarray(jnp.clip((recon[0] + 1.0) * 127.5, 0, 255))
        recons.append(r255)
        gts.append(img)
        name = os.path.basename(p)
        Image.fromarray(r255.astype(np.uint8)).save(
            os.path.join(args.out_dir, name))
        if args.ref_recons:
            rp = os.path.join(args.ref_recons, name)
            if os.path.exists(rp):
                ref = np.asarray(Image.open(rp).convert("RGB"), np.float32)
                ref_psnrs.append(float(np.asarray(psnr(
                    jnp.asarray(ref[None]), jnp.asarray(r255[None]),
                    data_range=255.0))[0]))

    out = reconstruction_metrics(np.stack(recons), np.stack(gts))
    if ref_psnrs:
        out["psnr_vs_reference_recons"] = float(np.mean(ref_psnrs))
        out["n_reference_matched"] = len(ref_psnrs)
    out["n_images"] = len(paths)
    print(json.dumps(out))
    with open(os.path.join(args.out_dir, "parity.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
