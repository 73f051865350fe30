"""Research drivers: comparison figures, mouth transfer, interpolation strips.

Library + CLI form of the reference's figure-generation scripts
(reference swap_face_comp_figs.py, comp_images.py, Face_swap_frontal.py) —
the drivers that batch-swap CelebA-HQ pairs from an index file and compose
side-by-side comparison figures for the paper. The reference hard-codes
internal-cluster paths and re-implements the pipeline inline
(swap_face_comp_figs.py:207-599); here the drivers reuse the library
pipelines and take paths as arguments.

- `load_pair_index`: the "src tgt" index-file format
  (reference comp_images.py:10-20, one header line then pairs).
- `comparison_grid`: horizontal figure strip (source | target | swap ...)
  (reference comp_images.py:57-77 composes them with PIL paste).
- `mouth_transfer`: mask-gated mouth-region transfer with multi-band seam
  blending (reference swap_face_comp_figs.py:131-145).
- `interpolation_strip`: latent interpolation figure between two faces
  (reference swap_face_comp_figs.py:599-672 `interpolation`).
- `run_comp_figs`: batch pair swapping -> grids on disk.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from e4s2024_tpu.ops.blend import laplacian_pyramid_blend
from e4s2024_tpu.ops.morphology import dilation, erosion


def load_pair_index(path: str) -> list[tuple[str, str]]:
    """Parse a pair index file: one header line, then `src tgt` per line
    (reference comp_images.py:10-20)."""
    with open(path) as f:
        lines = [l.strip().split() for l in f.readlines()[1:] if l.strip()]
    return [(l[0], l[1]) for l in lines]


def comparison_grid(images: list[np.ndarray], pad: int = 4,
                    pad_value: int = 255) -> np.ndarray:
    """Horizontal strip of equal-height images with white gutters — the
    comparison-figure layout (reference comp_images.py:57-77)."""
    h = max(im.shape[0] for im in images)
    cols = []
    for im in images:
        im = np.asarray(im)
        if im.ndim == 2:
            im = np.repeat(im[..., None], 3, axis=-1)
        if im.shape[0] != h:  # upscale smaller panels to the strip height
            from e4s2024_tpu.ops.resize import resize_bilinear

            w = int(round(im.shape[1] * h / im.shape[0]))
            im = np.asarray(resize_bilinear(
                jnp.asarray(im, jnp.float32)[None], (h, w))[0])
        cols.append(np.clip(im, 0, 255).astype(np.uint8))
        cols.append(np.full((h, pad, 3), pad_value, np.uint8))
    return np.concatenate(cols[:-1], axis=1)


def expansion_seam(mask: jnp.ndarray, radius: int = 5) -> jnp.ndarray:
    """Boundary band expanding to both sides of a mask's edge: dilation
    minus erosion (reference swap_face_comp_figs.py:57-74, 'expansion')."""
    m = jnp.asarray(mask, jnp.float32)
    size = 2 * radius + 1
    return jnp.clip(dilation(m, size) - erosion(m, size), 0.0, 1.0)


def mouth_transfer(source255, target255, mouth_mask,
                   seam_radius: int = 5, num_levels: int = 8):
    """Paste `source`'s mouth region onto `target` along a multi-band-blended
    seam (reference swap_face_comp_figs.py:131-145: hard mask composite, then
    `blending` over the expansion seam).

    source255/target255: (H, W, 3) [0, 255]; mouth_mask: (H, W) {0, 1} (the
    mouth classes of a seg12 map: inner mouth 7 + lips 8/9 per
    data/labels.py). Returns (combined, mouth_mask, seam_mask)."""
    s = jnp.asarray(source255, jnp.float32)
    t = jnp.asarray(target255, jnp.float32)
    m = (jnp.asarray(mouth_mask, jnp.float32) > 0).astype(jnp.float32)
    if m.shape != s.shape[:2]:
        from e4s2024_tpu.ops.resize import resize_bilinear

        m = resize_bilinear(m[None, ..., None], s.shape[:2])[0, ..., 0]
        m = (m > 0).astype(jnp.float32)
    seam = expansion_seam(m[None, ..., None], seam_radius)[0, ..., 0]
    combined = s * m[..., None] + t * (1.0 - m[..., None])
    h, w = s.shape[0], s.shape[1]
    while num_levels > 1 and (h % 2 ** (num_levels - 1)
                              or w % 2 ** (num_levels - 1)):
        num_levels -= 1  # pyramid depth capped by the spatial divisibility
    # seam band takes the SOURCE's bands over the hard composite (reference
    # blending(source, combined, seam): A*mask + B*(1-mask) per band)
    blended = laplacian_pyramid_blend(
        s[None], combined[None], seam[None, ..., None],
        num_levels=num_levels)[0]
    out = jnp.clip(blended, 0, 255)
    return (np.asarray(out).astype(np.uint8),
            np.asarray(m * 255).astype(np.uint8),
            np.asarray(seam * 255).astype(np.uint8))


def interpolation_strip(editor, img_a255: np.ndarray, img_b255: np.ndarray,
                        label_a: np.ndarray, label_b: np.ndarray,
                        steps: int = 5, components=None) -> np.ndarray:
    """Figure strip interpolating A's style toward B's on A's geometry
    (reference swap_face_comp_figs.py:599-672). `editor` is a
    pipelines.editor.Editor; labels are (H, W) seg12 maps."""
    from e4s2024_tpu.utils.image import from_pm1, to_pm1

    sv_a = editor.invert(to_pm1(jnp.asarray(img_a255, jnp.float32))[None],
                         jnp.asarray(label_a)[None])
    sv_b = editor.invert(to_pm1(jnp.asarray(img_b255, jnp.float32))[None],
                         jnp.asarray(label_b)[None])
    panels = [np.asarray(img_a255, np.uint8)]
    for i in range(steps):
        t = (i + 1) / (steps + 1)
        sv = editor.interpolate_styles(sv_a, sv_b, t, components=components)
        img = editor.generate_from_label(sv, jnp.asarray(label_a)[None])
        panels.append(from_pm1(np.asarray(img[0])))
    panels.append(np.asarray(img_b255, np.uint8))
    return comparison_grid(panels)


def run_comp_figs(swap_fn, pairs: list[tuple[str, str]], image_dirs,
                  out_dir: str, save_panels: bool = False) -> list[str]:
    """Batch pair swapping -> comparison grids (reference comp_images.py
    main loop; swap_face_comp_figs.py:207 `faceSwapping_pipeline` calls).

    `swap_fn(source_rgb_u8, target_rgb_u8) -> swapped_rgb_u8` — e.g.
    `FaceSwapper.swap` or a `FullFaceSwapPipeline` wrapper. `image_dirs` is
    searched in order for `<index>.jpg`/`.png` (the reference falls back from
    test to train split, comp_images.py:44-49)."""
    from PIL import Image

    if isinstance(image_dirs, str):
        image_dirs = [image_dirs]

    def find(idx: str) -> str:
        for d in image_dirs:
            for ext in (".jpg", ".png", ".jpeg", ""):
                p = os.path.join(d, idx + ext)
                if os.path.exists(p):
                    return p
        raise FileNotFoundError(f"{idx} not under {image_dirs}")

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for src_idx, tgt_idx in pairs:
        src = np.asarray(Image.open(find(src_idx)).convert("RGB"))
        tgt = np.asarray(Image.open(find(tgt_idx)).convert("RGB"))
        out = np.asarray(swap_fn(src, tgt))
        grid = comparison_grid([src, tgt, out])
        path = os.path.join(out_dir, f"{src_idx}_to_{tgt_idx}.png")
        Image.fromarray(grid).save(path)
        if save_panels:
            Image.fromarray(out).save(
                os.path.join(out_dir, f"{src_idx}_to_{tgt_idx}_swap.png"))
        written.append(path)
    return written


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Batch comparison figures from a pair index file "
                    "(reference comp_images.py / swap_face_comp_figs.py)")
    ap.add_argument("--pairs", required=True, help="index file: header + "
                    "'src tgt' lines")
    ap.add_argument("--image-dirs", required=True, nargs="+")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--rgi", required=True)
    ap.add_argument("--bisenet", required=True)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--aligned", action="store_true")
    args = ap.parse_args(argv)

    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig
    from e4s2024_tpu.swap_cli import load_params

    rgi_vars = load_params(args.rgi, "rgi")
    if "params" not in rgi_vars:
        rgi_vars = {"params": rgi_vars}
    bise = load_params(args.bisenet, "bisenet")
    bise = bise.get("params", bise)
    swapper = FaceSwapper(rgi_vars, bise, SwapConfig(out_size=args.size))
    if args.aligned:
        def swap_fn(s, t):
            r = swapper.swap_aligned(s[None], t[None])
            return np.asarray(r["image"][0])
    else:
        swap_fn = swapper.swap
    pairs = load_pair_index(args.pairs)
    for p in run_comp_figs(swap_fn, pairs, args.image_dirs, args.out_dir):
        print(p)


if __name__ == "__main__":
    main()
