"""Interactive apps: web UI (gradio) + CLI drivers.

Counterparts of the reference's UX layer (SURVEY.md §2.9):
- `build_gradio_app` ~ gradio_swap.py:116-166 (Image swap tab + Video swap tab
  with PTI sliders). gradio is not baked into this image, so the import is
  gated — the function raises a clear error when gradio is unavailable.
- `recon_cli` ~ img_recon.py / test.py: reconstruction grids over a dataset.
- The PyQt mask-painting UI's operations (reference run_UI.py:35) are exposed
  as library calls on e4s2024_tpu.pipelines.editor.Editor (invert /
  generate_from_label / component edits), which the web UI builds on.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

# 12-class label names (reference datasets/dataset.py:30)
SEG12_NAMES = ["background", "lip", "eyebrows", "eyes", "hair", "nose",
               "skin", "ears", "belowface", "mouth", "eye_glass", "ear_rings"]


def editor_parse(swapper, img255: np.ndarray) -> np.ndarray:
    """Full-image parse -> 12-class label map at the parser's 512^2 grid
    (the mask the UI edits; reference run_UI.py loads it the same way)."""
    import jax.numpy as jnp

    lbl = swapper._parse12(jnp.asarray(img255[None], jnp.float32) / 255.0)
    return np.asarray(lbl[0]).astype(np.int32)


def editor_apply_stroke(label_map: np.ndarray, stroke_mask: np.ndarray,
                        class_idx: int) -> np.ndarray:
    """Assign every painted pixel to `class_idx` — one brush stroke of the
    reference's mask-painting UI (reference ui_run/mouse_event.py)."""
    out = np.asarray(label_map).copy()
    stroke = np.asarray(stroke_mask)
    if stroke.shape[:2] != out.shape[:2]:
        import jax.numpy as jnp

        from e4s2024_tpu.ops.resize import resize_nearest
        stroke = np.asarray(resize_nearest(
            jnp.asarray(stroke[None, ..., None], jnp.float32),
            out.shape[:2])[0, ..., 0])
    out[stroke > 0.5] = int(class_idx)
    return out


def editor_resynthesize(swapper, img255: np.ndarray,
                        edited_label: np.ndarray) -> np.ndarray:
    """Invert the image with its ORIGINAL mask, re-synthesize with the edited
    mask — the run_UI.py re-render loop (reference run_UI.py:35+,
    SURVEY.md §3.5)."""
    import jax
    import jax.numpy as jnp

    from e4s2024_tpu.pipelines.editor import Editor

    ed = Editor(swapper.rgi_variables, net=swapper.rgi)
    orig = editor_parse(swapper, img255)
    img_pm1 = jnp.asarray(img255[None], jnp.float32) / 127.5 - 1.0
    sv = ed.invert(img_pm1, jnp.asarray(orig[None]))
    out = ed.generate_from_label(sv, jnp.asarray(edited_label[None]),
                                 regional_mode=swapper.cfg.regional_mode)
    return np.asarray(jnp.clip((out[0] + 1.0) * 127.5, 0, 255)).astype(np.uint8)


def build_gradio_app(swapper, video_pipeline=None, full_pipeline=None):
    """Gradio Blocks app: image swap + video swap with PTI controls.

    `full_pipeline` (FullFaceSwapPipeline) upgrades the image tab to the
    zoo-enhanced path (enhance/recolor/inpaint), as in the reference gradio
    (gradio_swap.py:36 -> FaceSwap.face_swap_pipeline); either way raw
    uploads are detected/aligned in-framework and pasted back."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this environment; use the library "
            "APIs (FaceSwapper / FaceSwapVideoPipeline) or the CLI instead"
        ) from e

    def swap_image(source, target, aligned, all_faces=False):
        src = np.asarray(source)
        tgt = np.asarray(target)
        if all_faces:
            # source identity onto every detected target face (swap_all);
            # per the checkbox label this wins over the pre-aligned flag —
            # multi-face requires detection on the raw target frame
            if full_pipeline is not None:
                return full_pipeline.swap_raw_multi(src, tgt)
            return swapper.swap_all(src, tgt)
        if aligned:
            # pre-aligned crops: skip detection entirely (works without
            # detector weights; the original image-tab behavior)
            s = swapper.cfg.out_size
            src = np.asarray(Image.fromarray(src.astype(np.uint8))
                             .resize((s, s))) if src.shape[:2] != (s, s) else src
            tgt = np.asarray(Image.fromarray(tgt.astype(np.uint8))
                             .resize((s, s))) if tgt.shape[:2] != (s, s) else tgt
            if full_pipeline is not None:
                return full_pipeline.swap_batch(src[None], tgt[None])[0]
            out = swapper.swap_aligned(src[None].astype(np.float32),
                                       tgt[None].astype(np.float32))
            return np.asarray(out["image"][0]).astype(np.uint8)
        if full_pipeline is not None:
            return full_pipeline.swap_raw(src, tgt)
        return swapper.swap(src, tgt)

    def swap_video(source, video, pti_steps, pti_lr, recolor_lambda):
        from e4s2024_tpu.video_io import extract_frames, write_video

        frames, fps = extract_frames(video)
        video_pipeline.cfg.pti.max_pti_steps = int(pti_steps)
        video_pipeline.cfg.pti.learning_rate = float(pti_lr)
        video_pipeline.cfg.pti.recolor_lambda = float(recolor_lambda)
        outs = video_pipeline(np.asarray(source), frames)
        out_path = os.path.join("/tmp", "swapped.mp4")
        return write_video(outs, out_path, fps, audio_from=video)

    with gr.Blocks(title="e4s2024-tpu face swap") as app:
        with gr.Tab("Image swap"):
            with gr.Row():
                src = gr.Image(label="source")
                tgt = gr.Image(label="target")
            aligned = gr.Checkbox(
                value=False, label="inputs are pre-aligned crops "
                "(skip detection)")
            all_faces = gr.Checkbox(
                value=False, label="swap ALL detected faces in the target "
                "(multi-face; ignores the pre-aligned flag)")
            out = gr.Image(label="swapped")
            gr.Button("Swap").click(swap_image,
                                    [src, tgt, aligned, all_faces], out)
        if video_pipeline is not None:
            with gr.Tab("Video swap"):
                vsrc = gr.Image(label="source")
                vid = gr.Video(label="target video")
                steps = gr.Slider(0, 200, value=80, label="PTI steps")
                lr = gr.Number(value=1e-3, label="PTI lr")
                rl = gr.Number(value=5.0, label="recolor lambda")
                vout = gr.Video(label="result")
                gr.Button("Swap video").click(
                    swap_video, [vsrc, vid, steps, lr, rl], vout)
        with gr.Tab("Mask editing"):
            # interactive mask-painting editor (reference run_UI.py / ui_run/):
            # parse -> paint strokes per class -> re-synthesize
            from e4s2024_tpu.utils.image import colorize_label_map

            est = gr.State(value=None)   # current label map
            eimg = gr.State(value=None)  # current image
            with gr.Row():
                ein = gr.Image(label="image")
                emask = gr.Image(label="label map (12-class)")
            cls = gr.Dropdown(choices=[f"{i}: {n}" for i, n in
                                       enumerate(SEG12_NAMES)],
                              value="6: skin", label="brush class")
            brush = gr.ImageEditor(label="paint the stroke (white = brush)")
            eout = gr.Image(label="re-synthesized")

            def do_parse(img):
                lbl = editor_parse(swapper, np.asarray(img, np.float32))
                return lbl, np.asarray(img), colorize_label_map(lbl, 12)

            def do_stroke(lbl, sketch, cls_choice):
                if lbl is None or sketch is None:
                    return lbl, None
                layer = sketch["layers"][0] if isinstance(sketch, dict) else sketch
                stroke = np.asarray(layer)[..., :3].mean(-1) > 127
                lbl = editor_apply_stroke(lbl, stroke,
                                          int(str(cls_choice).split(":")[0]))
                return lbl, colorize_label_map(lbl, 12)

            def do_render(img, lbl):
                if img is None or lbl is None:
                    return None
                return editor_resynthesize(swapper, img, lbl)

            gr.Button("Parse").click(do_parse, [ein], [est, eimg, emask])
            gr.Button("Apply stroke").click(do_stroke, [est, brush, cls],
                                            [est, emask])
            gr.Button("Re-synthesize").click(do_render, [eimg, est], eout)
    return app


def recon_cli(swapper, dataset, out_dir: str, limit: int = 100):
    """Reconstruction eval driver (reference img_recon.py / test.py): invert
    and re-synthesize each test image, save side-by-side grids, report
    SSIM/PSNR/RMSE."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from e4s2024_tpu.metrics import reconstruction_metrics
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.utils.image import from_pm1, vis_faces_grid

    os.makedirs(out_dir, exist_ok=True)
    recons, gts = [], []
    for i in range(min(limit, len(dataset))):
        img, lbl = dataset[i]
        onehot = jax.nn.one_hot(jnp.asarray(lbl)[None], swapper.cfg.num_seg_cls)
        sv = swapper._invert_jit(jnp.asarray(img)[None], onehot)
        codes = swapper.rgi.apply(swapper.rgi_variables, sv,
                                  method=RGINet.cal_style_codes)
        recon, _, _ = swapper.rgi.apply(
            swapper.rgi_variables, None, codes, onehot, method=RGINet.gen_img,
            regional_mode=swapper.cfg.regional_mode)
        r = from_pm1(np.asarray(recon[0]))
        g = from_pm1(img)
        recons.append(r)
        gts.append(g)
        Image.fromarray(vis_faces_grid([[g, r]])).save(
            os.path.join(out_dir, f"{i:05d}_recon.png"))
    metrics = reconstruction_metrics(np.stack(recons), np.stack(gts))
    with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
        f.write(str(metrics))
    return metrics
