"""Video-swap throughput on the real chip: frames/sec through the device
stages (parse -> invert -> mask merge/mix -> synth+composite -> paste-back),
random weights, PTI off, landmarks faked (host landmarking is pluggable and
not a device cost).

Usage: python scripts/profile_video.py [--frames 32] [--dtype bfloat16]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frame_hw", type=int, default=720)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from e4s2024_tpu.models.bisenet import BiSeNet
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig
    from e4s2024_tpu.pipelines.video import FaceSwapVideoPipeline, VideoSwapConfig
    from e4s2024_tpu.training.pti import PTIConfig

    size = args.size
    rng = np.random.default_rng(0)
    cfg = SwapConfig(out_size=size, remaining_layer_idx=13,
                     regional_mode="fast", num_blend_levels=8,
                     compute_dtype=args.dtype)
    rgi = RGINet(out_size=size, remaining_layer_idx=13)
    rgi_vars = jax.jit(rgi.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, size, size, 3)),
                                 jnp.zeros((1, size, size, 12)))
    bise = jax.jit(BiSeNet().init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 512, 512, 3)))["params"]

    def fake_landmarks(img):
        h, w = img.shape[:2]
        lm = np.zeros((68, 2))
        lm[36:42] = [w * 0.35, h * 0.4]
        lm[42:48] = [w * 0.65, h * 0.4]
        lm[48] = [w * 0.4, h * 0.7]
        lm[54] = [w * 0.6, h * 0.7]
        return lm

    swapper = FaceSwapper(rgi_vars, bise, cfg, landmark_fn=fake_landmarks)
    pipe = FaceSwapVideoPipeline(
        swapper,
        VideoSwapConfig(swap=cfg, pti=PTIConfig(max_pti_steps=0),
                        run_pti=False, run_stitching=False),
    )

    f = args.frame_hw
    source = (rng.random((f, f, 3)) * 255).astype(np.uint8)
    frames = [(rng.random((f, f, 3)) * 255).astype(np.uint8)
              for _ in range(args.frames)]

    # warmup compile pass on a short clip
    for attempt in range(4):
        try:
            pipe(source, frames[:2])
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 3:
                raise
            print("warmup retry:", type(e).__name__)
            time.sleep(10)

    t0 = time.perf_counter()
    outs = pipe(source, frames)
    _ = outs[-1][0, 0, 0]  # host arrays already
    dt = time.perf_counter() - t0
    print(f"video e2e (no PTI): {len(frames)} frames in {dt:.2f}s "
          f"-> {len(frames) / dt:.1f} FPS @ {size}px crops, "
          f"{f}x{f} frames")


if __name__ == "__main__":
    main()
