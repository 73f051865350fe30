"""BASELINE.md measurement config 3: full image swap at 1024^2 with the zoo
active — parsing, regional inversion/synthesis, GPEN enhancement of the
driven crop, Blender 256^2 recolor + RealESRGAN x4 upscale, GCFSR
inpainting — random weights, real chip.

Writes BENCH_FULL_ZOO.json and prints one JSON line.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_full_zoo.py
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=4,
                    help="also measure the batched multi-pair fused path at "
                         "this batch; 0 disables")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from e4s2024_tpu.models.bisenet import BiSeNet
    from e4s2024_tpu.models.blender import Blender, BlenderRecolorer
    from e4s2024_tpu.models.gcfsr import FaceInpainting, FaceInpainter
    from e4s2024_tpu.models.gpen import GPENFullGenerator, GPENEnhancer
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.models.rrdb import RRDBNet, RealESRGANUpscaler
    from e4s2024_tpu.pipelines.full_swap import (
        FullFaceSwapPipeline, FullSwapConfig, SwapComponents)
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig

    size = args.size
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey

    cfg = SwapConfig(out_size=size, remaining_layer_idx=13,
                     regional_mode="fast", compute_dtype=args.dtype,
                     jit_mode="staged")
    rgi = RGINet(out_size=size, remaining_layer_idx=13)
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[
        np.zeros((1, size, size), int)])
    rgi_vars = jax.jit(rgi.init)(key(0), jnp.zeros((1, size, size, 3)), seg)
    bise = jax.jit(BiSeNet().init)(key(1),
                                   jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(rgi_vars, bise, cfg)

    gpen = GPENFullGenerator(size=512)
    gpen_p = jax.jit(gpen.init)(key(2), jnp.zeros((1, 512, 512, 3)))["params"]
    blender = Blender()
    blend_p = jax.jit(blender.init)(
        key(3), jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 256, 256, 3)),
        jnp.zeros((1, 256, 256), jnp.int32),
        jnp.zeros((1, 256, 256), jnp.int32))["params"]
    rrdb = RRDBNet()
    rrdb_p = jax.jit(rrdb.init)(key(4), jnp.zeros((1, 64, 64, 3)))["params"]
    gcfsr = FaceInpainting(out_size=256)
    gcfsr_p = jax.jit(gcfsr.init)(key(5), jnp.zeros((1, 256, 256, 4)),
                                  jnp.zeros((1, 1)))["params"]

    comps = SwapComponents(
        enhancers={"gpen": GPENEnhancer(gpen_p, 512, gpen).enhance_aligned},
        recolorer=BlenderRecolorer(blend_p),
        upscaler=RealESRGANUpscaler(rrdb_p, rrdb),
        inpainter=FaceInpainter(gcfsr_p, model=gcfsr),
    )
    pipe = FullFaceSwapPipeline(
        swapper, comps,
        FullSwapConfig(ct_mode="blender", face_inpainting=True))

    # device-resident uint8 inputs (same methodology as the headline
    # bench.py): host numpy args re-stream over the device tunnel EVERY call
    # at ~40 MB/s — 2x 3 MB of 1024^2 uint8 is ~150 ms/swap of transport,
    # not chip work. The output fetch stays in the timed loop: the final
    # image IS the deliverable.
    src = jnp.asarray((rng.random((size, size, 3)) * 255).astype(np.uint8))
    tgt = jnp.asarray((rng.random((size, size, 3)) * 255).astype(np.uint8))

    for attempt in range(4):  # compile with retries
        try:
            pipe(src, tgt)
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(10)
    fused = pipe._fused_call is not None

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = pipe(src, tgt)
        best = min(best, (time.perf_counter() - t0) / args.iters)
    assert out["image"].shape == (size, size, 3)

    # batched multi-pair path: B pairs per program call amortizes dispatch
    # and fills the chip between the small zoo stages
    batched_detail = {}
    if args.batch > 1 and fused:
        bsrc = jnp.asarray((rng.random((args.batch, size, size, 3)) * 255)
                           .astype(np.uint8))
        btgt = jnp.asarray((rng.random((args.batch, size, size, 3)) * 255)
                           .astype(np.uint8))
        pipe.swap_batch(bsrc, btgt)  # compile (auto-chunked policy path)
        bbest = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(max(2, args.iters // 2)):
                bout = pipe.swap_batch(bsrc, btgt)
            bbest = min(bbest, (time.perf_counter() - t0)
                        / max(2, args.iters // 2))
        assert bout.shape == (args.batch, size, size, 3)
        # the raw whole-batch fused program too — recorded alongside the
        # policy path so a policy/measurement drift (like round 4's 1024^2
        # chunk-1 policy outliving its motivating regression) shows up in
        # the artifact itself
        wbest = float("inf")
        try:
            wout = pipe._fused_batch(bsrc, btgt)
            float(np.asarray(wout.ravel()[0]))
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(max(2, args.iters // 2)):
                    wout = pipe._fused_batch(bsrc, btgt)
                float(np.asarray(wout.ravel()[0]))
                wbest = min(wbest, (time.perf_counter() - t0)
                            / max(2, args.iters // 2))
        except Exception:
            pass
        batched_detail = {
            "batch": args.batch,
            "batched_swaps_per_sec": round(args.batch / bbest, 3),
            "batched_seconds_per_call": round(bbest, 3),
            "batched_chunk_policy": pipe._batch_chunk(args.batch),
        }
        if wbest != float("inf"):
            batched_detail["whole_batch_fused_swaps_per_sec"] = round(
                args.batch / wbest, 3)

    # MFU/FLOP accounting for the fused program (VERDICT r3 missing #3)
    mfu = {}
    try:
        from e4s2024_tpu.utils.mfu import program_mfu

        enh, rec, up, inp = pipe._fused_parts
        packed_args = (swapper._packed,
                       enh._packed if enh is not None else None,
                       rec._packed if rec is not None else None,
                       up._packed if up is not None else None,
                       inp._packed if inp is not None else None)
        mfu["fused_single"] = program_mfu(
            jax.jit(pipe._fused_raw), best, *packed_args, src[None],
            tgt[None])
        if batched_detail.get("whole_batch_fused_swaps_per_sec"):
            mfu["fused_batched_whole"] = program_mfu(
                jax.jit(pipe._fused_raw),
                args.batch / batched_detail["whole_batch_fused_swaps_per_sec"],
                *packed_args, bsrc, btgt)
    except Exception as e:
        mfu["error"] = f"{type(e).__name__}: {e}"[:200]

    # per-stage breakdown (separate pass: the per-stage device syncs
    # serialize work the un-timed path overlaps, so its total is an upper
    # bound on the real swap time). First verbose call compiles the staged
    # programs the fused path skipped — profile the second.
    pipe(src, tgt, verbose=True)
    prof = pipe(src, tgt, verbose=True)
    stage_ms = {k: round(v * 1e3, 1)
                for k, v in sorted(prof["stage_times"].items(),
                                   key=lambda kv: -kv[1])}

    rec = {
        "metric": "1024px_full_zoo_swaps_per_sec",
        "value": round(1.0 / best, 3),
        "unit": "swaps/s (parse+invert+merge+synth at 1024^2, GPEN 512, "
                "Blender 256 recolor + RealESR x4, GCFSR inpaint)",
        "vs_baseline": None,
        "detail": {"seconds_per_swap": round(best, 3), "size": size,
                   "fused_single_program": fused,
                   **batched_detail,
                   "mfu": mfu,
                   "stage_ms_synced_staged_path": stage_ms,
                   "note": "BASELINE.md measurement config 3; the reference "
                           "publishes no number for this path"},
    }
    with open(os.path.join(REPO, "BENCH_FULL_ZOO.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
