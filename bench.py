"""Benchmark: single-image 512^2 face swaps per second per chip.

Runs the full jitted swap program (BiSeNet parse x2 -> RGI style vectors x2 ->
mask merge -> style mixing -> regional StyleGAN2 synthesis -> soft-erosion +
multiband compositing) with random weights on the available accelerator and
reports steady-state throughput.

Backend notes (axon TPU tunnel):
- block_until_ready does not synchronize there; completion is forced by
  fetching a value (np.asarray) after the timing loop.
- compiles go through a remote-compile endpoint that can drop transient
  connections -> the warmup retries.

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is 50 swaps/sec/chip on v5e, so vs_baseline = value / 50.

Why random weights are valid here: the swap is a static XLA program — its op
graph, shapes and FLOPs are fixed at trace time and independent of weight
values, so steady-state throughput with random weights equals throughput with
trained weights. The one data-dependent knob is the parsed mask distribution
feeding the regional synthesis: random weights make argmax collapse to one
class. That is immaterial for `regional_mode="fast"` (masking is a dense
where — same work for any mask), and for "exact" mode the per-region einsum
is dense regardless of the one-hot's sparsity pattern (XLA does not exploit
value sparsity), so a realistic multi-class mask hits the identical code
path and cost. tests/test_swap_pipeline.py exercises the same program with
multi-class masks for correctness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from e4s2024_tpu.models.bisenet import BiSeNet
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig

    size = 512
    rng = np.random.default_rng(0)
    # fused single-program jit + bf16 nets (f32 compositing) + uint8 device
    # IO: one dispatch per swap, minimal per-call bytes. v5e: ~19.8 ms e2e.
    cfg = SwapConfig(out_size=size, remaining_layer_idx=13,
                     regional_mode="fast", num_blend_levels=8,
                     compute_dtype="bfloat16", jit_mode="fused")
    rgi = RGINet(out_size=size, remaining_layer_idx=13)
    img = jnp.zeros((1, size, size, 3))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, size, size), int)])
    # jit the inits: eager init dispatches hundreds of small ops, which is
    # very slow over the axon device tunnel
    rgi_vars = jax.jit(rgi.init)(jax.random.PRNGKey(0), img, seg)
    bise = jax.jit(BiSeNet().init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 512, 512, 3)))["params"]
    swapper = FaceSwapper(rgi_vars, bise, cfg)

    # device-resident uint8 inputs: host numpy args re-stream over the device
    # tunnel EVERY call (~40 MB/s measured) — put them on device once; uint8
    # quarters the per-call arg bytes vs f32
    a = jnp.asarray((rng.random((1, size, size, 3)) * 255).astype(np.uint8))
    b = jnp.asarray((rng.random((1, size, size, 3)) * 255).astype(np.uint8))

    def run_once():
        out = swapper.swap_aligned(a, b)
        # slice ON DEVICE, fetch one element: forces completion without
        # timing the ~40 MB/s tunnel fetch of the whole image
        return float(np.asarray(out["image"].ravel()[0]))

    # warmup / compile with retries (remote-compile endpoint can drop)
    for attempt in range(4):
        try:
            run_once()
            break
        except Exception:  # transient transport errors
            if attempt == 3:
                raise
            time.sleep(10)

    best = 0.0
    for _ in range(4):  # best-of-4: the tunneled chip drifts ~10% run to run
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = swapper.swap_aligned(a, b)
        _ = np.asarray(out["image"].ravel()[0])
        dt = time.perf_counter() - t0
        best = max(best, iters / dt)

    # batched multi-pair throughput: B pairs per program call amortizes the
    # per-dispatch floor (the swap program is batch-polymorphic). B=8 is the
    # production video shape (frames_per_batch=8, pipelines/video.py); B=16
    # probes whether more batch keeps lifting MXU occupancy. The HEADLINE is
    # the best batched number (VERDICT r4 ask #6: batched is the
    # production-relevant throughput; single-pair is a latency figure,
    # reported alongside).
    from e4s2024_tpu.utils.mfu import program_mfu

    mfu = {}
    try:
        mfu["single_pair"] = program_mfu(
            swapper._swap_fused_jit, 1.0 / best, swapper._packed, a, b)
    except Exception as e:  # cost_analysis unavailable on some backends
        mfu["error"] = f"{type(e).__name__}: {e}"[:200]

    batched = {}
    for B in (8, 16):
        ab = jnp.asarray(
            (rng.random((B, size, size, 3)) * 255).astype(np.uint8))
        bb = jnp.asarray(
            (rng.random((B, size, size, 3)) * 255).astype(np.uint8))
        th = 0.0
        try:
            for attempt in range(2):  # compile w/ one retry
                try:
                    np.asarray(
                        swapper.swap_aligned(ab, bb)["image"].ravel()[0])
                    break
                except Exception:
                    if attempt:
                        raise
                    time.sleep(10)
            for _ in range(3):
                iters = max(2, 48 // B)
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = swapper.swap_aligned(ab, bb)
                _ = np.asarray(out["image"].ravel()[0])
                th = max(th, B * iters / (time.perf_counter() - t0))
            batched[B] = th
            try:
                mfu[f"batched_b{B}"] = program_mfu(
                    swapper._swap_fused_jit, B / th, swapper._packed, ab, bb)
            except Exception:
                pass
        except Exception:
            pass  # batched compile unavailable at this B

    if batched:
        head_b, head = max(batched.items(), key=lambda kv: kv[1])
    else:  # batched unavailable: fall back to the single-pair headline
        head_b, head = 1, best

    print(json.dumps({
        "metric": "512px_full_swaps_per_sec_per_chip",
        "value": round(head, 3),
        "unit": f"swaps/s (batched B={head_b} — the production video shape; "
                f"single-pair latency in detail)",
        "vs_baseline": round(head / 50.0, 3),
        "detail": {
            "single_pair_swaps_per_sec": round(best, 3),
            "single_pair_latency_ms": round(1e3 / best, 2),
            "batched_swaps_per_sec": {
                str(k): round(v, 3) for k, v in batched.items()},
            "mfu": mfu,
        },
    }))


if __name__ == "__main__":
    main()
