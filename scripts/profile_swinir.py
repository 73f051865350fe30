"""A/B profile of the SwinIR execution variants on the current accelerator.

Variants:
  xla_f32    — plain XLA, f32 (round-3 production default; 993 ms/frame r3)
  xla_bf16   — bf16 compute, dense XLA attention chain
  attn_kern  — bf16 + NHWC window-attention Pallas kernel (use_kernel)
  fused      — bf16 + fully-fused SwinBlock Pallas kernel (apply_fused)

Prints ms/frame + XLA cost analysis (FLOPs, bytes, MFU, HBM-BW fraction)
per variant; the roofline note (docs/ROOFLINE.md) and the SwinIR config
default in models/swinir.py are driven by these measurements.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_swinir.py
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--variants", default="xla_f32,xla_bf16,attn_kern,fused")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SWINIR.json"))
    args = ap.parse_args()

    from e4s2024_tpu.models.swinir import SwinIR, SwinIRUpscaler, apply_fused
    from e4s2024_tpu.utils.mfu import program_mfu
    from e4s2024_tpu.utils.packing import jit_with_packed_params

    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda k: SwinIR().init(k, jnp.zeros((1, 64, 64, 3))),
            jax.random.PRNGKey(3))["params"])
    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)

    def build(name):
        if name == "xla_f32":
            m = SwinIR()
            return jit_with_packed_params(
                lambda p, v: m.apply({"params": p}, v), params)
        if name == "xla_bf16":
            m = SwinIR(dtype=jnp.bfloat16)
            return jit_with_packed_params(
                lambda p, v: m.apply({"params": p}, v), params)
        if name == "attn_kern":
            m = SwinIR(dtype=jnp.bfloat16, use_kernel=True)
            return jit_with_packed_params(
                lambda p, v: m.apply({"params": p}, v), params)
        if name == "fused":
            m = SwinIR(dtype=jnp.bfloat16)
            return jit_with_packed_params(
                lambda p, v: apply_fused(m, p, v), params)
        raise ValueError(name)

    def sync(out):
        # fetch ONE element: forces completion without timing the tunnel
        # fetch of the whole image (block_until_ready doesn't sync on axon)
        return float(np.asarray(out.ravel()[0]))

    results = {}
    for name in args.variants.split(","):
        name = name.strip()
        try:
            fwd = build(name)
            t0 = time.perf_counter()
            sync(fwd(x))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                sync(fwd(x))
                best = min(best, time.perf_counter() - t0)
            ms_frame = best / args.batch * 1e3
            cost = program_mfu(fwd, best, x)
            bw = None
            if cost.get("bytes_accessed"):
                bw = round(cost["bytes_accessed"] / best / 819e9, 3)  # v5e
            results[name] = {
                "ms_per_frame": round(ms_frame, 1),
                "compile_s": round(compile_s, 1),
                "hbm_bw_fraction_v5e": bw,
                **cost,
            }
            print(name, json.dumps(results[name]))
        except Exception as e:  # a failing variant must not sink the rest
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(name, "ERROR", results[name]["error"])
    rec = {
        "metric": "swinir_x4_sr_ms_per_frame",
        "config": {"size": args.size, "batch": args.batch},
        "variants": results,
        "note": ("XLA cost_analysis treats the Pallas tpu_custom_call as "
                 "opaque: the fused variant's flops/bytes rows exclude the "
                 "kernel body — see docs/ROOFLINE.md for the corrected "
                 "fused-variant MFU/BW derivation"),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
