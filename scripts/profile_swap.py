"""Per-stage latency profile of the 512^2 swap pipeline on the real chip.

Times each staged XLA program separately (value-fetch sync — see
axon backend notes in bench.py) so perf work targets the right stage:

  parse      BiSeNet 19-class parse of one 512^2 crop
  invert     RGI encoder style-vector extraction of one crop
  pair       the shipped stage-1 program (parse+invert, both crops batched)
  merge      the shipped stage-2 program (mask merge + mixing + synthesis
             + soft-erosion/multiband compositing)
  synth      synthesis+compositing alone (merge minus the mask logic)

Usage: python scripts/profile_swap.py [--dtype bfloat16] [--iters 20]
"""

import argparse
import time

import numpy as np


def bench(label, fn, sync, iters):
    # warmup with retries (remote-compile endpoint can drop transiently)
    for attempt in range(4):
        try:
            sync(fn())
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 3:
                raise
            print(f"  [{label}] warmup retry after: {type(e).__name__}")
            time.sleep(10)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:8s} {best * 1e3:8.2f} ms   ({1.0 / best:7.1f}/s)")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--fused", action="store_true",
                    help="time the single-program (jit_mode=fused) swap only")
    ap.add_argument("--batch", type=int, default=1,
                    help="swaps per call (throughput = batch * calls/s)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from e4s2024_tpu.models.bisenet import BiSeNet
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig

    size = args.size
    rng = np.random.default_rng(0)
    cfg = SwapConfig(out_size=size, remaining_layer_idx=13,
                     regional_mode="fast", num_blend_levels=8,
                     compute_dtype=args.dtype,
                     jit_mode="fused" if args.fused else "staged")
    rgi = RGINet(out_size=size, remaining_layer_idx=13)
    img = jnp.zeros((1, size, size, 3))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, size, size), int)])
    rgi_vars = jax.jit(rgi.init)(jax.random.PRNGKey(0), img, seg)
    bise = jax.jit(BiSeNet().init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 512, 512, 3)))["params"]
    sw = FaceSwapper(rgi_vars, bise, cfg)

    nb = args.batch
    a = jnp.asarray((rng.random((nb, size, size, 3)) * 255).astype(np.uint8))
    b = jnp.asarray((rng.random((nb, size, size, 3)) * 255).astype(np.uint8))
    pair = jnp.concatenate([a, b], axis=0)

    # slice ON DEVICE, fetch 1 element (whole-output fetches would time the
    # ~40 MB/s tunnel, not the chip)
    sync_img = lambda o: np.asarray(o["image"].ravel()[0])
    sync_arr = lambda o: np.asarray(o.ravel()[0])
    sync_tup = lambda o: np.asarray(o[0].ravel()[0])

    it = args.iters
    print(f"profile @ {size}px dtype={args.dtype} iters={it} "
          f"mode={sw.cfg.jit_mode} batch={nb}")
    dt = bench("e2e", lambda: sw.swap_aligned(a, b), sync_img, it)
    if nb > 1:
        print(f"throughput: {nb / dt:.1f} swaps/s at batch {nb}")
    if args.fused:
        return
    bench("pair", lambda: sw._pair_jit(pair), sync_tup, it)

    masks, sv = sw._pair_jit(pair)
    t_pm1 = jnp.asarray(b, jnp.float32) / 127.5 - 1.0
    bench("merge", lambda: sw._merge_jit(masks[:1], masks[1:], sv[:1],
                                         sv[1:], b), sync_img, it)

    merged = sw._merge_jit(masks[:1], masks[1:], sv[:1], sv[1:], b)
    bench("synth", lambda: sw._synth_jit(merged["swapped_style_vectors"],
                                         merged["swapped_mask"],
                                         merged["hole_mask"], t_pm1),
          sync_arr, it)

    a_f = jnp.asarray(a, jnp.float32)
    bench("parse", lambda: sw._parse_jit(a_f / 255.0), sync_arr, it)
    onehot = sw._onehot(masks[:1])
    bench("invert", lambda: sw._invert_jit(a_f / 127.5 - 1.0, onehot),
          sync_arr, it)

    # split the synth program: pure generator vs pure compositing
    from e4s2024_tpu.models.rgi import RGINet

    def gen_only(rv, sv, mask):
        codes = sw.rgi.apply(rv, sv.astype(sw._dtype),
                             method=RGINet.cal_style_codes)
        onehot = sw._onehot(mask).astype(sw._dtype)
        img, _, _ = sw.rgi.apply(rv, None, codes, onehot,
                                 method=RGINet.gen_img,
                                 regional_mode=sw.cfg.regional_mode)
        return img

    gen_j = jax.jit(gen_only)
    comp_j = jax.jit(lambda s_img, t, m, h: sw._composite(s_img, t, m, h))

    sv1 = merged["swapped_style_vectors"]
    m1 = merged["swapped_mask"]
    h1 = merged["hole_mask"]
    bench("gen", lambda: gen_j(sw.rgi_variables, sv1, m1), sync_arr, it)
    s_img = gen_j(sw.rgi_variables, sv1, m1).astype(jnp.float32)
    bench("comp", lambda: comp_j(s_img, t_pm1, m1, h1), sync_arr, it)


if __name__ == "__main__":
    main()
