"""Generator-internal ablation on the real chip: where do ~8 ms go?

Times: cal_style_codes alone; full synthesis at out_size 128/256/512 (how
cost scales with the top resolution); fast vs exact regional mode at 512.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_gen.py
"""

import argparse
import time

import numpy as np


def sync(out):
    # slice ON DEVICE and fetch 1 element: fetching whole outputs would time
    # the ~40 MB/s tunnel, not the chip
    return np.asarray(out.ravel()[0])


def bench(label, fn, iters=20):
    for attempt in range(4):
        try:
            sync(fn())
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(10)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:40s} {best * 1e3:8.2f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    import jax.numpy as jnp

    from e4s2024_tpu.models.rgi import RGINet

    rng = np.random.default_rng(0)
    dt = jnp.dtype(args.dtype)
    lbl = jnp.asarray(rng.integers(0, 12, (1, 512, 512)))
    sv = jnp.asarray(rng.standard_normal((1, 12, 1280)), jnp.float32)

    for size in (128, 256, 512):
        rgi = RGINet(out_size=size,
                     remaining_layer_idx=13 if size >= 256 else 11)
        img = jnp.zeros((1, size, size, 3))
        seg = jnp.asarray(np.eye(12, dtype=np.float32)[
            np.zeros((1, size, size), int)])
        v = jax.jit(rgi.init)(jax.random.PRNGKey(0), img, seg)
        v = jax.tree_util.tree_map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, v)

        def codes_only(v, sv):
            return rgi.apply(v, sv.astype(dt), method=RGINet.cal_style_codes)

        def gen(v, sv, mask, mode):
            codes = rgi.apply(v, sv.astype(dt), method=RGINet.cal_style_codes)
            onehot = jax.nn.one_hot(mask, 12, dtype=dt)
            out, _, _ = rgi.apply(v, None, codes, onehot,
                                  method=RGINet.gen_img, regional_mode=mode)
            return out

        if size == 512:
            jc = jax.jit(codes_only)
            bench("cal_style_codes", lambda: jc(v, sv))
            jf = jax.jit(lambda v, s, m: gen(v, s, m, "fast"))
            bench(f"gen {size} fast", lambda: jf(v, sv, lbl))
            je = jax.jit(lambda v, s, m: gen(v, s, m, "exact"))
            bench(f"gen {size} exact", lambda: je(v, sv, lbl))
        else:
            jf = jax.jit(lambda v, s, m: gen(v, s, m, "fast"))
            bench(f"gen {size} fast", lambda: jf(v, sv, lbl))


if __name__ == "__main__":
    main()
