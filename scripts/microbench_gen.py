"""Microbenchmark the generator's constituent ops on the real chip to find
where the 11.4 ms at 512^2 goes: per-resolution modulated convs (up + same),
FIR blurs, torgb, style MLPs.

Usage: python scripts/microbench_gen.py [--dtype bfloat16]
"""

import argparse
import time

import numpy as np


def sync(out):
    # slice ON DEVICE and fetch 1 element: fetching whole outputs would time
    # the ~40 MB/s tunnel, not the chip
    return np.asarray(out.ravel()[0])


def bench(label, fn, iters=30):
    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:44s} {best * 1e3:8.3f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    import jax.numpy as jnp

    from e4s2024_tpu.ops.modconv import regional_modulated_conv2d, _conv
    from e4s2024_tpu.ops.upfirdn import blur as fir_blur, make_kernel

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    blur_k = jnp.asarray(make_kernel([1, 3, 3, 1]), dt)

    # channel plan at 512^2 output, channel_multiplier=2
    plan = [  # (res_in, cin, cout) for the up conv at each level
        (4, 512, 512), (8, 512, 512), (16, 512, 512), (32, 512, 512),
        (64, 512, 256), (128, 256, 128), (256, 128, 64),
    ]
    K = 12

    total = 0.0
    for res, cin, cout in plan:
        x = jnp.asarray(rng.standard_normal((1, res, res, cin)), dt)
        w_up = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, dt)
        w_same = jnp.asarray(rng.standard_normal((3, 3, cout, cout)) * 0.1, dt)
        styles = jnp.asarray(rng.standard_normal((1, K, cin)), dt)
        styles2 = jnp.asarray(rng.standard_normal((1, K, cout)), dt)
        seg = jnp.asarray(
            np.eye(K, dtype=np.float32)[rng.integers(0, K, (1, 512, 512))], dt)

        up = jax.jit(lambda x, w, s, m: regional_modulated_conv2d(
            x, w, s, m, up=True, blur_kernel=blur_k, mode="fast"))
        t = bench(f"up   {res:4d}->{2*res:<4d} {cin:4d}->{cout:<4d}",
                  lambda: up(x, w_up, styles, seg))
        total += t
        x2 = jnp.asarray(rng.standard_normal((1, 2 * res, 2 * res, cout)), dt)
        same = jax.jit(lambda x, w, s, m: regional_modulated_conv2d(
            x, w, s, m, up=False, mode="fast"))
        t = bench(f"same {2*res:4d}       {cout:4d}->{cout:<4d}",
                  lambda: same(x2, w_same, styles2, seg))
        total += t

    # isolated pieces at the most expensive level
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 64)), dt)
    b3 = jax.jit(lambda x: fir_blur(x, blur_k, pad=(2, 1)))
    bench("fir_blur 512^2 x64 (same-res)", lambda: b3(x))
    xs = jnp.asarray(rng.standard_normal((1, 256, 256, 128)), dt)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 64)) * 0.1, dt)
    dil = jax.jit(lambda x, w: _conv(x, jnp.flip(w, (0, 1)), padding=2,
                                     lhs_dilation=2))
    bench("lhs_dilated up-conv 256->512 128->64", lambda: dil(xs, w))
    pad = jax.jit(lambda x, w: _conv(
        jnp.kron(x, jnp.ones((1, 1, 1, 1), dt)), w, padding=1))
    # plain conv at 512^2 for reference
    x5 = jnp.asarray(rng.standard_normal((1, 512, 512, 128)), dt)
    w5 = jnp.asarray(rng.standard_normal((3, 3, 128, 64)) * 0.1, dt)
    plain = jax.jit(lambda x, w: _conv(x, w, padding=1))
    bench("plain conv 512^2 128->64", lambda: plain(x5, w5))

    print(f"{'SUM of conv stages':44s} {total * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
