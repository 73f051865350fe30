"""A/B the fused-act backends on real hardware: XLA-fused vs Pallas kernel.

Decides VERDICT r1 #5 (wire the Pallas kernels into the hot path or kill
them) with a measurement: times the regional StyleGAN2 synthesis (the op's
only hot consumer) with `fused_leaky_relu` routed through (a) the plain jnp
form XLA fuses into the producing convs, (b) the explicit Pallas VPU kernel.

Usage: python scripts/measure_pallas.py [--size 512] [--iters 20]
"""

import argparse
import time

import numpy as np


def bench(label, fn, sync, iters):
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
    print(f"{label:24s} {best * 1e3:8.2f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    import jax.numpy as jnp

    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.ops.fused_act import set_fused_act_backend

    size = args.size
    rng = np.random.default_rng(0)
    rgi = RGINet(out_size=size, remaining_layer_idx=13)
    img = jnp.zeros((1, size, size, 3))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, size, size), int)])
    variables = jax.jit(rgi.init)(jax.random.PRNGKey(0), img, seg)
    dt = jnp.dtype(args.dtype)
    if dt != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, variables)

    sv = jnp.asarray(rng.standard_normal((1, 12, 1280)), dt)
    mask = jnp.asarray(rng.integers(0, 12, (1, 512, 512)))

    def gen(backend):
        set_fused_act_backend(backend)

        def f(v, sv, mask):
            codes = rgi.apply(v, sv, method=RGINet.cal_style_codes)
            onehot = jax.nn.one_hot(mask, 12, dtype=dt)
            out, _, _ = rgi.apply(v, None, codes, onehot,
                                  method=RGINet.gen_img, regional_mode="fast")
            return out

        j = jax.jit(f)
        try:
            return bench(f"gen[{backend}]", lambda: j(variables, sv, mask),
                         lambda o: np.asarray(o).reshape(-1)[0], args.iters)
        finally:
            set_fused_act_backend("xla")

    a = gen("xla")
    b = gen("pallas")
    print(f"pallas/xla ratio: {b / a:.3f}  ({'pallas wins' if b < a else 'xla wins'})")


if __name__ == "__main__":
    main()
