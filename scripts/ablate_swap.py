"""Ablate the fused 512^2 swap program on the real chip: time variants with
individual stages removed to attribute device time (per-program call overhead
on the tunneled backend is ~3.6 ms, so staged timings mislead).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_swap.py
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
    print(f"{label:36s} {best * 1e3:8.2f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    import jax.numpy as jnp

    from e4s2024_tpu.models.bisenet import BiSeNet
    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.pipelines.swap import FaceSwapper, SwapConfig
    from e4s2024_tpu.pipelines.mask_merge import (
        swap_comp_style_vector, swap_head_mask)

    size = args.size
    rng = np.random.default_rng(0)
    cfg = SwapConfig(out_size=size, remaining_layer_idx=13,
                     regional_mode="fast", num_blend_levels=8,
                     compute_dtype=args.dtype, jit_mode="fused")
    rgi = RGINet(out_size=size, remaining_layer_idx=13)
    img = jnp.zeros((1, size, size, 3))
    seg = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, size, size), int)])
    rgi_vars = jax.jit(rgi.init)(jax.random.PRNGKey(0), img, seg)
    bise = jax.jit(BiSeNet().init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 512, 512, 3)))["params"]
    sw = FaceSwapper(rgi_vars, bise, cfg)

    a = jnp.asarray((rng.random((1, size, size, 3)) * 255).astype(np.uint8))
    b = jnp.asarray((rng.random((1, size, size, 3)) * 255).astype(np.uint8))

    full = bench("full fused swap", lambda: sw.swap_aligned(a, b)["image"])

    # -- no compositing: stop after synthesis ------------------------------
    def swap_no_comp(rv, bp, d, t):
        pair = jnp.concatenate([d, t], axis=0)
        masks, sv = sw._parse_invert_p(rv, bp, pair)
        merged = jax.vmap(swap_head_mask)(masks[:1], masks[1:])
        comp = jnp.asarray(sorted(set(range(12)) - set(cfg.keep_target_components)))
        ssv = swap_comp_style_vector(sv[1:], sv[:1], comp)
        codes = sw.rgi.apply(rv, ssv.astype(sw._dtype), method=RGINet.cal_style_codes)
        onehot = jax.nn.one_hot(merged["mask"], 12, dtype=sw._dtype)
        out, _, _ = sw.rgi.apply(rv, None, codes, onehot, method=RGINet.gen_img,
                                 regional_mode="fast")
        return out

    j1 = jax.jit(swap_no_comp)
    bench("  - compositing", lambda: j1(sw.rgi_variables, sw.bisenet_params, a, b))

    # -- no mask merge: use the target's own mask + mixed styles -----------
    def swap_no_merge(rv, bp, d, t):
        pair = jnp.concatenate([d, t], axis=0)
        masks, sv = sw._parse_invert_p(rv, bp, pair)
        comp = jnp.asarray(sorted(set(range(12)) - set(cfg.keep_target_components)))
        ssv = swap_comp_style_vector(sv[1:], sv[:1], comp)
        t_pm1 = t.astype(jnp.float32) / 127.5 - 1.0
        return sw._synth_and_composite_p(rv, ssv, masks[1:],
                                         jnp.zeros_like(masks[1:], bool), t_pm1)

    j2 = jax.jit(swap_no_merge)
    bench("  - mask merge", lambda: j2(sw.rgi_variables, sw.bisenet_params, a, b))

    # -- no parse: labels as inputs ----------------------------------------
    lbl = jnp.asarray(rng.integers(0, 12, (2, 512, 512)))

    def swap_no_parse(rv, d, t, masks):
        pair = jnp.concatenate([d, t], axis=0)
        img01 = pair.astype(jnp.float32) / 255.0
        onehot = jax.nn.one_hot(masks, 12)
        sv = sw._style_vectors_p(rv, img01 * 2.0 - 1.0, onehot)
        return sw._merge_synth_composite_p(rv, masks[:1], masks[1:],
                                           sv[:1], sv[1:], t)

    j3 = jax.jit(swap_no_parse)
    bench("  - parse (BiSeNet x2)", lambda: j3(sw.rgi_variables, a, b, lbl)["image"])

    # -- no invert: style vectors as inputs --------------------------------
    sv_in = jnp.asarray(rng.standard_normal((2, 12, 1280)), jnp.float32)

    def swap_no_invert(rv, bp, d, t, sv):
        pair = jnp.concatenate([d, t], axis=0)
        masks = sw._parse12_p(bp, pair.astype(jnp.float32) / 255.0)
        return sw._merge_synth_composite_p(rv, masks[:1], masks[1:],
                                           sv[:1], sv[1:], t)

    j4 = jax.jit(swap_no_invert)
    bench("  - invert (encoder x2)",
          lambda: j4(sw.rgi_variables, sw.bisenet_params, a, b, sv_in)["image"])

    # -- generator only (codes+synth from given sv+mask) -------------------
    def gen_only(rv, sv, mask):
        codes = sw.rgi.apply(rv, sv[:1].astype(sw._dtype),
                             method=RGINet.cal_style_codes)
        onehot = jax.nn.one_hot(mask[:1], 12, dtype=sw._dtype)
        out, _, _ = sw.rgi.apply(rv, None, codes, onehot,
                                 method=RGINet.gen_img, regional_mode="fast")
        return out

    j5 = jax.jit(gen_only)
    bench("gen only", lambda: j5(sw.rgi_variables, sv_in, lbl))


if __name__ == "__main__":
    main()
# appended: generator-internal ablations (run with --gen)
