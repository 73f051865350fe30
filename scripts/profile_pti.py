"""Profile the PTI tuning step to find where the 4.8 s/step goes.

Times, separately:
  - the raw jitted step (block_until_ready once, no per-step metric sync)
  - the tune() loop as shipped (with per-step float() history sync)
  - step variants: remat on/off, onehot-resident vs label-resident

Run on the TPU: python scripts/profile_pti.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/e4s_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from e4s2024_tpu.models.rgi import RGINet
    from e4s2024_tpu.training.pti import PTICoach, PTIConfig

    size = 512
    F = 100
    rng = np.random.default_rng(0)

    rgi = RGINet(out_size=size, remaining_layer_idx=13)
    img0 = jnp.zeros((1, size, size, 3))
    seg0 = jnp.asarray(np.eye(12, dtype=np.float32)[np.zeros((1, size, size), int)])
    t0 = time.perf_counter()
    rgi_vars = jax.jit(rgi.init)(jax.random.PRNGKey(0), img0, seg0)
    jax.block_until_ready(rgi_vars)
    print(f"init: {time.perf_counter()-t0:.1f}s")

    frames = jnp.asarray(rng.random((F, size, size, 3), np.float32) * 2 - 1)
    labels = np.asarray(rng.integers(0, 12, (F, size, size)), np.int32)
    sv = jnp.asarray(rng.random((F, 12, 1280), np.float32))

    common = dict(lpips_lambda=0.0, id_lambda=0.0, face_parsing_lambda=0.0)
    cfg = PTIConfig(frames_per_step=8, compute_dtype="bfloat16",
                    regional_mode="fast", frames_per_chunk=4, **common)
    coach = PTICoach(rgi, {}, cfg)

    # ---- shipped tune() path (includes per-step float() sync) ----
    v, _ = coach.tune(rgi_vars, frames=frames, labels=labels,
                      style_vectors=sv, recolor=frames, steps=1)  # compile
    t0 = time.perf_counter()
    n = 8
    coach.tune(v, frames=frames, labels=labels, style_vectors=sv,
               recolor=frames, steps=n)
    dt = (time.perf_counter() - t0) / n
    print(f"tune() as shipped: {dt*1e3:.0f} ms/step")

    # ---- raw jitted step, no per-step sync ----
    onehot = jax.nn.one_hot(jnp.asarray(labels), 12, dtype=jnp.float32)
    params = jax.tree_util.tree_map(jnp.copy, v["params"])
    if coach.tx is None:
        coach._build_tx(params)
    carry = (params, coach.tx.init(params))
    idx = jnp.arange(8)
    carry, m = coach._step(carry, v["buffers"], frames, onehot, sv, frames, idx)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(n):
        carry, m = coach._step(carry, v["buffers"], frames, onehot, sv,
                               frames, idx)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / n
    print(f"raw step, no sync: {dt*1e3:.0f} ms/step")

    # ---- metrics sync cost alone ----
    t0 = time.perf_counter()
    for _ in range(n):
        carry, m = coach._step(carry, v["buffers"], frames, onehot, sv,
                               frames, idx)
        _ = {k: float(x) for k, x in m.items()}
    dt = (time.perf_counter() - t0) / n
    print(f"raw step + metric float() sync: {dt*1e3:.0f} ms/step")

    # ---- remat off ----
    cfg2 = PTIConfig(frames_per_step=8, compute_dtype="bfloat16",
                     regional_mode="fast", frames_per_chunk=4, remat=False,
                     **common)
    coach2 = PTICoach(rgi, {}, cfg2)
    coach2._build_tx(params)
    carry2 = (jax.tree_util.tree_map(jnp.copy, v["params"]),
              coach2.tx.init(params))
    try:
        carry2, m = coach2._step(carry2, v["buffers"], frames, onehot, sv,
                                 frames, idx)
        jax.block_until_ready(carry2)
        t0 = time.perf_counter()
        for _ in range(n):
            carry2, m = coach2._step(carry2, v["buffers"], frames, onehot, sv,
                                     frames, idx)
        jax.block_until_ready(carry2)
        dt = (time.perf_counter() - t0) / n
        print(f"remat OFF: {dt*1e3:.0f} ms/step")
    except Exception as e:
        print(f"remat OFF: failed ({type(e).__name__}: {str(e)[:120]})")

    # ---- no chunking (8 frames in one chunk) ----
    cfg3 = PTIConfig(frames_per_step=8, compute_dtype="bfloat16",
                     regional_mode="fast", frames_per_chunk=8, **common)
    coach3 = PTICoach(rgi, {}, cfg3)
    coach3._build_tx(params)
    carry3 = (jax.tree_util.tree_map(jnp.copy, v["params"]),
              coach3.tx.init(params))
    try:
        carry3, m = coach3._step(carry3, v["buffers"], frames, onehot, sv,
                                 frames, idx)
        jax.block_until_ready(carry3)
        t0 = time.perf_counter()
        for _ in range(n):
            carry3, m = coach3._step(carry3, v["buffers"], frames, onehot, sv,
                                     frames, idx)
        jax.block_until_ready(carry3)
        dt = (time.perf_counter() - t0) / n
        print(f"chunk=8 (single chunk): {dt*1e3:.0f} ms/step")
    except Exception as e:
        print(f"chunk=8: failed ({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    main()
