"""Latent (style-vector) optimization — on-device W-space refinement.

Re-design of the reference's `Optimizer.optim_W_online` (reference
optimization.py:321-351): gradient-descent refinement of the per-region style
VECTORS (not W+ directly) against the reconstruction criterion, 150-200 steps
of Adam at lr 1e-2 (options/optim_options.py:37-39).

The reference runs a Python loop with a torch optimizer; here the whole
optimization is ONE jitted `lax.scan` over optax updates — a single XLA
program, no host round-trips between steps.

Also provides `ranger`, the RAdam+LookAhead optimizer the reference trainer
offers (reference training/ranger.py), composed from optax primitives.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from e4s2024_tpu.models.rgi import RGINet


class LookaheadState(NamedTuple):
    inner: Any
    slow: Any          # slow weights, same pytree as params
    gstep: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """LookAhead wrapper that keeps the slow weights in OPTIMIZER STATE.

    Unlike `optax.lookahead` (which requires params to be an
    `optax.LookaheadParams` fast/slow pair and therefore cannot sit inside
    `optax.multi_transform`), this variant leaves the param pytree unchanged:
    every `sync_period` steps the emitted update moves the fast weights to
    slow + slow_step_size * (fast - slow) and refreshes the slow copy —
    exactly the reference Ranger's integrated LookAhead step
    (reference training/ranger.py:140-160).
    """

    def init_fn(params):
        return LookaheadState(
            inner=inner.init(params),
            # jnp.copy, NOT asarray: the slow weights must be distinct buffers
            # from the live params, or jit donation of a state carrying both
            # fails with "donate the same buffer twice"
            slow=jax.tree_util.tree_map(jnp.copy, params),
            gstep=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        updates, inner_state = inner.update(updates, state.inner, params)
        gstep = state.gstep + 1
        do_sync = (gstep % sync_period == 0)
        tm = jax.tree_util.tree_map
        fast = tm(lambda p, u: p + u, params, updates)
        new_slow = tm(lambda s, f: s + slow_step_size * (f - s),
                      state.slow, fast)
        updates = tm(lambda ns, p, u: jnp.where(do_sync, ns - p, u),
                     new_slow, params, updates)
        slow = tm(lambda ns, s: jnp.where(do_sync, ns, s),
                  new_slow, state.slow)
        return updates, LookaheadState(inner_state, slow, gstep)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(learning_rate, sync_period: int = 6,
           slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """RAdam + LookAhead (reference training/ranger.py:163); multi_transform
    compatible (slow weights live in the optimizer state)."""
    return lookahead(optax.radam(learning_rate),
                     sync_period=sync_period,
                     slow_step_size=slow_step_size)


def optimize_style_vectors(
    net: RGINet,
    variables: dict,
    criterion: Callable[[jnp.ndarray, jnp.ndarray], tuple],
    img: jnp.ndarray,
    onehot: jnp.ndarray,
    *,
    steps: int = 150,
    lr: float = 1e-2,
    optimizer: str = "adam",
    init_style_vectors: jnp.ndarray | None = None,
):
    """Refine per-region style vectors to reconstruct `img`.

    Args:
      net/variables: the (frozen) RGI net.
      criterion: (recon, img) -> (loss, metrics) — a ReconCriterion.
      img: (1, S, S, 3) in [-1, 1]; onehot: (1, Hm, Wm, K).
      init_style_vectors: warm start; default = encoder output (the
        reference's initialization, optimization.py:335-338).

    Returns (style_vectors (1, K, 1280), per-step loss trace (steps,)).
    """
    if init_style_vectors is None:
        init_style_vectors, _ = net.apply(
            variables, img, onehot, method=RGINet.get_style_vectors)

    opts = {"adam": optax.adam, "sgd": optax.sgd,
            "sgdm": functools.partial(optax.sgd, momentum=0.9),
            "adamax": optax.adamax}
    tx = opts[optimizer](lr)

    def loss_fn(v, sv, img, onehot):
        codes = net.apply(v, sv, method=RGINet.cal_style_codes)
        recon, _, _ = net.apply(v, None, codes, onehot,
                                method=RGINet.gen_img)
        loss, _ = criterion(recon, img)
        return loss

    # variables/images are jit ARGS (closed-over weights would be baked into
    # the XLA program as constants — huge compile payloads at full size)
    @jax.jit
    def run(v, sv0, img, onehot):
        opt0 = tx.init(sv0)

        def step_fn(carry, _):
            sv, opt = carry
            loss, grads = jax.value_and_grad(loss_fn, argnums=1)(
                v, sv, img, onehot)
            updates, opt = tx.update(grads, opt, sv)
            sv = optax.apply_updates(sv, updates)
            return (sv, opt), loss

        (sv, _), losses = jax.lax.scan(step_fn, (sv0, opt0), None, length=steps)
        return sv, losses

    return run(variables, init_style_vectors, img, onehot)
