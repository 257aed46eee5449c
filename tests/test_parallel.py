"""Multi-chip sharding tests on the 8-device virtual CPU mesh, and a
single-device training sanity check (loss decreases)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    logits, state = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_train_loss_decreases():
    from infinisst_tpu.core.presets import dryrun_config
    from infinisst_tpu.train import step as tstep
    from infinisst_tpu.models import adapter as A, llama as L, wav2vec2 as W

    cfg = dryrun_config()
    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama),
    }
    freeze = tstep.FreezeConfig()  # train everything
    tx = tstep.make_optimizer(
        tstep.OptimConfig(learning_rate=1e-3, warmup_steps=2, total_steps=50),
        params,
        freeze,
    )
    state = tstep.init_train_state(params, tx)

    B, n_frames = 2, 48
    n_samples = 399 + n_frames * 320
    sp = n_frames // 4
    rng = np.random.RandomState(0)
    ids = np.full((B, sp + 10), 7, np.int32)
    ids[:, 2 : 2 + sp] = 1008
    labels = np.where(np.arange(ids.shape[1])[None] >= sp + 4, ids, -100)
    batch = tstep.Batch(
        speech=jnp.asarray(rng.randn(B, n_samples).astype(np.float32) * 0.1),
        frame_lengths=jnp.full((B,), n_frames, jnp.int32),
        input_ids=jnp.asarray(ids),
        labels=jnp.asarray(labels.astype(np.int32)),
        attention_mask=jnp.ones((B, ids.shape[1]), jnp.int32),
        patch_mask=jnp.asarray(ids == 1008),
    )
    step_fn = jax.jit(
        tstep.make_train_step(cfg, tx, 48, 96, multiplier=1)
    )
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_stage1_freeze_keeps_llm_fixed():
    """Stage-1 freezing: llm body/embed/head must not change."""
    from infinisst_tpu.core.presets import dryrun_config
    from infinisst_tpu.train import step as tstep
    from infinisst_tpu.models import adapter as A, llama as L, wav2vec2 as W

    cfg = dryrun_config()
    k = jax.random.PRNGKey(1)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama),
    }
    tx = tstep.make_optimizer(
        tstep.OptimConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10),
        params,
        tstep.FreezeConfig.stage1(),
    )
    state = tstep.init_train_state(params, tx)
    B, n_frames = 1, 48
    sp = 12
    ids = np.full((B, sp + 8), 7, np.int32)
    ids[:, 2 : 2 + sp] = 1008
    labels = np.where(np.arange(ids.shape[1])[None] >= sp + 4, ids, -100)
    batch = tstep.Batch(
        speech=jnp.asarray(
            np.random.RandomState(0).randn(B, 399 + n_frames * 320)
            .astype(np.float32) * 0.1
        ),
        frame_lengths=jnp.full((B,), n_frames, jnp.int32),
        input_ids=jnp.asarray(ids),
        labels=jnp.asarray(labels.astype(np.int32)),
        attention_mask=jnp.ones((B, ids.shape[1]), jnp.int32),
        patch_mask=jnp.asarray(ids == 1008),
    )
    step_fn = jax.jit(tstep.make_train_step(cfg, tx, 48, 96))
    new_state, _ = step_fn(state, batch)
    # llama unchanged
    np.testing.assert_array_equal(
        np.asarray(new_state.params["llama"]["lm_head"]),
        np.asarray(params["llama"]["lm_head"]),
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.params["llama"]["layers"]["wq"]),
        np.asarray(params["llama"]["layers"]["wq"]),
    )
    # adapter trained
    assert not np.allclose(
        np.asarray(new_state.params["adapter"]["proj"]["w"]),
        np.asarray(params["adapter"]["proj"]["w"]),
    )
