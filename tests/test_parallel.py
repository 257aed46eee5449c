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


def test_sanitize_spec_flagship_vocab():
    """The flagship vocab (128263 = 128256 + 7 added tokens) divides by no
    mesh axis; sanitize_spec must migrate or drop those axes so the
    production spec trees stay legal at 8B (caught by tools_memplan)."""
    from jax.sharding import PartitionSpec as P

    from infinisst_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(data=4, model=2)

    # embed (V, D): 'data' cannot tile V -> migrates to D alongside 'model'
    s = pmesh.sanitize_spec((128263, 4096), P("data", "model"), mesh)
    assert s[0] is None
    axes = s[1] if isinstance(s[1], tuple) else (s[1],)
    assert set(axes) == {"model", "data"}

    # lm_head (D, V): 'model' cannot tile V -> joins 'data' on D
    s = pmesh.sanitize_spec((4096, 128263), P("data", "model"), mesh)
    axes = s[0] if isinstance(s[0], tuple) else (s[0],)
    assert set(axes) == {"data", "model"} and s[1] is None

    # divisible dims pass through untouched
    s = pmesh.sanitize_spec((4096, 14336), P("data", "model"), mesh)
    assert s == P("data", "model")

    # axes of mesh size 1 are dropped, freeing the dim for migration
    mesh1 = pmesh.make_mesh(data=8, model=1)
    s = pmesh.sanitize_spec((128263, 4096), P("data", "model"), mesh1)
    assert s == P(None, "data")

    # no viable home: the axis is dropped (dim replicates)
    s = pmesh.sanitize_spec((3, 5), P("data", None), mesh)
    assert s == P(None, None)


def test_sanitized_sharding_lowers_at_flagship_shapes():
    """device_put-compatible: every sanitized flagship spec builds a legal
    NamedSharding (even tiling), incl. the odd-vocab embed and lm_head."""
    from jax.sharding import NamedSharding

    from infinisst_tpu.core.presets import flagship_config
    from infinisst_tpu.parallel import mesh as pmesh
    from tools_memplan import abstract_params

    cfg = flagship_config()
    shapes = abstract_params(cfg, jnp.bfloat16)
    for d, m in [(8, 1), (4, 2), (2, 4)]:
        mesh = pmesh.make_mesh(data=d, model=m)
        specs = pmesh.sanitize_specs(
            shapes, pmesh.model_param_specs(cfg, zero=d > 1), mesh
        )

        def check(sd, sp):
            sh = NamedSharding(mesh, sp)
            # raises if the tiling is uneven
            sh.shard_shape(sd.shape)

        jax.tree.map(
            check, shapes, specs,
            is_leaf=lambda x: isinstance(x, type(specs["llama"]["embed"])),
        )
