"""8B stage-2 memory plan on a virtual 8-device mesh (no hardware needed).

Proves (or refutes) that the stage-2 recipe — frozen w2v2, bf16 params,
remat, ZeRO-sharded optimizer state (ref: /root/reference/train/main.py:
170-174, DeepSpeed ZeRO-2 + CPU-offload on 8 GPUs) — fits Llama-3.1-8B +
wav2vec2-large on a v5e-8 pod slice (16 GiB HBM/chip) under this repo's
production GSPMD shardings (parallel/mesh.py), WITHOUT running a step:

- the full train step is AOT-lowered and compiled per candidate mesh
  (dp8/ZeRO, dp4x tp2, dp2x tp4) on the 8-virtual-CPU backend, entirely
  from ShapeDtypeStructs — no 8B array is ever materialised;
- ``compiled.memory_analysis()`` reports per-device argument / output /
  temp / donated-alias bytes, from which per-chip HBM demand =
  arguments + temps + outputs - donated aliases (state is donated);
- optimizer-state shardings are derived exactly as production derives
  them: AOT-compile ``init_train_state`` on the sharded params and read
  the compiled OUTPUT shardings (tx.init inherits ZeRO layout from the
  param shardings — verified empirically, tests/test_parallel.py).

Writes docs/memplan_8b.json with one row per mesh and a recommendation.
Run: JAX_PLATFORMS=cpu python tools_memplan.py  (~minutes: three 8B
compiles on CPU).  tests/test_memplan.py runs the same planner on the
dryrun config and pins that the requested shardings survive lowering.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force_cpu(n: int = 8) -> None:
    # the environment pins JAX_PLATFORMS to the axon TPU tunnel; the
    # planner is a pure compile-time analysis and must stay on host CPU.
    # jax.config.update works any time before backend initialisation
    # (same recipe as tests/conftest.py — env vars alone can be too late).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)


def abstract_params(cfg, dtype):
    """ShapeDtypeStruct tree of the full speech-LLM parameter set —
    eval_shape over the real init fns, so shapes can never drift from the
    models' actual layouts."""
    import jax

    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W

    k = jax.random.PRNGKey(0)
    return jax.eval_shape(
        lambda: {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(
                jax.random.fold_in(k, 1), cfg.adapter, dtype
            ),
            "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama, dtype),
        }
    )


def abstract_batch(cfg, rows_per_dp: int, data_ax: int, audio_s: float,
                   seq_len: int, mesh):
    """Batch ShapeDtypeStructs at a production-shaped stage-2 point,
    sharded over 'data'.  Defaults mirror TrainerArgs: token budget 1800
    / bsz_sent 2 -> ~2 rows per data shard of ~20 s audio (250 speech
    tokens) + transcript, padded to ``seq_len``."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from infinisst_tpu.core.config import CONV_LEFT_CONTEXT, SAMPLES_PER_FRAME
    from infinisst_tpu.train.step import Batch

    B = rows_per_dp * data_ax
    n_frames = int(audio_s * 50)  # 20 ms frames
    n_samples = CONV_LEFT_CONTEXT + n_frames * SAMPLES_PER_FRAME

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(
            shape, dtype,
            sharding=NamedSharding(
                mesh, P("data", *([None] * (len(shape) - 1)))
            ),
        )

    return Batch(
        speech=sds((B, n_samples), jnp.float32),
        frame_lengths=sds((B,), jnp.int32),
        input_ids=sds((B, seq_len), jnp.int32),
        labels=sds((B, seq_len), jnp.int32),
        attention_mask=sds((B, seq_len), jnp.int32),
        patch_mask=sds((B, seq_len), jnp.bool_),
    )


def plan_mesh(cfg, data_ax: int, model_ax: int, *, dtype=None,
              rows_per_dp: int = 2, audio_s: float = 20.0,
              seq_len: int = 384, multiplier: int = 4,
              block_frames: int = 48, max_cache_frames: int = 576,
              stage: int = 2):
    """AOT-compile the stage-``stage`` train step on a (data_ax x model_ax)
    mesh and return the memory analysis + the compiled input shardings of
    the largest parameter leaves (to pin no-fallback-to-replicated).

    stage 2 = frozen w2v2 (adapter + LLM trained, the release recipe);
    stage 1 = frozen LLM incl. embed/head (adapter + w2v2 trained,
    ref: train/main.py:60-76 llm_freeze) — much lighter optimizer state
    (no Adam moments for the 8B decoder), so it fits meshes stage 2
    cannot."""
    import jax
    import jax.numpy as jnp

    from infinisst_tpu.parallel import mesh as pmesh
    from infinisst_tpu.train import step as tstep

    if dtype is None:
        dtype = jnp.bfloat16
    mesh = pmesh.make_mesh(data=data_ax, model=model_ax)
    zero = data_ax > 1
    shapes = abstract_params(cfg, dtype)
    # sanitize like shard_params does in production: the flagship's odd
    # vocab (128263) forces axis migration on embed/lm_head
    specs = pmesh.sanitize_specs(
        shapes, pmesh.model_param_specs(cfg, zero=zero), mesh
    )
    shardings = pmesh.tree_shardings(mesh, specs)
    params = jax.tree.map(
        lambda sd, sh: jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=sh),
        shapes,
        shardings,
    )

    freeze = (tstep.FreezeConfig.stage1() if stage == 1
              else tstep.FreezeConfig.stage2())
    tx = tstep.make_optimizer(
        tstep.OptimConfig(total_steps=100_000, warmup_steps=1000),
        params, freeze,
    )

    # opt-state shardings as production materialises them: eager tx.init
    # inherits each zeros_like's sharding from its param.  (AOT-compiling
    # init_train_state does NOT reproduce this — zeros have no data
    # dependence on the params, so GSPMD replicates them.)  mu/nu leaves
    # are exact shape copies of their params; match by shape.
    from jax.sharding import NamedSharding, PartitionSpec as P

    shape_to_sh = {}
    for sd, sh in zip(jax.tree.leaves(params), jax.tree.leaves(shardings)):
        shape_to_sh.setdefault(sd.shape, sh)
    replicated = NamedSharding(mesh, P())
    state_shapes = jax.eval_shape(lambda p: tstep.init_train_state(p, tx),
                                  params)
    state = jax.tree.map(
        lambda sd: jax.ShapeDtypeStruct(
            sd.shape, sd.dtype,
            sharding=shape_to_sh.get(sd.shape, replicated),
        ),
        state_shapes,
    )

    batch = abstract_batch(cfg, rows_per_dp, data_ax, audio_s, seq_len, mesh)
    train_step = tstep.make_train_step(
        cfg, tx, block_frames=block_frames,
        max_cache_frames=max_cache_frames, multiplier=multiplier,
        freeze=freeze, remat=True,
    )
    t0 = time.time()
    compiled = jax.jit(train_step, donate_argnums=(0,)).lower(
        state, batch
    ).compile()
    compile_s = time.time() - t0
    ma = compiled.memory_analysis()

    # per-chip HBM demand: donated state aliases in-place (alias bytes
    # counted once), plus live temps and non-aliased outputs
    args_b = int(ma.argument_size_in_bytes)
    out_b = int(ma.output_size_in_bytes)
    temp_b = int(ma.temp_size_in_bytes)
    alias_b = int(ma.alias_size_in_bytes)
    peak_b = args_b + temp_b + max(out_b - alias_b, 0)

    # compiled input shardings of the heavy leaves: did the requested
    # specs survive lowering, or did GSPMD fall back to replicated?
    in_sh = compiled.input_shardings[0]
    state_in = in_sh[0] if isinstance(in_sh, (tuple, list)) else in_sh

    def leaf_spec(path):
        node = state_in.params if hasattr(state_in, "params") else (
            state_in[0] if isinstance(state_in, (tuple, list)) else state_in
        )
        for k in path:
            node = node[k]
        return getattr(node, "spec", None)

    heavy = {
        "llama.lm_head": leaf_spec(("llama", "lm_head")),
        "llama.embed": leaf_spec(("llama", "embed")),
        "llama.layers.w_up": leaf_spec(("llama", "layers", "w_up")),
        "llama.layers.wq": leaf_spec(("llama", "layers", "wq")),
    }
    return {
        "stage": stage,
        "mesh": f"dp{data_ax}xtp{model_ax}",
        "zero": zero,
        "global_batch_rows": rows_per_dp * data_ax,
        "audio_s_per_row": audio_s,
        "seq_len": seq_len,
        "multiplier": multiplier,
        "param_dtype": str(jnp.dtype(dtype).name),
        "argument_bytes_per_device": args_b,
        "output_bytes_per_device": out_b,
        "temp_bytes_per_device": temp_b,
        "donated_alias_bytes_per_device": alias_b,
        "peak_hbm_bytes_per_device": peak_b,
        "peak_hbm_gib_per_device": round(peak_b / 2**30, 3),
        "fits_v5e_16gib": peak_b < 16 * 2**30,
        "compile_s": round(compile_s, 1),
        "heavy_leaf_specs": {k: str(v) for k, v in heavy.items()},
    }


def plan_serve_pool(cfg, pool_size: int, *, beam: int = 4):
    """Single-chip HBM plan for the 8B-int8 serving pool (the flagship
    serving config: ServingEngine, W8A8 projections + int8 head, beam-4).

    The engine is constructed for real on the CPU backend (its state
    buffers — encoder ring, decoder cache, windows — are the pool-scaled
    allocations being planned), but the PARAMETERS stay abstract
    (eval_shape over the real init fns) and the fused tick step is
    AOT-lowered from ShapeDtypeStructs, so no 8B weight array is ever
    materialised.  peak = args + temps + (outputs - donated aliases):
    enc/dec/windows are donated (argnums 1-3), params are not.
    """
    import jax
    import jax.numpy as jnp

    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import wav2vec2 as W
    from infinisst_tpu.models.quant import init_quantized_llama
    from infinisst_tpu.serve.engine import ServingEngine

    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    params = jax.eval_shape(
        lambda: {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(
                jax.random.fold_in(k, 1), cfg.adapter, dtype
            ),
            "llama": init_quantized_llama(
                jax.random.fold_in(k, 2), cfg.llama,
                act_int8=True, lm_head_int8=True,
            ),
        }
    )
    tok = StubTokenizer(cfg.llama.vocab_size)
    builders = {("English", "German"): PromptBuilder(tok, cfg.tokens)}
    stream = StreamConfig()
    eng = ServingEngine(
        params, cfg, stream, builders, pool_size=pool_size, dtype=dtype,
        beam=beam,
    )
    B = pool_size

    def aval(x):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
            x,
        )

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt)

    call_avals = (
        params, aval(eng.enc_state), aval(eng.dec_state), aval(eng.windows),
        sds((B, eng.chunk_samples), jnp.int16),
        sds((B, eng._S), jnp.int32), sds((B, eng._S), jnp.int32),
        sds((B,), jnp.int32), sds((B,), jnp.bool_),
        sds((B, stream.no_repeat_ngram_lookback), jnp.int32),
        sds((B,), jnp.int32), sds((B,), jnp.int32), sds((B,), jnp.int32),
        sds((B,), jnp.int32),
    )
    t0 = time.time()
    compiled = eng._step_fn.lower(*call_avals).compile()
    compile_s = time.time() - t0
    ma = compiled.memory_analysis()
    args_b = int(ma.argument_size_in_bytes)
    out_b = int(ma.output_size_in_bytes)
    temp_b = int(ma.temp_size_in_bytes)
    alias_b = int(ma.alias_size_in_bytes)
    peak_b = args_b + temp_b + max(out_b - alias_b, 0)
    return {
        "recipe": f"serve pool={pool_size} beam={beam} 8B-int8 (W8A8 + "
                  "int8 head), bf16 caches",
        "pool_size": pool_size,
        "beam": beam,
        "llm_cache_capacity": stream.llm_cache_capacity,
        "max_cache_frames": stream.max_cache_frames,
        "argument_bytes": args_b,
        "output_bytes": out_b,
        "temp_bytes": temp_b,
        "donated_alias_bytes": alias_b,
        "peak_hbm_bytes": peak_b,
        "peak_hbm_gib": round(peak_b / 2**30, 3),
        "fits_v5e_16gib": peak_b < 16 * 2**30,
        "compile_s": round(compile_s, 1),
    }


def main():
    _force_cpu(8)
    from infinisst_tpu.core.presets import flagship_config

    cfg = flagship_config()
    meshes = [(8, 1), (4, 2), (2, 4)]
    if "--quick" in sys.argv:  # smoke: dryrun-size model, all meshes
        from infinisst_tpu.core.presets import dryrun_config

        cfg = dryrun_config()
    rows = []
    for d, m in meshes:
        print(f"[memplan] compiling stage-2 step on dp{d}xtp{m} ...",
              flush=True)
        row = plan_mesh(cfg, d, m)
        print(json.dumps(row), flush=True)
        rows.append(row)

    fitting = [r for r in rows if r["fits_v5e_16gib"]]
    # prefer the most data-parallel fitting mesh (fewest TP collectives on
    # the training critical path; ZeRO already shards state)
    rec = max(
        fitting, key=lambda r: int(r["mesh"][2 : r["mesh"].index("x")])
    ) if fitting else None

    # stage 1 (frozen LLM): no Adam moments for the decoder, so start from
    # the most data-parallel mesh and stop at the first fit
    stage1_rows = []
    for d, m in meshes:
        print(f"[memplan] compiling stage-1 step on dp{d}xtp{m} ...",
              flush=True)
        row = plan_mesh(cfg, d, m, stage=1)
        print(json.dumps(row), flush=True)
        stage1_rows.append(row)
        if row["fits_v5e_16gib"]:
            break
    s1_fit = [r for r in stage1_rows if r["fits_v5e_16gib"]]

    serve_rows = []
    if "--no-serve" not in sys.argv:
        for pool in (8, 16):
            print(f"[memplan] compiling serve tick, pool={pool} ...",
                  flush=True)
            srow = plan_serve_pool(cfg, pool)
            print(json.dumps(srow), flush=True)
            serve_rows.append(srow)

    out = {
        "model": "flagship-8b" if "--quick" not in sys.argv else "dryrun",
        "recipe": "stage2: frozen w2v2, bf16 params, remat, ZeRO opt state",
        "hbm_budget_gib_per_chip": 16,
        "meshes": rows,
        "recommendation": rec["mesh"] if rec else
        "NONE FIT — revisit shardings",
        "stage1_meshes": stage1_rows,
        "stage1_recommendation": s1_fit[0]["mesh"] if s1_fit else
        "NONE FIT — revisit shardings",
        "serve_pools": serve_rows,
        "serve_caveat": (
            "serve rows are compiled on the CPU backend, whose int8 "
            "lowering MATERIALISES dequantised bf16 weight temps that "
            "the TPU backend fuses into the matmuls (temp_bytes ~10/16 "
            "GB at pool 8/16 tracks ~2 bytes/param) — these peaks are "
            "upper bounds, and the dev TPU chip has executed the "
            "pool-8/16 ticks (hw_rows_r4: 201/223 tok/s/chip).  Treat "
            "fits_v5e_16gib=false on serve rows as 'not proven to fit', "
            "not 'proven not to fit'."
        ),
        "caveat": (
            "compiled memory_analysis() on the virtual mesh: accounts "
            "arguments/temps/outputs/donated aliases but NOT allocator "
            "fragmentation or runtime scratch; margins under ~2 GiB "
            "should be treated as conditional until executed on real "
            "multi-chip hardware"
        ),
    }
    path = "docs/memplan_8b.json"
    if "--quick" not in sys.argv:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[memplan] wrote {path}: recommend {out['recommendation']}")
    else:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
