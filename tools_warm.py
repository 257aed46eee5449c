"""Pre-compile the production graph set (fused chunk steps, eviction,
optionally the serving tick) in one process.

    python tools_warm.py [--model 8b|bench] [--mults 1,2,3,4] [--serve]

Use before serving/eval sessions so every per-multiplier variant is
compiled up front instead of stalling the first real chunk of each shape.
Caveat for this dev host (see CLAUDE.md): the large fused graph does not
reliably persist to .jax_cache/ across processes on the axon backend, so
warm in the SAME long-lived process that will serve; small/medium graphs
(eviction, 1.5B-class models, CPU tests) do persist.
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from infinisst_tpu.agents.infinisst import InfiniSSTAgent, InfiniSSTOptions
    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W

    model = sys.argv[sys.argv.index("--model") + 1] if "--model" in sys.argv else "8b"
    mults = [
        int(m) for m in (
            sys.argv[sys.argv.index("--mults") + 1] if "--mults" in sys.argv
            else "1"
        ).split(",")
    ]

    k = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    if model == "8b":
        from infinisst_tpu.core.presets import flagship_config
        from infinisst_tpu.models.quant import init_quantized_llama

        cfg = flagship_config()
        params = {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
            "llama": init_quantized_llama(
                jax.random.fold_in(k, 2), cfg.llama, act_int8=True,
                lm_head_int8=True,
            ),
        }
    else:
        from infinisst_tpu.core.presets import bench_1chip_config

        cfg = bench_1chip_config()
        params = {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
            "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama, dtype),
        }

    stream = StreamConfig()
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size), cfg.tokens)
    rng = np.random.RandomState(0)
    for m in mults:
        t0 = time.perf_counter()
        agent = InfiniSSTAgent(
            params, cfg, stream,
            builder,
            InfiniSSTOptions(
                latency_multiplier=m, beam=4,
                max_llm_cache_size=stream.max_llm_cache_tokens,
            ),
            param_dtype=dtype,
        )
        # first + later chunk variants compile on the first two pushes
        for _ in range(2):
            agent.push(
                rng.randn(agent.chunk_samples).astype(np.float32) * 0.1
            )
        jax.block_until_ready(agent.dec_state.k)
        print(f"m={m}: warmed in {time.perf_counter()-t0:.1f}s", flush=True)

    if "--serve" in sys.argv:
        from infinisst_tpu.serve.engine import ServingEngine

        t0 = time.perf_counter()
        eng = ServingEngine(
            params, cfg, stream,
            {("English", "German"): builder}, pool_size=8, multiplier=1,
            dtype=dtype, beam=4,
        )
        s = eng.open_stream("warm")
        eng.push_audio(s, rng.randn(eng.chunk_samples).astype(np.float32) * 0.1)
        eng.tick()
        eng.push_audio(s, rng.randn(eng.chunk_samples).astype(np.float32) * 0.1)
        eng.tick()
        jax.block_until_ready(eng.dec_state.k)
        print(f"serve pool-8: warmed in {time.perf_counter()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
