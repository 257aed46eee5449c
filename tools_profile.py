"""Phase profiler for the streaming chunk step on real TPU.

Times each stage separately-compiled: encoder chunk, LLM prefill, beam
loop, commit replay, plus eviction — to find where per-chunk milliseconds
go.  Run on the TPU host:

    python tools_profile.py [--model 8b] [--beam N] [--steps N]

Inputs are varied per iteration (the axon dev backend memoizes executions
with identical (executable, inputs); constant-input timing reads ~0).
"""

import sys
import time

import numpy as np


def timeit(fn, make_args, n=10, warmup=2):
    import jax

    for i in range(warmup):
        out = fn(*make_args(i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*make_args(warmup + i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.core.presets import bench_1chip_config
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.decode import beam as beam_mod
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import speech_llm
    from infinisst_tpu.models import wav2vec2 as W
    from infinisst_tpu.streaming.state import (
        init_decoder_state,
        init_encoder_state,
    )

    model = sys.argv[sys.argv.index("--model") + 1] if "--model" in sys.argv else "bench"
    beam_n = int(sys.argv[sys.argv.index("--beam") + 1]) if "--beam" in sys.argv else 4
    mult = int(sys.argv[sys.argv.index("--mult") + 1]) if "--mult" in sys.argv else 1
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    stream = StreamConfig()
    if model == "8b":
        from infinisst_tpu.core.presets import flagship_config
        from infinisst_tpu.models.quant import init_quantized_llama

        cfg = flagship_config()
        # default True to match bench.py's benchmarked configuration
        # (bench opts out with --no-act-int8; same convention here)
        act_int8 = "--no-act-int8" not in sys.argv
        params = {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
            "llama": init_quantized_llama(
                jax.random.fold_in(k, 2), cfg.llama,
                act_int8=act_int8,
                lm_head_int8="--bf16-head" not in sys.argv,
            ),
        }
    else:
        cfg = bench_1chip_config()
        params = {
            "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
            "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
            "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama, dtype),
        }
    m = mult
    chunk_frames = 48 * m
    enc = init_encoder_state(
        cfg.w2v2.encoder_layers, 1, stream.max_cache_frames,
        cfg.w2v2.encoder_attention_heads, cfg.w2v2.head_dim, dtype,
    )
    dec = init_decoder_state(
        cfg.llama.num_layers, 1, stream.llm_cache_capacity,
        cfg.llama.num_kv_heads, cfg.llama.head_dim, dtype,
    )
    rng = np.random.RandomState(0)
    windows = [
        jnp.asarray(rng.randn(1, 399 + 2 * 15360 * m).astype(np.float32) * 0.1)
        for _ in range(16)
    ]
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size), cfg.tokens)
    prompt = builder.chunk_prompt(m, first=True)
    ids = jnp.asarray(prompt.ids)[None]

    # 1. encoder chunk
    enc_fn = jax.jit(
        lambda p, e, w: speech_llm.encode_chunk(
            p, cfg, e, w, chunk_frames, stream.max_cache_frames
        )
    )
    t = timeit(enc_fn, lambda i: (params, enc, windows[i % 16]))
    print(f"encoder chunk: {t*1e3:.2f} ms", flush=True)

    # 2. prefill (encoder + splice + LLM forward over the prompt)
    def prefill(p, d, w, e):
        lg, st = speech_llm.prefill_chunk(
            p, cfg, speech_llm.StreamState(e, d), w, ids,
            prompt.patch_start, chunk_frames, stream.max_cache_frames,
        )
        return lg, st

    pre_fn = jax.jit(prefill)
    t = timeit(pre_fn, lambda i: (params, dec, windows[i % 16], enc))
    print(f"encoder+prefill: {t*1e3:.2f} ms", flush=True)
    logits, st = pre_fn(params, dec, windows[0], enc)

    # 3. beam search alone (vary first_logits to defeat memoization)
    spec = beam_mod.BeamSpec(
        beam=beam_n, max_new_tokens=10 * m, eos_id=cfg.tokens.eos,
        pad_id=cfg.tokens.pad, no_repeat_ngram_size=5,
        repetition_penalty=1.2,
    )
    hist = jnp.zeros((100,), jnp.int32)

    def beam(p, d, lg):
        return beam_mod.beam_search(
            p["llama"], cfg.llama, d, lg, ids[0],
            jnp.asarray(ids.shape[1], jnp.int32), hist,
            jnp.asarray(0, jnp.int32), spec, encoder_ngram_size=5,
        )

    beam_fn = jax.jit(beam)
    lgs = [
        logits[0, -1] + jnp.asarray(rng.randn(*logits[0, -1].shape) * 0.01,
                                    logits.dtype)
        for _ in range(16)
    ]
    t = timeit(beam_fn, lambda i: (params, st.decoder, lgs[i % 16]))
    res = beam_fn(params, st.decoder, lgs[0])
    print(
        f"beam search (steps={int(res.steps)}): {t*1e3:.2f} ms"
        f"  -> {t*1e3/max(int(res.steps),1):.2f} ms/step", flush=True,
    )

    # 3b. single beam token step
    G = 10 * m
    gen_k = jnp.zeros(
        (cfg.llama.num_layers, beam_n, G, cfg.llama.num_kv_heads,
         cfg.llama.head_dim), dtype,
    )
    xes = [
        jnp.asarray(rng.randn(beam_n, 1, cfg.llama.hidden_size) * 0.02, dtype)
        for _ in range(16)
    ]
    tok_fn = jax.jit(
        lambda p, d, gk, gv, gl, x: L.beam_token_step(
            p["llama"], cfg.llama, d, gk, gv, gl, x
        )
    )
    t = timeit(
        tok_fn,
        lambda i: (params, st.decoder, gen_k, gen_k, jnp.asarray(0),
                   xes[i % 16]),
    )
    print(f"  beam token step alone: {t*1e3:.2f} ms", flush=True)

    # 3c. lm_head matmul alone at (beam, D)
    from infinisst_tpu.models.quant import mm

    head_fn = jax.jit(lambda p, y: mm(y, p["llama"]["lm_head"]))
    ys = [jnp.asarray(rng.randn(beam_n, cfg.llama.hidden_size) * 0.02, dtype)
          for _ in range(16)]
    t = timeit(head_fn, lambda i: (params, ys[i % 16]))
    print(f"  lm_head matmul alone: {t*1e3:.2f} ms", flush=True)

    # 3d. logits processors + select (host of the beam step besides fwd)
    def procs(lg):
        scores = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        return jnp.argmax(scores), scores.min()

    proc_fn = jax.jit(procs)
    blg = [jnp.tile(l[None], (beam_n, 1)) for l in lgs]
    t = timeit(proc_fn, lambda i: (blg[i % 16],))
    print(f"  log_softmax+argmax alone: {t*1e3:.2f} ms", flush=True)

    # 4. commit
    commit_fn = jax.jit(
        lambda p, d, tb, nv: speech_llm.commit_tokens(p, cfg, d, tb, nv)
    )
    toks = [jnp.asarray(rng.randint(10, 500, (1, 10)), jnp.int32)
            for _ in range(16)]
    t = timeit(
        commit_fn,
        lambda i: (params, st.decoder, toks[i % 16], jnp.asarray([5])),
    )
    print(f"commit replay: {t*1e3:.2f} ms", flush=True)

    # 5. eviction
    evict_fn = jax.jit(L.evict_cache)
    keeps = [jnp.asarray([500 + i], jnp.int32) for i in range(16)]
    t = timeit(
        evict_fn, lambda i: (st.decoder, keeps[i % 16], jnp.asarray(25))
    )
    print(f"evict: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
