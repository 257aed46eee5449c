"""Phase profiler for the streaming chunk step on real TPU.

Times each stage separately-compiled: encoder chunk, LLM prefill, beam
loop, commit replay, plus the fused agent step — to find where per-chunk
milliseconds go.  Run on the TPU host: python tools_profile.py
"""

import time

import numpy as np


def timeit(fn, args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
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

    cfg = bench_1chip_config()
    stream = StreamConfig()
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2, dtype),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter, dtype),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama, dtype),
    }
    m = 1
    chunk_frames = 48
    enc = init_encoder_state(
        cfg.w2v2.encoder_layers, 1, stream.max_cache_frames,
        cfg.w2v2.encoder_attention_heads, cfg.w2v2.head_dim, dtype,
    )
    dec = init_decoder_state(
        cfg.llama.num_layers, 1, stream.llm_cache_capacity,
        cfg.llama.num_kv_heads, cfg.llama.head_dim, dtype,
    )
    window = jnp.asarray(
        np.random.RandomState(0).randn(1, 399 + 2 * 15360).astype(np.float32)
    )
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size), cfg.tokens)
    prompt = builder.chunk_prompt(m, first=True)
    ids = jnp.asarray(prompt.ids)[None]

    # 1. encoder chunk
    enc_fn = jax.jit(
        lambda p, e, w: speech_llm.encode_chunk(
            p, cfg, e, w, chunk_frames, stream.max_cache_frames
        )
    )
    t = timeit(enc_fn, (params, enc, window))
    print(f"encoder chunk: {t*1e3:.2f} ms")
    speech, enc2 = enc_fn(params, enc, window)

    # 1b. conv frontend only
    conv_fn = jax.jit(lambda p, w: W._prep_frames(p["w2v2"], cfg.w2v2, w))
    t = timeit(conv_fn, (params, window))
    print(f"  conv frontend: {t*1e3:.2f} ms")

    # 2. prefill
    def prefill(p, d, w, e):
        lg, st = speech_llm.prefill_chunk(
            p, cfg, speech_llm.StreamState(e, d), w, ids,
            prompt.patch_start, chunk_frames, stream.max_cache_frames,
        )
        return lg, st

    pre_fn = jax.jit(prefill)
    t = timeit(pre_fn, (params, dec, window, enc))
    print(f"encoder+prefill: {t*1e3:.2f} ms")
    logits, st = pre_fn(params, dec, window, enc)

    # 3. beam search alone
    spec = beam_mod.BeamSpec(
        beam=4, max_new_tokens=10, eos_id=cfg.tokens.eos,
        pad_id=cfg.tokens.pad, no_repeat_ngram_size=5,
        repetition_penalty=1.2,
    )
    hist = jnp.zeros((100,), jnp.int32)

    def beam(p, d, lg):
        return beam_mod.beam_search(
            p["llama"], cfg.llama, d, lg[0, -1], ids[0],
            jnp.asarray(ids.shape[1], jnp.int32), hist,
            jnp.asarray(0, jnp.int32), spec, encoder_ngram_size=5,
        )

    beam_fn = jax.jit(beam)
    t = timeit(beam_fn, (params, st.decoder, logits))
    res = beam_fn(params, st.decoder, logits)
    print(f"beam search (steps={int(res.steps)}): {t*1e3:.2f} ms"
          f"  -> {t*1e3/max(int(res.steps),1):.2f} ms/step")

    # 3b. single beam token step
    gen_k = jnp.zeros(
        (cfg.llama.num_layers, 4, 10, cfg.llama.num_kv_heads,
         cfg.llama.head_dim), dtype,
    )
    xe = jnp.zeros((4, 1, cfg.llama.hidden_size), dtype)
    tok_fn = jax.jit(
        lambda p, d, gk, gv, gl, x: L.beam_token_step(
            p["llama"], cfg.llama, d, gk, gv, gl, x
        )
    )
    t = timeit(tok_fn, (params, st.decoder, gen_k, gen_k, jnp.asarray(0), xe))
    print(f"  beam token step alone: {t*1e3:.2f} ms")

    # 4. commit
    commit_fn = jax.jit(
        lambda p, d, tb, nv: speech_llm.commit_tokens(p, cfg, d, tb, nv)
    )
    tokens = jnp.zeros((1, 10), jnp.int32)
    t = timeit(commit_fn, (params, st.decoder, tokens, jnp.asarray([5])))
    print(f"commit replay: {t*1e3:.2f} ms")

    # 5. eviction
    evict_fn = jax.jit(L.evict_cache)
    t = timeit(evict_fn, (st.decoder, jnp.asarray([500]), jnp.asarray(25)))
    print(f"evict: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
