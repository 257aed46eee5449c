"""Drive the streaming agent through its public API on synthetic audio.

Usage: JAX_PLATFORMS=cpu python examples/stream_demo.py [--chunks N] [--multiplier M]

With no real checkpoint this uses a tiny random model + stub tokenizer, so
the "translations" are nonsense tokens — the point is to exercise the full
streaming loop (chunked encode, splice, prefill, beam search, commit,
eviction) exactly as a SimulEval run would.
"""

import argparse
import sys
from time import perf_counter

import numpy as np


def tiny_model(seed: int = 0):
    """Tiny random model + config for checkpoint-free demos."""
    import jax

    from infinisst_tpu.core.config import SpecialTokens, tiny_model_config
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W

    vocab = 512
    cfg = tiny_model_config(vocab_size=vocab).replace(
        tokens=SpecialTokens(
            bos=500, eot=501, eos=501, start_header=502, end_header=503,
            pad=504, user=505, assistant=506, newline2=507, sp_patch=508,
            sp_start=509, sp_end=510, latency=(511, 511, 511, 511),
        )
    )
    k = jax.random.PRNGKey(seed)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama),
    }
    return params, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=5)
    ap.add_argument("--multiplier", type=int, default=1)
    ap.add_argument("--max-llm-cache-size", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    # speculative greedy decode (beam is ignored when set); --spec-head-vocab
    # drives the shortlist draft head (exact either way)
    ap.add_argument("--speculative", action="store_true")
    ap.add_argument("--spec-draft-layers", type=int, default=1)
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--spec-head-vocab", type=int, default=0)
    # truncated-SVD low-rank draft head built from the demo model's own
    # lm_head at init (exact; acceptance-only cost)
    ap.add_argument("--spec-lowrank-rank", type=int, default=0)
    # speculative BEAM search (exact beam_search winner; needs beam > 1)
    ap.add_argument("--spec-beam", action="store_true")
    # sampling decode; combined with --speculative it runs speculative
    # SAMPLING (exact in distribution, decode/speculative.py)
    ap.add_argument("--do-sample", action="store_true")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top-k", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from infinisst_tpu.agents.infinisst import InfiniSSTAgent, InfiniSSTOptions
    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer

    vocab = 512
    params, cfg = tiny_model(args.seed)
    stream = StreamConfig(
        max_cache_frames=96,
        max_llm_cache_tokens=args.max_llm_cache_size,
        llm_cache_capacity=256,
    )
    builder = PromptBuilder(StubTokenizer(vocab, lo=10, hi=400), cfg.tokens)
    opts = InfiniSSTOptions(
        latency_multiplier=args.multiplier,
        beam=2,
        max_llm_cache_size=args.max_llm_cache_size,
        no_repeat_ngram_lookback=32,
        rtf_timing=True,
        speculative=args.speculative,
        spec_draft_layers=args.spec_draft_layers,
        spec_k=args.spec_k,
        spec_head_vocab=args.spec_head_vocab,
        spec_lowrank_rank=args.spec_lowrank_rank,
        spec_beam=args.spec_beam,
        do_sample=args.do_sample,
        temperature=args.temperature,
        top_k=args.top_k,
    )
    agent = InfiniSSTAgent(params, cfg, stream, builder, opts,
                           param_dtype=jnp.float32)

    rng = np.random.RandomState(args.seed)
    chunk = agent.chunk_samples
    print(f"chunk = {chunk} samples ({chunk/16000:.2f}s), "
          f"beam={opts.beam}, m={args.multiplier}")
    t_start = perf_counter()
    for i in range(args.chunks):
        finished = i == args.chunks - 1
        audio = rng.randn(chunk).astype(np.float32) * 0.1
        t0 = perf_counter()
        act = agent.push(audio, finished=finished)
        dt = perf_counter() - t0
        kind = "READ " if act.is_read() else "WRITE"
        content = "" if act.is_read() else act.content
        print(f"[chunk {i}] {kind} ({dt:.2f}s) llm_cache={agent.llm_cache_len} "
              f"enc_frames={int(agent.enc_state.n_frames[0])} :: {content[:80]}")
    total_audio = args.chunks * chunk / 16000
    wall = perf_counter() - t_start
    print(f"done: {total_audio:.1f}s audio in {wall:.1f}s wall "
          f"(RTF={wall/total_audio:.2f}, incl. compile)")
    print(f"final transcript ids: {len(agent.states.target_ids)} tokens")
    assert not act.is_read() and act.finished, "final action must finish"
    return 0


if __name__ == "__main__":
    sys.exit(main())
