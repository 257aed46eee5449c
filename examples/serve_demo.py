"""Multi-client serving demo without checkpoints: tiny random model, stub
tokenizer, three concurrent streams with different language pairs through
the batched ServingEngine (beam search, per-slot KV caches, rolling
eviction).

    JAX_PLATFORMS=cpu python examples/serve_demo.py [--ticks 4]

Shows per-tick outputs per slot; one mid-run join and one early close
exercise the slot lifecycle.
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp  # noqa: E402

    from examples.stream_demo import tiny_model  # reuse the demo model
    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.serve.engine import ServingEngine

    ticks = (
        int(sys.argv[sys.argv.index("--ticks") + 1])
        if "--ticks" in sys.argv else 4
    )
    params, cfg = tiny_model()
    stream = StreamConfig(
        max_cache_frames=96, max_llm_cache_tokens=120, llm_cache_capacity=256
    )
    tok = StubTokenizer(cfg.llama.vocab_size, lo=10, hi=400)
    builders = {
        ("English", "German"): PromptBuilder(
            tok, cfg.tokens, "English", "German"
        ),
        ("English", "Chinese"): PromptBuilder(
            tok, cfg.tokens, "English", "Chinese"
        ),
    }
    eng = ServingEngine(
        params, cfg, stream, builders, pool_size=4, multiplier=1,
        max_new_tokens=8, dtype=jnp.float32, beam=2,
    )
    rng = np.random.RandomState(0)
    chunk = eng.chunk_samples

    s0 = eng.open_stream("alice", ("English", "German"))
    s1 = eng.open_stream("bob", ("English", "Chinese"))
    late = None
    for t in range(ticks):
        if t == 1:
            late = eng.open_stream("carol", ("English", "German"))
            print(f"[tick {t}] carol joins (slot {late})")
        for s in [s0, s1] + ([late] if late is not None else []):
            if s is not None and eng.slots[s].active:
                eng.push_audio(
                    s, rng.randn(chunk).astype(np.float32) * 0.1,
                    finished=(t == ticks - 1),
                )
        out = eng.tick()
        for slot, text in out.items():
            cid = eng.slots[slot].client_id
            print(f"[tick {t}] {cid}: {text[:60]!r}"
                  f" (cache={eng.slots[slot].cache_len})")
        if t == 2 and late is not None:
            print(f"[tick {t}] carol leaves")
            eng.close_stream(late)
            late = None
    print("done; slots:",
          [(s.client_id, s.done) for s in eng.slots if s.active])


if __name__ == "__main__":
    main()
