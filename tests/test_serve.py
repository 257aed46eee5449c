"""Batched multi-client serving engine test on the tiny model."""

import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.core.config import StreamConfig
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
from infinisst_tpu.serve.engine import ServingEngine

from tests.test_agent import CFG, small_special_tokens, tiny_params


@pytest.mark.slow
def test_engine_two_clients():
    cfg = CFG.replace(tokens=small_special_tokens())
    stream = StreamConfig(
        max_cache_frames=96, max_llm_cache_tokens=120, llm_cache_capacity=256
    )
    tok = StubTokenizer(512, lo=10, hi=400)
    builders = {
        ("English", "German"): PromptBuilder(
            tok, cfg.tokens, "English", "German"
        ),
        ("English", "Spanish"): PromptBuilder(
            tok, cfg.tokens, "English", "Spanish"
        ),
    }
    eng = ServingEngine(
        tiny_params(), cfg, stream, builders, pool_size=4, multiplier=1,
        max_new_tokens=8, dtype=jnp.float32,
    )
    s0 = eng.open_stream("c0", ("English", "German"))
    s1 = eng.open_stream("c1", ("English", "Spanish"))
    rng = np.random.RandomState(0)
    chunk = eng.chunk_samples

    # client 0 sends 3 chunks; client 1 joins at tick 2 with 2 chunks
    eng.push_audio(s0, rng.randn(chunk).astype(np.float32) * 0.1)
    out = eng.tick()
    assert s0 in out or eng.slots[s0].target_ids is not None

    eng.push_audio(s0, rng.randn(chunk).astype(np.float32) * 0.1)
    eng.push_audio(s1, rng.randn(chunk).astype(np.float32) * 0.1)
    out = eng.tick()
    # both slots processed in one batched tick
    assert eng.slots[s0].cache_len > 0 and eng.slots[s1].cache_len > 0

    eng.push_audio(s0, rng.randn(chunk).astype(np.float32) * 0.1,
                   finished=True)
    eng.push_audio(s1, rng.randn(chunk).astype(np.float32) * 0.1,
                   finished=True)
    out = eng.tick()
    assert eng.slots[s0].done and eng.slots[s1].done

    # idle tick is a no-op
    assert eng.tick() == {}

    # slots are reusable after close
    eng.close_stream(s0)
    s2 = eng.open_stream("c2", ("English", "German"))
    assert s2 == s0
    assert int(eng.dec_state.valid_len[s2]) == 0


@pytest.mark.slow
def test_engine_beam_pool():
    """beam>1 pooled serving: batched per-slot beam search + commit.  The
    beam-1 greedy winner at each step equals a pool-of-one beam=1 result;
    here we check the beam engine runs, respects slot isolation, and that
    a single-slot beam pool matches the single-stream agent's beam output
    on the same audio."""
    from tests.test_agent import make_agent

    cfg = CFG.replace(tokens=small_special_tokens())
    stream = StreamConfig(
        max_cache_frames=96, max_llm_cache_tokens=120, llm_cache_capacity=256
    )
    tok = StubTokenizer(512, lo=10, hi=400)
    builders = {
        ("English", "German"): PromptBuilder(
            tok, cfg.tokens, "English", "German"
        ),
    }
    params = tiny_params()
    eng = ServingEngine(
        params, cfg, stream, builders, pool_size=2, multiplier=1,
        max_new_tokens=8, dtype=jnp.float32, beam=2,
    )
    s0 = eng.open_stream("c0")
    s1 = eng.open_stream("c1")
    rng = np.random.RandomState(0)
    chunk = eng.chunk_samples
    a0 = rng.randn(2 * chunk).astype(np.float32) * 0.1
    a1 = rng.randn(2 * chunk).astype(np.float32) * 0.1

    for t in range(2):
        eng.push_audio(s0, a0[t * chunk: (t + 1) * chunk])
        eng.push_audio(s1, a1[t * chunk: (t + 1) * chunk])
        eng.tick()
    assert eng.slots[s0].cache_len > 0 and eng.slots[s1].cache_len > 0
    assert len(eng.slots[s0].target_ids) > 0

    # same audio in two slots must give identical outputs (slot isolation)
    eng2 = ServingEngine(
        params, cfg, stream, builders, pool_size=2, multiplier=1,
        max_new_tokens=8, dtype=jnp.float32, beam=2,
    )
    t0 = eng2.open_stream("d0")
    t1 = eng2.open_stream("d1")
    for t in range(2):
        eng2.push_audio(t0, a0[t * chunk: (t + 1) * chunk])
        eng2.push_audio(t1, a0[t * chunk: (t + 1) * chunk])
        eng2.tick()
    assert eng2.slots[t0].target_ids == eng2.slots[t1].target_ids
