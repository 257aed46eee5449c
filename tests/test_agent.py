"""End-to-end InfiniSST agent smoke test on a tiny random model: stream
synthetic audio through the policy loop, verify actions, bounded cache, and
eviction bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.agents.base import AgentStates
from infinisst_tpu.agents.infinisst import InfiniSSTAgent, InfiniSSTOptions
from infinisst_tpu.core.config import (
    StreamConfig,
    tiny_model_config,
)
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
from infinisst_tpu.models import adapter as A
from infinisst_tpu.models import llama as L
from infinisst_tpu.models import wav2vec2 as W

VOCAB = 512
CFG = tiny_model_config(vocab_size=VOCAB)


def tiny_params():
    k = jax.random.PRNGKey(0)
    return {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), CFG.w2v2),
        "adapter": A.init_params(jax.random.fold_in(k, 1), CFG.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), CFG.llama),
    }


def small_special_tokens():
    """Token ids that fit the tiny vocab."""
    from infinisst_tpu.core.config import SpecialTokens

    return SpecialTokens(
        bos=500, eot=501, eos=501, start_header=502, end_header=503,
        pad=504, user=505, assistant=506, newline2=507, sp_patch=508,
        sp_start=509, sp_end=510, latency=(511, 511, 511, 511),
    )


def make_agent(multiplier=1, max_llm_cache_size=120, capacity=256, **opt_kw):
    cfg = CFG.replace(tokens=small_special_tokens())
    stream = StreamConfig(
        max_cache_frames=96,
        max_llm_cache_tokens=max_llm_cache_size,
        llm_cache_capacity=capacity,
    )
    tok = StubTokenizer(vocab_size=VOCAB, lo=10, hi=400)
    builder = PromptBuilder(tok, cfg.tokens)
    opts = InfiniSSTOptions(
        latency_multiplier=multiplier,
        beam=2,
        max_llm_cache_size=max_llm_cache_size,
        no_repeat_ngram_lookback=32,
        **opt_kw,
    )
    return InfiniSSTAgent(
        tiny_params(), cfg, stream, builder, opts, param_dtype=jnp.float32
    )


@pytest.mark.slow
def test_agent_stream():
    agent = make_agent()
    rng = np.random.RandomState(0)
    chunk = agent.chunk_samples

    n_chunks = 6
    wrote = 0
    for i in range(n_chunks):
        audio = rng.randn(chunk).astype(np.float32) * 0.1
        act = agent.push(audio, finished=(i == n_chunks - 1))
        assert act is not None
        if not act.is_read():
            wrote += 1
    # final action must be a finished write
    assert not act.is_read() and act.finished
    # states consumed all audio
    assert agent.states.src_len == n_chunks * chunk
    # encoder cache frame counter advanced
    assert int(agent.enc_state.n_frames[0]) == n_chunks * 48
    # llm cache stayed within the configured bound (checked after eviction)
    assert agent.llm_cache_len <= agent.opts.max_llm_cache_size + \
        agent.system_prompt_size
    # logical mirror = physical cache + deferred-commit pending tokens
    # (a deferred trim may still be riding toward the next step: flush it)
    agent.flush_pending_evict()
    assert agent.llm_cache_len == (
        int(agent.dec_state.valid_len[0]) + agent.pend_n_host
    )


@pytest.mark.slow
def test_agent_tail_chunk():
    """Final partial chunk (1 unit with m=2) is padded and processed."""
    agent = make_agent(multiplier=2)
    rng = np.random.RandomState(1)
    chunk = agent.chunk_samples  # 2 units
    act = agent.push(rng.randn(chunk).astype(np.float32) * 0.1)
    # push only half a chunk then finish
    act = agent.push(
        rng.randn(chunk // 2).astype(np.float32) * 0.1, finished=True
    )
    assert not act.is_read() and act.finished
    assert int(agent.enc_state.n_frames[0]) == 96 + 48


@pytest.mark.slow
def test_update_multiplier_mid_stream():
    """m change mid-stream (ref: agents/infinisst.py:125-128): device state
    is shape-stable; chunk geometry and compiled fns follow the new m."""
    agent = make_agent(multiplier=1)
    rng = np.random.RandomState(7)
    agent.push(rng.randn(15360).astype(np.float32) * 0.1)
    assert agent.chunk_samples == 15360
    agent.update_multiplier(2)
    assert agent.chunk_samples == 30720
    assert agent.max_new == 20
    act = agent.push(rng.randn(30720).astype(np.float32) * 0.1, finished=True)
    assert not act.is_read() and act.finished
    # 1 chunk of m=1 (48 frames) + 1 chunk of m=2 (96 frames)
    assert int(agent.enc_state.n_frames[0]) == 48 + 96


@pytest.mark.slow
def test_agent_unbounded_stream_bounded_cache():
    """Config-4 condition: a long stream with many eviction cycles keeps the
    LLM cache bounded and the agent emitting (the unbounded-audio claim)."""
    agent = make_agent(max_llm_cache_size=96, capacity=256)
    rng = np.random.RandomState(11)
    chunk = agent.chunk_samples
    writes = 0
    peak = 0
    for i in range(40):
        act = agent.push(rng.randn(chunk).astype(np.float32) * 0.1,
                         finished=(i == 39))
        writes += 0 if act.is_read() else 1
        peak = max(peak, agent.llm_cache_len)
    assert not act.is_read() and act.finished
    assert int(agent.enc_state.n_frames[0]) == 40 * 48
    # cache never exceeded limit + system prompt + one chunk's tokens
    bound = 96 + agent.system_prompt_size + 21 + agent.max_new
    assert peak <= bound, (peak, bound)
    # physical cache is consistent with the logical mirror at the end
    agent.flush_pending_evict()
    assert agent.llm_cache_len == (
        int(agent.dec_state.valid_len[0]) + agent.pend_n_host
    )
    assert writes >= 30  # stream kept producing output throughout


@pytest.mark.slow
def test_agent_sampling_decode():
    """do_sample streams through sample_decode (the reference's --do-sample
    DPO path): top_k=1 sampling is deterministic (equals argmax after the
    processor stack) regardless of seed; full-temperature sampling with
    different seeds is reproducible per seed."""
    rng_audio = np.random.RandomState(0)
    chunk = 15360
    audio = [rng_audio.randn(chunk).astype(np.float32) * 0.1
             for _ in range(3)]

    def run(seed, top_k):
        agent = make_agent(
            do_sample=True, top_k=top_k, sample_seed=seed,
        )
        for i, a in enumerate(audio):
            agent.push(a, finished=(i == 2))
        return list(agent.states.target_ids)

    g1 = run(0, 1)
    g2 = run(123, 1)
    assert g1 and g1 == g2  # top_k=1 ignores the seed

    s1 = run(0, 0)
    s1b = run(0, 0)
    assert s1 == s1b  # reproducible per seed
    # per-chunk DPO dump list is populated when dpo_sampling is on
    agent = make_agent(do_sample=True, dpo_sampling=True,
                       output_file="/tmp/_dpo_test.json")
    for i, a in enumerate(audio[:2]):
        agent.push(a, finished=False)
    assert len(agent.states.translations_list) >= 1


@pytest.mark.slow
def test_agent_speculative_stream_matches_drafts():
    """--speculative greedy streaming: emitted transcripts are independent
    of draft quality (d=1 terrible draft vs d=2 = full model perfect
    draft), eviction bookkeeping stays consistent (tokens are committed
    in-cache, nothing pending), and the perfect draft accepts
    everything."""
    outs = {}
    stats = {}
    for d in (1, 2):
        # guard off: this test pins RAW speculative machinery stats (the
        # d=1 draft is deliberately terrible and would trip the guard,
        # freezing stats mid-stream — covered by test_spec_guard.py)
        agent = make_agent(
            speculative=True, spec_draft_layers=d, spec_k=3,
            spec_guard=False,
        )
        rng = np.random.RandomState(5)
        chunk = agent.chunk_samples
        for i in range(4):
            agent.push(rng.randn(chunk).astype(np.float32) * 0.1,
                       finished=(i == 3))
        outs[d] = list(agent.states.target_ids)
        stats[d] = (agent.spec_rounds, agent.spec_drafted,
                    agent.spec_accepted, agent.spec_emitted)
        assert agent.pend_n_host == 0
        # physical cache equals the logical mirror (no pending split)
        agent.flush_pending_evict()
        assert int(agent.dec_state.valid_len[0]) == agent.llm_cache_len
    assert outs[1] == outs[2], (outs, stats)
    assert len(outs[1]) > 0
    # shortlist draft heads (prefix AND custom-ranked ids) through the
    # full agent: emissions must be identical to the full-head runs
    for head_kw in (
        dict(spec_head_vocab=64),
        dict(spec_head_vocab=48,
             spec_head_ids=np.arange(400, 304, -2, dtype=np.int32)),
    ):
        agent = make_agent(
            speculative=True, spec_draft_layers=2, spec_k=3,
            spec_guard=False, **head_kw
        )
        rng = np.random.RandomState(5)
        chunk = agent.chunk_samples
        for i in range(4):
            agent.push(rng.randn(chunk).astype(np.float32) * 0.1,
                       finished=(i == 3))
        assert list(agent.states.target_ids) == outs[1], head_kw
    # the full-model draft accepts every drafted token
    r2, dr2, ac2, em2 = stats[2]
    assert ac2 == dr2 or em2 < r2 * 4  # eos/cap can cut rounds short
    # acceptance with the 1-layer draft on random weights is (near) zero,
    # so it must use (close to) one round per emitted token
    r1, dr1, ac1, em1 = stats[1]
    assert r1 >= em1 - ac1
