"""AlignAtt / StreamAtt agent smoke tests on the tiny model."""

import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.agents.alignatt import AlignAttAgent, AlignAttOptions
from infinisst_tpu.agents.streamatt import StreamAttAgent, StreamAttOptions
from infinisst_tpu.core.config import StreamConfig
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer

from tests.test_agent import CFG, small_special_tokens, tiny_params


def _mk(agent_cls, opts_cls, **opt_kw):
    cfg = CFG.replace(tokens=small_special_tokens())
    stream = StreamConfig(max_cache_frames=96, llm_cache_capacity=256)
    builder = PromptBuilder(StubTokenizer(512, lo=10, hi=400), cfg.tokens)
    base_kw = dict(
        latency_multiplier=1,
        beam=2,
        attn_layer=1,
        frame_num=1,
        length_bucket_chunks=2,
        decode_buf_tokens=16,
        no_repeat_ngram_lookback=16,
    )
    base_kw.update(opt_kw)
    opts = opts_cls(**base_kw)
    return agent_cls(
        tiny_params(), cfg, stream, builder, opts, param_dtype=jnp.float32
    )


@pytest.mark.slow
def test_alignatt_stream():
    agent = _mk(AlignAttAgent, AlignAttOptions)
    rng = np.random.RandomState(0)
    chunk = 15360
    for i in range(3):
        act = agent.push(
            rng.randn(chunk).astype(np.float32) * 0.1, finished=(i == 2)
        )
        assert act is not None
    assert not act.is_read() and act.finished
    # most-attended bookkeeping exists for streamatt
    assert isinstance(agent.states.most_attended_indices, list)


@pytest.mark.slow
def test_streamatt_prunes_history():
    agent = _mk(
        StreamAttAgent,
        StreamAttOptions,
        text_preserve_num=2,
        min_speech_duration=0.5,
        max_speech_duration=1.5,
    )
    rng = np.random.RandomState(1)
    chunk = 15360
    for i in range(4):
        act = agent.push(rng.randn(chunk).astype(np.float32) * 0.1)
    # history pruning keeps audio bounded by max_speech_duration
    assert len(agent.states.source) <= int(1.5 * 16000)


@pytest.mark.slow
def test_alignatt_bounded_compile_set():
    """Arbitrarily long streams must stop growing the jit-key set: audio is
    capped to max_audio_chunks, the prompt target prefix to
    max_prompt_target_tokens, so keys converge to a fixed pair."""
    agent = _mk(
        AlignAttAgent, AlignAttOptions,
        max_audio_chunks=4, max_prompt_target_tokens=32,
    )
    rng = np.random.RandomState(2)
    chunk = 15360
    keys_seen = []
    for i in range(8):
        agent.push(rng.randn(chunk).astype(np.float32) * 0.1)
        keys_seen.append(len(agent._offline_fns))
    # audio bucket: <= ceil(4/2)=2 shapes; prompt bucket bounded by the
    # (capped speech + capped target) length -> no growth after the cap
    assert keys_seen[-1] == keys_seen[4], keys_seen
    assert keys_seen[-1] <= 4, keys_seen
    # attention bookkeeping keeps ABSOLUTE stream positions after the cap
    if agent.states.most_attended_indices:
        assert max(agent.states.most_attended_indices) <= 8 * chunk


@pytest.mark.slow
def test_attn_early_stop_beam1_parity():
    """attn_early_stop ends the beam loop at the stop zone instead of
    generating to the cap (decode/beam.py attn_stop_idx).  With beam=1 and
    EOS suppressed there are no finished hypotheses, so the winner is the
    (deterministic) live beam in both modes and emission must match the
    full-run (reference-parity) mode exactly.  (With EOS hypotheses the
    winner may legitimately differ — the documented early-stop caveat.)"""
    outs = {}
    eos = small_special_tokens().eos
    for early in (False, True):
        agent = _mk(
            AlignAttAgent, AlignAttOptions, beam=1, attn_early_stop=early,
            suppress_tokens=np.asarray([eos]),
        )
        rng = np.random.RandomState(3)
        chunk = 15360
        for i in range(3):
            agent.push(rng.randn(chunk).astype(np.float32) * 0.1,
                       finished=(i == 2))
        outs[early] = list(agent.states.target_ids)
    assert outs[True] == outs[False], outs


@pytest.mark.slow
def test_attn_early_stop_beam2_smoke():
    agent = _mk(AlignAttAgent, AlignAttOptions, attn_early_stop=True)
    rng = np.random.RandomState(4)
    chunk = 15360
    for i in range(3):
        act = agent.push(rng.randn(chunk).astype(np.float32) * 0.1,
                         finished=(i == 2))
    assert not act.is_read() and act.finished


@pytest.mark.slow
def test_alignatt_cap_boundary_prefix_agreement():
    """A stream that crosses max_audio_chunks must agree EXACTLY with a
    run at a larger cap for the whole pre-cap prefix (the capped policy
    only deviates once truncation actually occurs), and keep producing
    valid monotone output after the cap (VERDICT r2 #5a; the reference's
    unbounded-recompute condition is scripts/infer/streamatt.sh:78-79)."""
    chunk = 15360  # 960 ms
    # distinct audio per chunk so truncation is observable
    rng = np.random.RandomState(7)
    rng_audio = [rng.randn(chunk).astype(np.float32) * 0.1 for _ in range(6)]

    outs = {}
    for cap in (4, 8):
        agent = _mk(
            AlignAttAgent, AlignAttOptions,
            max_audio_chunks=cap, max_prompt_target_tokens=64,
        )
        per_chunk = []
        for i in range(6):
            agent.push(rng_audio[i], finished=(i == 5))
            per_chunk.append(list(agent.states.target_ids))
        outs[cap] = per_chunk

    # chunks 0..3: <= 4 chunks of audio exist, no truncation under either
    # cap -> bit-identical emissions
    for i in range(4):
        assert outs[4][i] == outs[8][i], (i, outs[4][i], outs[8][i])
    # prefix property: the pre-cap output is a prefix of the capped run's
    # final transcript (emissions are append-only)
    assert outs[4][5][: len(outs[4][3])] == outs[4][3]
    # post-cap the capped agent still runs and grows monotonically
    for i in range(1, 6):
        assert outs[4][i][: len(outs[4][i - 1])] == outs[4][i - 1]
