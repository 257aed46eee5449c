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


@pytest.mark.slow
def test_engine_batched_eviction():
    """Multiple slots overflowing in the SAME tick are trimmed by one
    batched gather (_evict_overflowing); identical streams must stay
    identical through several eviction cycles, and every active slot's
    cache_len must respect the cap after each tick."""
    cfg = CFG.replace(tokens=small_special_tokens())
    stream = StreamConfig(
        max_cache_frames=96, max_llm_cache_tokens=60, llm_cache_capacity=256
    )
    tok = StubTokenizer(512, lo=10, hi=400)
    builders = {
        ("English", "German"): PromptBuilder(
            tok, cfg.tokens, "English", "German"
        ),
    }
    eng = ServingEngine(
        tiny_params(), cfg, stream, builders, pool_size=3, multiplier=1,
        max_new_tokens=8, dtype=jnp.float32,
    )
    s0 = eng.open_stream("c0")
    s1 = eng.open_stream("c1")
    rng = np.random.RandomState(7)
    chunk = eng.chunk_samples
    audio = rng.randn(6 * chunk).astype(np.float32) * 0.1

    for t in range(6):
        seg = audio[t * chunk: (t + 1) * chunk]
        eng.push_audio(s0, seg)
        eng.push_audio(s1, seg)
        eng.tick()
        for s in (eng.slots[s0], eng.slots[s1]):
            # cap + one chunk's worth of slack (eviction is checkpoint-
            # granular: trims to <= cap AFTER the overflowing tick)
            assert s.cache_len <= stream.max_llm_cache_tokens + s.system_prompt_size
        # host mirror matches device validity (the trim is deferred into
        # the next tick's step; flush applies it for inspection)
        eng.flush_pending_evict()
        np.testing.assert_array_equal(
            np.asarray(eng.dec_state.valid_len),
            eng.valid_len_host.astype(np.int32),
        )
    assert eng.slots[s0].target_ids == eng.slots[s1].target_ids
    assert len(eng.slots[s0].cache_checkpoints) > 0


@pytest.mark.slow
def test_kv_copy_commit_matches_replay():
    """return_kv commit (copying the beam loop's K/V into the cache) must
    match the replay commit (re-forwarding the winning tokens) — same
    values (both compute K/V of the same tokens under the same prefix) and
    same valid_len advance."""
    import jax

    from infinisst_tpu.decode import beam as beam_mod
    from infinisst_tpu.models import llama as llama_mod
    from infinisst_tpu.streaming.state import init_decoder_state
    from tests.test_agent import CFG, tiny_params

    cfg = CFG.llama
    params = tiny_params()["llama"]
    rng = np.random.RandomState(1)
    B, C = 2, 64
    dec = init_decoder_state(
        cfg.num_layers, B, C, cfg.num_kv_heads, cfg.head_dim, jnp.float32
    )
    # prefill a random prompt per slot
    ids = jnp.asarray(rng.randint(10, 400, (B, 9)), jnp.int32)
    emb = llama_mod.embed(params, ids)
    logits, dec = llama_mod.decode_step(params, cfg, dec, emb)
    last = logits[:, -1]

    spec = beam_mod.BeamSpec(
        beam=2, max_new_tokens=6, eos_id=501, pad_id=504,
        no_repeat_ngram_size=3, repetition_penalty=1.2,
    )
    hists = jnp.full((B, 20), 504, jnp.int32)
    hlens = jnp.zeros((B,), jnp.int32)
    res = beam_mod.batched_beam_search(
        params, cfg, dec, last, ids, jnp.full((B,), 9, jnp.int32),
        hists, hlens, spec, return_kv=True,
    )
    n_emit = np.asarray(
        jnp.where(res.hit_eos, res.n_tokens, jnp.maximum(res.n_tokens - 1, 0))
    )
    toks = jnp.where(
        jnp.arange(6)[None] < n_emit[:, None], res.tokens, 504
    )

    # path A: replay commit
    commit_emb = llama_mod.embed(params, toks)
    mask = (jnp.arange(6)[None] < n_emit[:, None]).astype(jnp.int32)
    _, dec_replay = llama_mod.decode_step(
        params, cfg, dec, commit_emb, valid_mask=mask
    )

    # path B: kv-copy commit
    kv_k = jnp.moveaxis(res.kv_k, 0, 1)
    kv_v = jnp.moveaxis(res.kv_v, 0, 1)

    def append(buf, new):
        def per_row(buf_b, new_b, start):
            return jax.lax.dynamic_update_slice(
                buf_b, new_b.astype(buf_b.dtype), (0, start, 0, 0)
            )

        return jax.vmap(per_row, in_axes=(1, 1, 0), out_axes=1)(
            buf, new, dec.valid_len
        )

    dec_copy = dec._replace(
        k=append(dec.k, kv_k), v=append(dec.v, kv_v),
        valid_len=dec.valid_len + jnp.asarray(n_emit, jnp.int32),
    )

    assert int(n_emit.sum()) > 0  # the comparison is non-vacuous
    np.testing.assert_array_equal(
        np.asarray(dec_replay.valid_len), np.asarray(dec_copy.valid_len)
    )
    # compare only the valid region (garbage beyond valid_len may differ)
    for b in range(B):
        v = int(dec_copy.valid_len[b])
        np.testing.assert_allclose(
            np.asarray(dec_replay.k[:, b, :v]),
            np.asarray(dec_copy.k[:, b, :v]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(dec_replay.v[:, b, :v]),
            np.asarray(dec_copy.v[:, b, :v]),
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.slow
def test_batched_beam_matches_sequential():
    """The vmapped pooled beam (decode/beam.batched_beam_search) must
    produce EXACTLY the per-slot results of running beam_search slot by
    slot on the same prefixes/logits/prompts/history — the semantic
    contract of the shared-weight-stream serving path (skip_last_fwd
    differs between the two paths but only skips an unused forward)."""
    import jax

    from infinisst_tpu.decode import beam as beam_mod
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.streaming.state import DecoderState

    cfg = CFG.replace(tokens=small_special_tokens()).llama
    params = tiny_params()["llama"]
    B, C, G = 2, 64, 6
    KV, Dh, Ly = cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    rng = np.random.RandomState(5)

    # two DIFFERENT per-slot prefix caches + logits
    k = jnp.asarray(rng.randn(Ly, B, C, KV, Dh).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(Ly, B, C, KV, Dh).astype(np.float32) * 0.1)
    vlen = jnp.asarray([17, 23], jnp.int32)
    last = jnp.asarray(
        rng.randn(B, cfg.vocab_size).astype(np.float32) * 2.0
    )
    Tp = 12
    prompts = jnp.asarray(rng.randint(10, 400, (B, Tp)), jnp.int32)
    plens = jnp.asarray([9, 12], jnp.int32)
    hists = jnp.asarray(rng.randint(10, 400, (B, 16)), jnp.int32)
    hlens = jnp.asarray([4, 0], jnp.int32)
    spec = beam_mod.BeamSpec(
        beam=2, max_new_tokens=G, eos_id=cfg.vocab_size - 11,
        pad_id=cfg.vocab_size - 8, no_repeat_ngram_size=3,
        repetition_penalty=1.2,
    )
    dec = DecoderState(k=k, v=v, valid_len=vlen)
    batched = beam_mod.batched_beam_search(
        params, cfg, dec, last, prompts, plens, hists, hlens, spec,
        encoder_ngram_size=3, return_kv=True,
    )
    for b in range(B):
        prefix = DecoderState(
            k=k[:, b][:, None], v=v[:, b][:, None], valid_len=vlen[b][None]
        )
        solo = beam_mod.beam_search(
            params, cfg, prefix, last[b], prompts[b], plens[b], hists[b],
            hlens[b], spec, encoder_ngram_size=3, return_kv=True,
        )
        np.testing.assert_array_equal(
            np.asarray(batched.tokens[b]), np.asarray(solo.tokens)
        )
        assert int(batched.n_tokens[b]) == int(solo.n_tokens)
        np.testing.assert_allclose(
            float(batched.score[b]), float(solo.score), rtol=1e-5
        )
        n_emit = int(solo.n_tokens) - (0 if bool(solo.hit_eos) else 1)
        if n_emit > 0:
            np.testing.assert_allclose(
                np.asarray(batched.kv_k[b][:, :n_emit]),
                np.asarray(solo.kv_k[:, :n_emit]),
                atol=1e-5,
            )


@pytest.mark.slow
def test_engine_mixed_multipliers():
    """One pool, two latency multipliers: an m=1 slot (960 ms cadence) and
    an m=2 slot (1920 ms cadence) share the SAME batched step.  Each
    slot's output must equal a pure single-multiplier engine run on the
    same audio, and the m=2 slot must only consume audio every other
    tick."""
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

    def mk(multipliers, default_m):
        return ServingEngine(
            params, cfg, stream, builders, pool_size=2,
            multiplier=default_m, dtype=jnp.float32, beam=2,
            multipliers=multipliers,
        )

    rng = np.random.RandomState(0)
    unit = stream.chunk_samples(1)
    n_ticks = 4
    a0 = rng.randn(n_ticks * unit).astype(np.float32) * 0.1
    a1 = rng.randn(n_ticks * unit).astype(np.float32) * 0.1

    # --- mixed pool: slot0 at m=1, slot1 at m=2
    eng = mk((1, 2), 1)
    s0 = eng.open_stream("c0", multiplier=1)
    s1 = eng.open_stream("c1", multiplier=2)
    m2_ticks = []
    for t in range(n_ticks):
        fin = t == n_ticks - 1
        eng.push_audio(s0, a0[t * unit: (t + 1) * unit], finished=fin)
        eng.push_audio(s1, a1[t * unit: (t + 1) * unit], finished=fin)
        before = len(eng.slots[s1].target_ids)
        eng.tick()
        if len(eng.slots[s1].target_ids) > before or (
            eng.slots[s1].cache_len
            and t % 2 == 1
        ):
            m2_ticks.append(t)
    mixed0 = list(eng.slots[s0].target_ids)
    mixed1 = list(eng.slots[s1].target_ids)
    assert eng.slots[s0].done and eng.slots[s1].done
    # m=2 slot consumed audio only on every other tick
    assert all(t % 2 == 1 for t in m2_ticks), m2_ticks

    # --- pure m=1 engine, same audio for slot0
    p1 = mk((1,), 1)
    u0 = p1.open_stream("p0", multiplier=1)
    for t in range(n_ticks):
        p1.push_audio(u0, a0[t * unit: (t + 1) * unit],
                      finished=(t == n_ticks - 1))
        p1.tick()
    assert list(p1.slots[u0].target_ids) == mixed0

    # --- pure m=2 engine, same audio for slot1
    p2 = mk((2,), 2)
    u1 = p2.open_stream("p1", multiplier=2)
    for t in range(n_ticks):
        p2.push_audio(u1, a1[t * unit: (t + 1) * unit],
                      finished=(t == n_ticks - 1))
        p2.tick()
    assert list(p2.slots[u1].target_ids) == mixed1

    # invalid multiplier is rejected
    with pytest.raises(ValueError):
        eng.open_stream("bad", multiplier=3)


@pytest.mark.slow
def test_engine_update_multiplier_mid_stream():
    """Per-slot update_multiplier: an m=1 slot switched to m=2 mid-stream
    keeps translating at the new cadence without recompiling (same jitted
    step), and its transcript only grows."""
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
    eng = ServingEngine(
        tiny_params(), cfg, stream, builders, pool_size=2, multiplier=1,
        dtype=jnp.float32, beam=2, multipliers=(1, 2),
    )
    s0 = eng.open_stream("c0", multiplier=1)
    rng = np.random.RandomState(3)
    unit = stream.chunk_samples(1)
    lens = []
    for t in range(6):
        if t == 2:
            eng.update_multiplier(s0, 2)
        eng.push_audio(s0, rng.randn(unit).astype(np.float32) * 0.1,
                       finished=(t == 5))
        eng.tick()
        lens.append(len(eng.slots[s0].target_ids))
    assert eng.slots[s0].done
    assert lens == sorted(lens)          # transcript only grows
    assert lens[-1] > 0
    with pytest.raises(ValueError):
        eng.update_multiplier(s0, 5)


@pytest.mark.slow
def test_engine_speculative_matches_greedy():
    """Pooled speculative serving (beam=1 + layer-skip draft) must emit
    exactly the batched-greedy engine's tokens for every slot, for a
    terrible (d=1) and a perfect (d=2 = full tiny model) draft, including
    mixed multipliers."""
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
    rng = np.random.RandomState(11)
    unit = stream.chunk_samples(1)
    n_ticks = 4
    a0 = rng.randn(n_ticks * unit).astype(np.float32) * 0.1
    a1 = rng.randn(n_ticks * unit).astype(np.float32) * 0.1

    def run(**kw):
        eng = ServingEngine(
            params, cfg, stream, builders, pool_size=2, multiplier=1,
            dtype=jnp.float32, beam=1, multipliers=(1, 2), **kw,
        )
        s0 = eng.open_stream("c0", multiplier=1)
        s1 = eng.open_stream("c1", multiplier=2)
        for t in range(n_ticks):
            fin = t == n_ticks - 1
            eng.push_audio(s0, a0[t * unit: (t + 1) * unit], finished=fin)
            eng.push_audio(s1, a1[t * unit: (t + 1) * unit], finished=fin)
            eng.tick()
        return (
            list(eng.slots[s0].target_ids), list(eng.slots[s1].target_ids),
            eng,
        )

    g0, g1, _ = run()
    stats = {}
    for d in (1, 2):
        # guard off: this test pins RAW speculative machinery exactness
        # and stats (the d=1 draft is deliberately terrible and would
        # trip the guard mid-pool — covered by test_spec_guard.py)
        t0, t1, eng = run(speculative=True, spec_draft_layers=d,
                          spec_k=3, spec_guard=False)
        assert t0 == g0, (d, t0, g0)
        assert t1 == g1, (d, t1, g1)
        assert eng.spec_stats["emitted"] == len(g0) + len(g1)
        stats[d] = dict(eng.spec_stats)
    assert len(g0) > 0 and len(g1) > 0
    # the perfect (d = num_layers) draft accepts more and needs fewer
    # verify rounds than the 1-layer draft for the SAME emissions; on the
    # 512-vocab random model the 1-layer draft accepts (near) nothing
    assert stats[2]["accepted"] > stats[1]["accepted"]
    assert stats[2]["rounds"] < stats[1]["rounds"]
    assert stats[1]["accepted"] <= stats[1]["drafted"] // 4

    # shortlist draft head (spec_head_vocab): the draft scores only the
    # first 64 of 512 vocab columns; emitted tokens must still be exactly
    # the greedy pool's (a shortlist miss costs acceptance, never tokens)
    t0, t1, eng = run(
        speculative=True, spec_draft_layers=2, spec_k=3, spec_head_vocab=64,
        spec_guard=False,
    )
    assert t0 == g0, (t0, g0)
    assert t1 == g1, (t1, g1)
    assert eng.spec_stats["emitted"] == len(g0) + len(g1)

    # slot churn on the SPEC pool: close a finished slot mid-life, reuse
    # it for a fresh stream — the recycled slot must reproduce a fresh
    # engine's emissions exactly (state reset covers the spec path)
    eng.close_stream(0)
    s2 = eng.open_stream("c2", multiplier=1)
    assert s2 == 0 and int(eng.dec_state.valid_len[0]) == 0
    for t in range(n_ticks):
        eng.push_audio(s2, a0[t * unit: (t + 1) * unit],
                       finished=t == n_ticks - 1)
        eng.tick()
    assert list(eng.slots[s2].target_ids) == g0

    with pytest.raises(ValueError):
        ServingEngine(
            params, cfg, stream, builders, pool_size=2, beam=2,
            speculative=True,
        )

    # ---- pooled speculative SAMPLING (do_sample=True) ----
    # top_k=1 degenerates every per-row distribution to its argmax, so
    # the sampling pool must reproduce the greedy pool token-for-token
    # (the strongest batched exactness check available for sampling)
    t0, t1, eng = run(
        speculative=True, do_sample=True, top_k=1,
        spec_draft_layers=1, spec_k=3, spec_guard=False,
    )
    assert t0 == g0, (t0, g0)
    assert t1 == g1, (t1, g1)
    assert eng.spec_stats["emitted"] == len(g0) + len(g1)

    # non-degenerate sampling: emits, reproducible per seed, seed moves it
    r0a, r1a, _ = run(
        speculative=True, do_sample=True, temperature=1.3, top_k=8,
        spec_draft_layers=1, spec_k=3, sample_seed=7, spec_guard=False,
    )
    r0b, r1b, _ = run(
        speculative=True, do_sample=True, temperature=1.3, top_k=8,
        spec_draft_layers=1, spec_k=3, sample_seed=7, spec_guard=False,
    )
    assert (r0a, r1a) == (r0b, r1b)
    assert len(r0a) > 0 and len(r1a) > 0
    r0c, _, _ = run(
        speculative=True, do_sample=True, temperature=1.3, top_k=8,
        spec_draft_layers=1, spec_k=3, sample_seed=8, spec_guard=False,
    )
    assert r0c != r0a  # 512-vocab, dozens of draws: ties are ~impossible

    # sampling requires the speculative machinery (pooled plain sampling
    # would pay one weight stream per token)
    with pytest.raises(ValueError, match="speculative"):
        ServingEngine(
            params, cfg, stream, builders, pool_size=2, do_sample=True,
        )
