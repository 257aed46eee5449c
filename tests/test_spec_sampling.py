"""Speculative SAMPLING (decode/speculative.speculative_sample): exact in
distribution vs the single-step ancestral sampling path
(decode/beam.sample_decode), for any draft quality.

Contracts:
  1. degenerate distributions (top_k=1) reduce to the exact greedy chain —
     token-identical to sample_decode AND to the greedy sequential
     reference, for good and terrible drafts (incl. adversarial shortlist
     + garbage adapter, which force the residual path every round);
  2. a perfect draft (d = L) is always accepted (q == p);
  3. the emitted token distribution matches sample_decode empirically
     (TV distance over thousands of seeded rollouts);
  4. committed K/V == replaying the emitted tokens;
  5. EOS truncates emission and sets hit_eos.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinisst_tpu.decode import beam as beam_mod
from infinisst_tpu.decode.speculative import (
    SpecSampleSpec, make_draft_head, speculative_sample,
)
from infinisst_tpu.models import llama as L

sys.path.insert(0, "/root/repo/tests")

from test_speculative import (  # noqa: E402
    CFG, G, NGRAM, PAD, REP, seq_greedy, setup,
)

HIST = jnp.full((16,), PAD, jnp.int32)
HLEN = jnp.zeros((), jnp.int32)


def _sspec(d, k=3, **kw):
    base = dict(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, draft_layers=d,
        draft_k=k, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )
    base.update(kw)
    return SpecSampleSpec(**base)


def _run(params, prompt, dec, first, spec, seed=0, **kw):
    return speculative_sample(
        params, CFG, dec, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), HIST, HLEN, spec,
        jax.random.PRNGKey(seed), encoder_ngram_size=NGRAM, **kw,
    )


def _sample_ref(params, prompt, dec, first, spec, seed=0):
    """sample_decode with the same filter stack — the law to match."""
    sspec = beam_mod.SampleSpec(
        max_new_tokens=spec.max_new_tokens, eos_id=spec.eos_id,
        pad_id=spec.pad_id, temperature=spec.temperature,
        top_p=spec.top_p, top_k=spec.top_k,
        epsilon_cutoff=spec.epsilon_cutoff,
        no_repeat_ngram_size=spec.no_repeat_ngram_size,
        repetition_penalty=spec.repetition_penalty,
    )
    return beam_mod.sample_decode(
        params, CFG, dec, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), HIST, HLEN, sspec,
        jax.random.PRNGKey(seed), encoder_ngram_size=NGRAM,
    )


@pytest.mark.parametrize("d", [1, 4])
def test_topk1_reduces_to_greedy(d):
    """top_k=1 makes every distribution degenerate: speculative sampling
    must emit exactly the greedy chain (== sample_decode(top_k=1) == the
    sequential greedy reference).  Temperature stays 1.0: the repetition
    penalty's selective multiply is NOT argmax-invariant under
    temperature, so T != 1 legitimately diverges from the greedy
    reference (it still matches sample_decode at the same T)."""
    params, prompt, dec0, first = setup(seed=0)
    ref, _ = seq_greedy(
        params, prompt, jax.tree.map(jnp.copy, dec0), first, -1, HIST,
        HLEN,
    )
    spec = _sspec(d, top_k=1)
    res = _run(params, prompt, jax.tree.map(jnp.copy, dec0), first, spec)
    assert res.tokens[: int(res.n_tokens)].tolist() == ref
    sref = _sample_ref(params, prompt, dec0, first, spec)
    assert (
        res.tokens[: int(res.n_tokens)].tolist()
        == sref.tokens[: int(sref.n_tokens)].tolist()
    )
    assert int(res.dec.valid_len[0]) == len(prompt) + len(ref)


def test_topk1_with_adversarial_draft_stays_exact():
    """Adversarial shortlist (misses every greedy token) + garbage
    adapter: q's support barely overlaps p's, so nearly every round
    rejects and resamples from the residual — the output must STILL be
    the exact greedy chain."""
    params, prompt, dec0, first = setup(seed=1)
    ref, _ = seq_greedy(
        params, prompt, jax.tree.map(jnp.copy, dec0), first, -1, HIST,
        HLEN,
    )
    bad = [i for i in range(CFG.vocab_size) if i not in set(ref)][:8]
    dh = make_draft_head(params["lm_head"], 8, ids=jnp.asarray(bad))
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    adapter = {
        "ln": jnp.ones((CFG.hidden_size,)),
        "w1": jax.random.normal(k1, (CFG.hidden_size, 16)),
        "w2": jax.random.normal(k2, (16, CFG.hidden_size)),
    }
    spec = _sspec(1, top_k=1)
    res = _run(
        params, prompt, dec0, first, spec, draft_head=dh,
        exit_adapter=adapter,
    )
    assert res.tokens[: int(res.n_tokens)].tolist() == ref
    # the shortlist misses everything, so (almost) nothing is accepted
    assert int(res.accepted) <= 1


def test_perfect_draft_accepts_everything():
    """d = L: the draft IS the target, q == p, so every draft token is
    accepted and the run takes exactly ceil(G / (k+1)) verify rounds."""
    params, prompt, dec0, first = setup(seed=2)
    spec = _sspec(CFG.num_layers, k=3, temperature=1.1, top_p=0.95)
    res = _run(params, prompt, dec0, first, spec, seed=5)
    assert int(res.n_tokens) == G
    assert int(res.accepted) == int(res.drafted) == G - G // 4
    assert int(res.rounds) == G // 4  # 12 / (3+1)


def test_distribution_matches_sample_decode():
    """Empirical token-distribution equality: thousands of seeded
    rollouts of speculative_sample (terrible d=1 draft) vs sample_decode
    under a concentrated filter stack (top_k=8, so TV noise is small).
    Marginals at emission positions 0 and 1 must agree within TV noise;
    a biased accept/residual rule shows up here at 10x the tolerance."""
    params, prompt, dec0, first = setup(seed=3)
    spec = _sspec(1, k=3, temperature=1.3, top_k=8, top_p=0.92)
    N = 3000

    spec_fn = jax.jit(jax.vmap(
        lambda key: speculative_sample(
            params, CFG, dec0, first, prompt,
            jnp.asarray(len(prompt), jnp.int32), HIST, HLEN, spec, key,
            encoder_ngram_size=NGRAM,
        ).tokens,
        in_axes=0,
    ))
    sspec = beam_mod.SampleSpec(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, temperature=1.3,
        top_k=8, top_p=0.92, no_repeat_ngram_size=NGRAM,
        repetition_penalty=REP,
    )
    ref_fn = jax.jit(jax.vmap(
        lambda key: beam_mod.sample_decode(
            params, CFG, dec0, first, prompt,
            jnp.asarray(len(prompt), jnp.int32), HIST, HLEN, sspec, key,
            encoder_ngram_size=NGRAM,
        ).tokens,
        in_axes=0,
    ))
    keys = jax.random.split(jax.random.PRNGKey(123), N)
    got = np.asarray(spec_fn(keys))
    ref = np.asarray(ref_fn(jax.random.split(jax.random.PRNGKey(321), N)))

    for pos in (0, 1):
        tv = 0.5 * np.abs(
            np.bincount(got[:, pos], minlength=CFG.vocab_size) / N
            - np.bincount(ref[:, pos], minlength=CFG.vocab_size) / N
        ).sum()
        assert tv < 0.08, (pos, tv)
    # self-consistency yardstick: two halves of the reference sampler
    # differ by the same order, i.e. the tolerance is noise-calibrated
    half = N // 2
    tv_self = 0.5 * np.abs(
        np.bincount(ref[:half, 0], minlength=CFG.vocab_size) / half
        - np.bincount(ref[half:, 0], minlength=CFG.vocab_size) / half
    ).sum()
    assert tv_self < 0.08


def test_committed_kv_matches_replay():
    params, prompt, dec0, first = setup(seed=5)
    spec = _sspec(2, k=3, temperature=1.2, top_p=0.9)
    res = _run(
        params, prompt, jax.tree.map(jnp.copy, dec0), first, spec, seed=9
    )
    n = int(res.n_tokens)
    assert n > 0
    _, dec_replay = L.decode_step(
        params, CFG, dec0, L.embed(params, res.tokens[:n][None])
    )
    V = int(res.dec.valid_len[0])
    assert V == int(dec_replay.valid_len[0]) == len(prompt) + n
    np.testing.assert_allclose(
        np.asarray(res.dec.k[:, :, :V]),
        np.asarray(dec_replay.k[:, :, :V]), atol=1e-5, rtol=1e-5,
    )


def test_eos_truncates_and_sets_hit():
    """Make the 3rd greedy token the EOS id under top_k=1: the sampled
    run is deterministic, so emission must stop before it exactly as the
    sequential loop does."""
    params, prompt, dec0, first = setup(seed=3)
    ref_free, _ = seq_greedy(
        params, prompt, jax.tree.map(jnp.copy, dec0), first, -1, HIST,
        HLEN,
    )
    eos = ref_free[2]
    ref, ref_hit = seq_greedy(
        params, prompt, jax.tree.map(jnp.copy, dec0), first, eos, HIST,
        HLEN,
    )
    spec = _sspec(4, k=4, top_k=1, eos_id=eos)
    res = _run(params, prompt, dec0, first, spec)
    assert res.tokens[: int(res.n_tokens)].tolist() == ref
    assert bool(res.hit_eos) == ref_hit == True  # noqa: E712
    assert int(res.dec.valid_len[0]) == len(prompt) + len(ref)


def test_batched_sample_row_cap_and_inactive_rows():
    """Pool edge rules of the batched sampling decoder: a row cap above
    G binds to G (staging-buffer contract), an INACTIVE row emits
    nothing and its cache length never moves, and the active row (under
    top_k=1) still reproduces the exact greedy chain."""
    from infinisst_tpu.decode.speculative import batched_speculative_sample
    from infinisst_tpu.streaming.state import init_decoder_state

    params, prompt, _, _ = setup(seed=6)
    ref, _ = seq_greedy(
        params,
        prompt,
        init_and_prefill(params, prompt)[0],
        init_and_prefill(params, prompt)[1],
        -1, HIST, HLEN,
    )

    B = 2
    dec = init_decoder_state(
        CFG.num_layers, B, 64, CFG.num_kv_heads, CFG.head_dim, jnp.float32
    )
    ids2 = jnp.stack([prompt, prompt])
    lg, dec = L.decode_step(params, CFG, dec, L.embed(params, ids2))
    first2 = lg[:, -1, : CFG.vocab_size]
    v0 = int(dec.valid_len[1])

    spec = _sspec(2, k=3, top_k=1)
    tokens, n_out, hit, dec2, rounds, drafted, accepted = (
        batched_speculative_sample(
            params, CFG, dec, first2, ids2,
            jnp.asarray([len(prompt)] * B, jnp.int32),
            jnp.stack([HIST, HIST]), jnp.zeros((B,), jnp.int32),
            spec, jax.random.PRNGKey(0),
            row_active=jnp.asarray([True, False]),
            row_max_new=jnp.asarray([G + 9, G], jnp.int32),
            encoder_ngram_size=NGRAM,
        )
    )
    assert tokens[0, : int(n_out[0])].tolist() == ref
    assert int(n_out[0]) == G  # cap bound to G despite row_max_new = G+9
    assert int(n_out[1]) == 0 and int(drafted[1]) == 0
    assert int(dec2.valid_len[1]) == v0  # inactive cache never moves
    assert int(dec2.valid_len[0]) == len(prompt) + G


def init_and_prefill(params, prompt):
    from infinisst_tpu.streaming.state import init_decoder_state

    dec = init_decoder_state(
        CFG.num_layers, 1, 64, CFG.num_kv_heads, CFG.head_dim, jnp.float32
    )
    lg, dec = L.decode_step(params, CFG, dec, L.embed(params, prompt[None]))
    return dec, lg[0, -1, : CFG.vocab_size]


def test_agent_speculative_sampling_smoke():
    """--speculative --do-sample through the full agent: emits tokens,
    commits them in-cache (nothing pending), accumulates draft stats,
    and is reproducible per seed."""
    from test_agent import make_agent

    outs = []
    for _ in range(2):
        agent = make_agent(
            do_sample=True, temperature=1.2, top_k=8, sample_seed=4,
            speculative=True, spec_draft_layers=1, spec_k=3,
        )
        rng = np.random.RandomState(0)
        for i in range(3):
            agent.push(
                rng.randn(agent.chunk_samples).astype(np.float32) * 0.1,
                finished=(i == 2),
            )
        outs.append(list(agent.states.target_ids))
        assert agent.spec_rounds > 0 and agent.spec_drafted > 0
        assert agent.pend_n_host == 0
        agent.flush_pending_evict()
        assert int(agent.dec_state.valid_len[0]) == agent.llm_cache_len
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0
