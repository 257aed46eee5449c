"""Speculative beam search: the tree-verify forward and the decoder.

Exactness contract: spec_beam_search emits exactly decode/beam.py
beam_search's result (tokens, score, hit_eos) for ANY draft quality —
the draft only proposes which beam extensions get verified; every
transition applied to real state is computed from full-model logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinisst_tpu.models import llama as L
from infinisst_tpu.streaming.state import init_decoder_state

import sys

sys.path.insert(0, "/root/repo/tests")

from test_speculative import CFG, PAD  # noqa: E402


def _prefill(params, prompt):
    dec = init_decoder_state(
        CFG.num_layers, 1, 64, CFG.num_kv_heads, CFG.head_dim, jnp.float32
    )
    lg, dec = L.decode_step(params, CFG, dec, L.embed(params, prompt[None]))
    return dec, lg[0, -1, : CFG.vocab_size]


def test_tree_step_matches_sequential_reparented_chain():
    """beam_tree_step over a reparenting tree == sequential
    beam_token_step with explicit gen-buffer reorders, level by level:
    logits at every node and the nodes' unrotated K/V must agree."""
    B, S, G = 3, 4, 8  # beams, tree levels, gen buffer
    rng = np.random.RandomState(0)
    params = L.init_params(jax.random.PRNGKey(1), CFG, jnp.float32)
    prompt = jnp.asarray(rng.randint(1, CFG.vocab_size, 7), jnp.int32)
    prefix, _ = _prefill(params, prompt)

    KV, Dh, NL = CFG.num_kv_heads, CFG.head_dim, CFG.num_layers
    gen_k = jnp.zeros((NL, B, G, KV, Dh), jnp.float32)
    gen_v = jnp.zeros_like(gen_k)

    # commit t=2 tokens on each beam sequentially (distinct per beam)
    t = 2
    for step in range(t):
        toks = jnp.asarray(rng.randint(1, CFG.vocab_size, B), jnp.int32)
        _, gen_k, gen_v, _ = L.beam_token_step(
            params, CFG, prefix, gen_k, gen_v,
            jnp.asarray(step, jnp.int32),
            L.embed(params, toks[:, None]),
        )

    # drafted tree: per level, a reparenting src and tokens
    srcs = [rng.permutation(B) for _ in range(S)]
    srcs[1] = np.zeros(B, np.int64)  # heavy reparenting: all from slot 0
    toks = [rng.randint(1, CFG.vocab_size, B) for _ in range(S)]

    # --- sequential reference
    ref_logits = []
    ref_k = []  # per level: (NL, B, KV, Dh) written at slot t+s
    gk, gv = gen_k, gen_v
    for s in range(S):
        gk, gv = gk[:, srcs[s]], gv[:, srcs[s]]
        lg, gk, gv, _ = L.beam_token_step(
            params, CFG, prefix, gk, gv, jnp.asarray(t + s, jnp.int32),
            L.embed(params, jnp.asarray(toks[s], jnp.int32)[:, None]),
        )
        ref_logits.append(np.asarray(lg))
        ref_k.append(np.asarray(gk[:, :, t + s]))

    # --- tree: node n = s*B + b
    N = S * B
    anc_slot = np.zeros((S, S, B), np.int64)  # anc_slot[s, s', b]
    for s in range(S):
        cur = np.arange(B)
        anc_slot[s, s] = cur
        for sp in range(s, 0, -1):
            cur = np.asarray(srcs[sp])[cur]
            anc_slot[s, sp - 1] = cur
    root = np.zeros((N,), np.int64)
    tree_mask = np.zeros((N, N), bool)
    node_pos = np.zeros((N,), np.int64)
    x_toks = np.zeros((N,), np.int64)
    for s in range(S):
        for b in range(B):
            n = s * B + b
            node_pos[n] = t + s
            x_toks[n] = toks[s][b]
            root[n] = srcs[0][anc_slot[s, 0, b]]
            for sp in range(s + 1):
                tree_mask[n, sp * B + anc_slot[s, sp, b]] = True
    bias = np.where(tree_mask, 0.0, -1e9).astype(np.float32)

    logits, k_tree, v_tree = L.beam_tree_step(
        params, CFG, prefix, gen_k, gen_v, jnp.asarray(t, jnp.int32),
        L.embed(params, jnp.asarray(x_toks, jnp.int32)[None])[0],
        jnp.asarray(node_pos, jnp.int32), jnp.asarray(bias),
        jnp.asarray(root, jnp.int32),
    )
    logits = np.asarray(logits)
    k_tree = np.asarray(k_tree)

    for s in range(S):
        # the sequential reference at level s reordered its buffers by
        # the COMPOSED chain, so reference slot b == tree node (b, s)
        np.testing.assert_allclose(
            logits[s * B : (s + 1) * B], ref_logits[s],
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            k_tree[:, s * B : (s + 1) * B], ref_k[s],
            rtol=2e-4, atol=2e-4,
        )


# ---------------------------------------------------------------------------
# decoder equality vs decode/beam.beam_search

from infinisst_tpu.decode.beam import BeamSpec, beam_search  # noqa: E402
from infinisst_tpu.decode.spec_beam import spec_beam_search  # noqa: E402

from test_speculative import G, NGRAM, REP, setup  # noqa: E402

HIST = jnp.full((16,), PAD, jnp.int32)
HLEN = jnp.zeros((), jnp.int32)


def _bspec(eos=-1, beam=3):
    return BeamSpec(
        beam=beam, max_new_tokens=G, eos_id=eos, pad_id=PAD,
        no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )


def _ref(params, prompt, dec, first, spec):
    return beam_search(
        params, CFG, dec, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), HIST, HLEN, spec,
        encoder_ngram_size=NGRAM,
    )


def _spec_run(params, prompt, dec, first, spec, d, k=3, **kw):
    return spec_beam_search(
        params, CFG, dec, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), HIST, HLEN, spec,
        draft_layers=d, draft_k=k, encoder_ngram_size=NGRAM, **kw,
    )


@pytest.mark.parametrize("d", [1, 2, 4])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_beam_matches_beam_search(d, seed):
    """The whole point: spec_beam_search's winner == beam_search's, for
    terrible (d=1) through perfect (d=L) drafts, across seeds."""
    params, prompt, dec0, first = setup(seed)
    spec = _bspec()
    ref = _ref(params, prompt, jax.tree.map(jnp.copy, dec0), first, spec)
    res = _spec_run(params, prompt, dec0, first, spec, d)
    assert res.tokens[: int(res.n_tokens)].tolist() == (
        ref.tokens[: int(ref.n_tokens)].tolist()
    ), (d, seed)
    assert int(res.n_tokens) == int(ref.n_tokens)
    assert bool(res.hit_eos) == bool(ref.hit_eos)
    np.testing.assert_allclose(
        float(res.score), float(ref.score), rtol=1e-4, atol=1e-5
    )
    assert int(res.steps) == int(ref.steps)
    # every round makes progress: rounds <= steps; a perfect draft needs
    # far fewer verify rounds than steps
    assert int(res.rounds) <= int(res.steps)
    if d == CFG.num_layers:
        assert int(res.rounds) <= -(-int(res.steps) // 2)


def test_spec_beam_eos_and_finished_hypotheses():
    """EOS mid-search: the finished-hypothesis buffer and the
    finalisation rule must agree with beam_search exactly."""
    params, prompt, dec0, first = setup(4)
    free = _ref(
        params, prompt, jax.tree.map(jnp.copy, dec0), first, _bspec()
    )
    assert int(free.n_tokens) >= 3
    eos = int(free.tokens[2])  # a token the search actually reaches
    spec = _bspec(eos=eos)
    ref = _ref(params, prompt, jax.tree.map(jnp.copy, dec0), first, spec)
    for d in (1, 4):
        res = _spec_run(
            params, prompt, jax.tree.map(jnp.copy, dec0), first, spec, d
        )
        assert res.tokens[: int(res.n_tokens)].tolist() == (
            ref.tokens[: int(ref.n_tokens)].tolist()
        ), d
        assert bool(res.hit_eos) == bool(ref.hit_eos)
        np.testing.assert_allclose(
            float(res.score), float(ref.score), rtol=1e-4, atol=1e-5
        )


def test_spec_beam_draft_levers_stay_exact():
    """Shortlist draft head and a garbage exit adapter change only the
    PROPOSALS — the emitted winner must not move."""
    from infinisst_tpu.decode.speculative import make_draft_head

    params, prompt, dec0, first = setup(5)
    spec = _bspec()
    ref = _ref(params, prompt, jax.tree.map(jnp.copy, dec0), first, spec)
    dh = make_draft_head(params["lm_head"], 32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    adapter = {
        "ln": jnp.ones((CFG.hidden_size,)),
        "w1": jax.random.normal(k1, (CFG.hidden_size, 16)),
        "w2": jax.random.normal(k2, (16, CFG.hidden_size)),
    }
    for kw in (dict(draft_head=dh), dict(exit_adapter=adapter)):
        res = _spec_run(
            params, prompt, jax.tree.map(jnp.copy, dec0), first, spec, 1,
            **kw,
        )
        assert res.tokens[: int(res.n_tokens)].tolist() == (
            ref.tokens[: int(ref.n_tokens)].tolist()
        ), kw


def test_agent_spec_beam_stream_matches_plain_beam():
    """Full streaming agent with --speculative --spec-beam: emitted
    transcripts across chunks (deferred commit, eviction, history) must
    be token-identical to the plain beam-search agent, for terrible and
    perfect drafts; draft stats accumulate."""
    from test_agent import make_agent

    def run(**kw):
        agent = make_agent(**kw)
        rng = np.random.RandomState(7)
        for i in range(4):
            agent.push(
                rng.randn(agent.chunk_samples).astype(np.float32) * 0.1,
                finished=(i == 3),
            )
        return agent

    base = run()
    ref = list(base.states.target_ids)
    assert len(ref) > 0
    for d in (1, 2):
        agent = run(speculative=True, spec_beam=True,
                    spec_draft_layers=d, spec_k=3)
        assert list(agent.states.target_ids) == ref, d
        assert agent.spec_rounds > 0 and agent.spec_drafted > 0
        # deferred commit: the host mirror stays consistent with the
        # physical cache + pending split (same invariant as plain beam)
        assert agent.pend_n_host >= 0
    # the perfect (d = num_layers) draft needs fewer verify rounds
    a1 = run(speculative=True, spec_beam=True, spec_draft_layers=1,
             spec_k=3)
    a2 = run(speculative=True, spec_beam=True, spec_draft_layers=2,
             spec_k=3)
    assert a2.spec_rounds <= a1.spec_rounds
    assert a2.spec_accepted >= a1.spec_accepted

    import pytest as _pytest

    with _pytest.raises(ValueError, match="combined"):
        run(speculative=True, spec_beam=True, do_sample=True)


def test_beam_token_step_exit_adapter_hook():
    """The distilled exit adapter must actually run on the spec-beam
    draft path (beam_token_step): a zero-init adapter is an exact
    identity, a nonzero one changes the logits."""
    from infinisst_tpu.train.draft import init_exit_adapter

    params, prompt, dec0, first = setup(0)
    B = 2
    gen_k = jnp.zeros(
        (CFG.num_layers, B, 4, CFG.num_kv_heads, CFG.head_dim),
        jnp.float32,
    )
    gen_v = jnp.zeros_like(gen_k)
    toks = jnp.asarray([[5], [9]], jnp.int32)
    base, _, _, _ = L.beam_token_step(
        params, CFG, dec0, gen_k, gen_v, jnp.asarray(0, jnp.int32),
        L.embed(params, toks),
    )
    zero = dict(params)
    zero["exit_adapter"] = init_exit_adapter(
        jax.random.PRNGKey(0), CFG, rank=8
    )
    with_zero, _, _, _ = L.beam_token_step(
        zero, CFG, dec0, gen_k, gen_v, jnp.asarray(0, jnp.int32),
        L.embed(params, toks),
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_zero))
    hot = dict(zero)
    hot["exit_adapter"] = jax.tree.map(
        lambda a: a + 0.5, zero["exit_adapter"]
    )
    with_hot, _, _, _ = L.beam_token_step(
        hot, CFG, dec0, gen_k, gen_v, jnp.asarray(0, jnp.int32),
        L.embed(params, toks),
    )
    assert float(jnp.abs(with_hot - base).max()) > 1e-3


def test_spec_beam_accept_all_machinery():
    """accept_all (bench-only): every drafted level is forced, so the
    run takes ceil(steps / (k+1)) verify rounds."""
    params, prompt, dec0, first = setup(6)
    spec = _bspec()
    res = _spec_run(
        params, prompt, dec0, first, spec, 1, k=3, accept_all=True
    )
    assert int(res.n_tokens) > 0
    assert int(res.rounds) == -(-int(res.steps) // 4)
    assert int(res.accepted) == int(res.steps) - int(res.rounds)
