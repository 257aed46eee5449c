"""Speculative greedy decoding: exactness vs sequential processed-greedy.

The layer-skip draft only controls SPEED; the emitted tokens must be
identical to a plain sequential greedy loop with the same logits
processors, for any draft quality (d=1 terrible draft, d=L perfect
draft)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.core.config import LlamaConfig
from infinisst_tpu.decode import logits as lp
from infinisst_tpu.decode.speculative import SpecSpec, speculative_greedy
from infinisst_tpu.models import llama as L
from infinisst_tpu.streaming.state import init_decoder_state

CFG = LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=16, rope_scaling=False,
)
G = 12
PAD = 0
REP = 1.2
NGRAM = 3


def setup(seed=0, plen=9, cap=64):
    params = L.init_params(jax.random.PRNGKey(seed), CFG, jnp.float32)
    prompt = jax.random.randint(
        jax.random.PRNGKey(seed + 100), (plen,), 1, CFG.vocab_size
    ).astype(jnp.int32)
    dec = init_decoder_state(
        CFG.num_layers, 1, cap, CFG.num_kv_heads, CFG.head_dim, jnp.float32
    )
    logits, dec = L.decode_step(params, CFG, dec, L.embed(params, prompt[None]))
    return params, prompt, dec, logits[0, -1]


def seq_greedy(params, prompt, dec, first_logits, eos_id, hist, hist_len,
               steps=None):
    """Independent sequential reference: same processor order as
    decode/beam.py process_scores."""
    steps = steps or G
    Tbuf = len(prompt) + steps
    seq = list(np.asarray(prompt))
    out = []
    logits = first_logits
    hit = False
    for _ in range(steps):
        buf = np.full((Tbuf,), PAD, np.int32)
        buf[: len(seq)] = seq
        scores = jax.nn.log_softmax(logits.astype(jnp.float32))[None]
        scores = lp.repetition_penalty(
            scores, jnp.asarray(buf)[None],
            (jnp.arange(Tbuf) < len(seq))[None], REP,
        )
        scores = lp.no_repeat_ngram(
            scores, jnp.asarray(buf)[None],
            jnp.asarray([len(seq)], jnp.int32), NGRAM,
        )
        scores = lp.encoder_no_repeat_ngram(
            scores, hist[None], hist_len[None], jnp.asarray(buf)[None],
            jnp.asarray([len(seq)], jnp.int32), NGRAM,
        )
        tok = int(jnp.argmax(scores[0]))
        if tok == eos_id:
            hit = True
            break
        out.append(tok)
        seq.append(tok)
        lg, dec = L.decode_step(
            params, CFG, dec, L.embed(params, jnp.asarray([[tok]]))
        )
        logits = lg[0, -1]
    return out, hit


@pytest.mark.parametrize("draft_layers", [1, 2, 4])
@pytest.mark.parametrize("seed", [0, 1])
def test_spec_matches_sequential(draft_layers, seed):
    params, prompt, dec0, first = setup(seed)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)
    eos = -1  # unreachable

    ref, ref_hit = seq_greedy(
        params, prompt, jax.tree.map(lambda a: a.copy(), dec0), first,
        eos, hist, hlen,
    )

    spec = SpecSpec(
        max_new_tokens=G, eos_id=eos, pad_id=PAD,
        draft_layers=draft_layers, draft_k=4,
        no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )
    res = jax.jit(
        lambda d, f: speculative_greedy(
            params, CFG, d, f, prompt,
            jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
            encoder_ngram_size=NGRAM,
        )
    )(dec0, first)
    got = res.tokens[: int(res.n_tokens)].tolist()
    assert got == ref, (draft_layers, got, ref)
    assert not bool(res.hit_eos)
    # a perfect draft (d = num_layers) must accept everything: one round
    # per k+1 tokens
    if draft_layers == CFG.num_layers:
        assert int(res.accepted) == int(res.drafted) or int(
            res.n_tokens
        ) < int(res.rounds) * 5
        assert int(res.rounds) <= -(-G // 5) + 1
    # cache commit: exactly the emitted tokens are valid
    assert int(res.dec.valid_len[0]) == len(prompt) + len(got)


def test_spec_eos_mid_stream():
    """EOS inside an accepted run truncates emission and sets hit_eos,
    matching the sequential loop stopped at the same token."""
    params, prompt, dec0, first = setup(3)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)

    ref_free, _ = seq_greedy(
        params, prompt, jax.tree.map(lambda a: a.copy(), dec0), first,
        -1, hist, hlen,
    )
    assert len(ref_free) >= 3
    eos = ref_free[2]  # third emitted token becomes EOS

    ref, ref_hit = seq_greedy(
        params, prompt, jax.tree.map(lambda a: a.copy(), dec0), first,
        eos, hist, hlen,
    )
    spec = SpecSpec(
        max_new_tokens=G, eos_id=eos, pad_id=PAD, draft_layers=4,
        draft_k=4, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )
    res = speculative_greedy(
        params, CFG, dec0, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
        encoder_ngram_size=NGRAM,
    )
    got = res.tokens[: int(res.n_tokens)].tolist()
    assert got == ref
    assert bool(res.hit_eos) == ref_hit == True  # noqa: E712
    assert int(res.dec.valid_len[0]) == len(prompt) + len(got)


def test_spec_committed_kv_matches_replay():
    """The K/V committed during verification must equal replaying the
    emitted tokens through decode_step (the beam path's commit)."""
    params, prompt, dec0, first = setup(5)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)
    spec = SpecSpec(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, draft_layers=2,
        draft_k=3, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )
    res = speculative_greedy(
        params, CFG, jax.tree.map(lambda a: a.copy(), dec0), first, prompt,
        jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
        encoder_ngram_size=NGRAM,
    )
    n = int(res.n_tokens)
    toks = res.tokens[:n]
    _, dec_replay = L.decode_step(
        params, CFG, dec0, L.embed(params, toks[None])
    )
    V = int(res.dec.valid_len[0])
    assert V == int(dec_replay.valid_len[0])
    np.testing.assert_allclose(
        np.asarray(res.dec.k[:, :, :V]),
        np.asarray(dec_replay.k[:, :, :V]), atol=1e-5, rtol=1e-5,
    )


def test_spec_accept_all_machinery():
    """accept_all (bench-only) runs G tokens in ceil(G/(k+1)) rounds."""
    params, prompt, dec0, first = setup(7)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)
    spec = SpecSpec(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, draft_layers=1,
        draft_k=3, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
        accept_all=True,
    )
    res = speculative_greedy(
        params, CFG, dec0, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
        encoder_ngram_size=NGRAM,
    )
    assert int(res.n_tokens) == G
    assert int(res.rounds) == -(-G // 4)  # ceil(12/4) = 3


@pytest.mark.parametrize("head_vocab", [32, 96])
def test_spec_draft_head_exact(head_vocab):
    """A shortlist draft head (the draft scores only ``head_vocab`` vocab
    columns) must not change emitted tokens for ANY shortlist — a miss
    only costs acceptance, never correctness, because verify uses the
    full head."""
    from infinisst_tpu.decode.speculative import make_draft_head

    params, prompt, dec0, first = setup(0)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)
    ref, _ = seq_greedy(
        params, prompt, jax.tree.map(lambda a: a.copy(), dec0), first,
        -1, hist, hlen,
    )
    spec = SpecSpec(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, draft_layers=2,
        draft_k=4, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )
    dh = make_draft_head(params["lm_head"], head_vocab)
    res = speculative_greedy(
        params, CFG, dec0, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
        encoder_ngram_size=NGRAM, draft_head=dh,
    )
    got = res.tokens[: int(res.n_tokens)].tolist()
    assert got == ref, (head_vocab, got, ref)
    assert int(res.dec.valid_len[0]) == len(prompt) + len(got)


def test_spec_draft_head_adversarial_shortlist():
    """A shortlist engineered to MISS every greedy token still yields the
    exact greedy sequence (pure-verify regime: <=1 acceptance per round is
    possible but correctness is untouched)."""
    from infinisst_tpu.decode.speculative import make_draft_head

    params, prompt, dec0, first = setup(1)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)
    ref, _ = seq_greedy(
        params, prompt, jax.tree.map(lambda a: a.copy(), dec0), first,
        -1, hist, hlen,
    )
    bad = [i for i in range(CFG.vocab_size) if i not in set(ref)][:8]
    spec = SpecSpec(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, draft_layers=4,
        draft_k=3, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )
    dh = make_draft_head(params["lm_head"], 8, ids=jnp.asarray(bad))
    res = speculative_greedy(
        params, CFG, dec0, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
        encoder_ngram_size=NGRAM, draft_head=dh,
    )
    got = res.tokens[: int(res.n_tokens)].tolist()
    assert got == ref


def test_make_draft_head_layouts_and_gather_equivalence():
    """All three lm_head layouts slice correctly and the sliced head's
    scores equal a column-gather of the full head's scores (activation
    quantization depends only on the input row, so int8 layouts gather
    exactly)."""
    from infinisst_tpu.decode.speculative import make_draft_head
    from infinisst_tpu.models import quant

    key = jax.random.PRNGKey(0)
    D, V, HV = 64, 600, 40  # V deliberately not a 512 multiple
    w = jax.random.normal(key, (D, V), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(1), (3, D), jnp.float32)
    ids = jax.random.permutation(jax.random.PRNGKey(2), V)[:HV]

    # mode is signalled by STATIC pytree structure: default id-prefix
    # shortlists carry 'prefix' (pad re-entry), custom ones 'ids' (scatter)
    assert "prefix" in make_draft_head(w, HV)
    assert "ids" in make_draft_head(w, HV, ids=ids)

    # bf16/fp32 layout: plain column gather, no padding
    dh = make_draft_head(w, HV, ids=ids)
    assert dh["w"].shape == (D, HV)
    np.testing.assert_allclose(
        np.asarray(quant.mm(y, dh["w"])),
        np.asarray(quant.mm(y, w)[:, ids]), rtol=1e-5, atol=1e-5,
    )

    # W8A8 per-channel: scales gather with the columns; zero pad to 512
    q, s = quant.quantize_weight(w, axis=0)
    full = {"q": q, "scale_a8": s.astype(jnp.float32)}
    dh = make_draft_head(full, HV, ids=ids)
    assert dh["w"]["q"].shape == (D, 512)
    assert dh["w"]["scale_a8"].shape == (512,)
    assert float(jnp.abs(dh["w"]["scale_a8"][HV:]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(quant.mm(y, dh["w"])[:, :HV]),
        np.asarray(quant.mm(y, full)[:, ids]), rtol=1e-5, atol=1e-5,
    )

    # W8A8 grouped (quality belt): (G, V) scales gather on the last axis
    qg, sg = quant._quantize_grouped(w, 32)
    fullg = {"q": qg, "scale_a8": sg.astype(jnp.float32)}
    dh = make_draft_head(fullg, HV, ids=ids)
    assert dh["w"]["scale_a8"].shape == (D // 32, 512)
    assert float(jnp.abs(dh["w"]["scale_a8"][:, HV:]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(quant.mm(y, dh["w"])[:, :HV]),
        np.asarray(quant.mm(y, fullg)[:, ids]), rtol=1e-5, atol=1e-5,
    )


def test_lowrank_draft_head_exact():
    """Low-rank draft head (truncated-SVD factors): emissions must be
    the exact greedy sequence for ANY rank — full rank reproduces the
    head's logits, a tiny lossy rank only costs acceptance."""
    from infinisst_tpu.decode.speculative import (
        dequant_head, make_draft_head, make_lowrank_draft_head,
    )
    from infinisst_tpu.models import quant

    params, prompt, dec0, first = setup(4)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)
    ref, _ = seq_greedy(
        params, prompt, jax.tree.map(jnp.copy, dec0), first, -1, hist,
        hlen,
    )
    spec = SpecSpec(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, draft_layers=2,
        draft_k=4, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )

    w = params["lm_head"]
    D = CFG.hidden_size
    accepted = {}
    for rank in (D, 8):
        dh = make_lowrank_draft_head(w, rank)
        assert dh["w"]["a"].shape == (D, rank)
        assert dh["w"]["b"].shape == (rank, CFG.vocab_size)
        # a full-vocab replacement head: no shortlist re-entry keys
        assert "prefix" not in dh and "ids" not in dh
        res = speculative_greedy(
            params, CFG, jax.tree.map(jnp.copy, dec0), first, prompt,
            jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
            encoder_ngram_size=NGRAM, draft_head=dh,
        )
        assert res.tokens[: int(res.n_tokens)].tolist() == ref, rank
        accepted[rank] = int(res.accepted)

    # full-rank factors reconstruct the head exactly (Eckart-Young with
    # r = D), so acceptance equals the factor-free draft's
    base = speculative_greedy(
        params, CFG, jax.tree.map(jnp.copy, dec0), first, prompt,
        jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
        encoder_ngram_size=NGRAM,
    )
    assert accepted[D] == int(base.accepted)
    dh_full = make_lowrank_draft_head(w, D)
    np.testing.assert_allclose(
        np.asarray(dh_full["w"]["a"] @ dh_full["w"]["b"]),
        np.asarray(w), rtol=1e-4, atol=1e-4,
    )

    # the factored mm dispatch
    y = jax.random.normal(jax.random.PRNGKey(3), (2, D), jnp.float32)
    got = quant.mm(y, dh_full["w"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray((y @ dh_full["w"]["a"])
                                    @ dh_full["w"]["b"]), rtol=1e-6,
    )

    # dequant_head handles every quantized layout
    from infinisst_tpu.kernels.quant_matmul import quantize_weight

    q, s = quantize_weight(w, axis=0)
    for layout in (
        {"q": q, "scale": s},
        {"q": q, "scale_a8": s.astype(jnp.float32)},
    ):
        back = dequant_head(layout)
        np.testing.assert_allclose(
            back, np.asarray(w), atol=2.0 / 127 * float(jnp.abs(w).max())
        )
    qg, sg = quant._quantize_grouped(w, 16)
    back = dequant_head({"q": qg, "scale_a8": sg.astype(jnp.float32)})
    np.testing.assert_allclose(
        back, np.asarray(w), atol=2.0 / 127 * float(jnp.abs(w).max())
    )


def test_lowrank_draft_head_through_agent():
    """spec_lowrank_rank at agent init (SVD of the model's own head):
    streamed emissions identical to the factor-free speculative agent."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tests")
    from test_agent import make_agent

    outs = {}
    for kw in ({}, {"spec_lowrank_rank": 12}):
        agent = make_agent(speculative=True, spec_draft_layers=1,
                           spec_k=3, **kw)
        rng = np.random.RandomState(5)
        for i in range(3):
            agent.push(rng.randn(agent.chunk_samples).astype(np.float32)
                       * 0.1, finished=(i == 2))
        outs[bool(kw)] = list(agent.states.target_ids)
    assert outs[False] == outs[True]
    assert len(outs[False]) > 0
    # misconfiguration guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        make_agent(speculative=True, spec_lowrank_rank=8,
                   spec_head_vocab=32)
    with _pytest.raises(ValueError, match="not both"):
        make_agent(speculative=True, spec_lowrank_rank=8,
                   spec_lowrank_head={"a": np.zeros((1, 1)),
                                      "b": np.zeros((1, 1))})


def test_spec_row_cap_above_G_binds_to_G():
    """A caller passing row_max_new > max_new_tokens (the serve engine's
    pre-fix behaviour) must get exactly the G-capped greedy sequence —
    the decoder clamps the contract in-graph."""
    from infinisst_tpu.decode.speculative import batched_speculative_greedy

    params, prompt, dec0, first = setup(2)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)
    ref, _ = seq_greedy(
        params, prompt, jax.tree.map(lambda a: a.copy(), dec0), first,
        -1, hist, hlen,
    )
    spec = SpecSpec(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, draft_layers=2,
        draft_k=4, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )
    out = batched_speculative_greedy(
        params, CFG, dec0, first[None], prompt[None],
        jnp.asarray([len(prompt)], jnp.int32), hist[None], hlen[None],
        spec, jnp.ones((1,), bool),
        row_max_new=jnp.asarray([G + 7], jnp.int32),
        encoder_ngram_size=NGRAM,
    )
    toks, n_tok = out[0], out[1]
    assert int(n_tok[0]) == len(ref) == G
    assert toks[0, :G].tolist() == ref


def test_spec_eos_exactly_at_cap_is_not_hit():
    """EOS landing at the first position BEYOND the generation cap must
    NOT set hit_eos: the sequential loop exhausts range(G) without ever
    computing that step (the agent's n_emit rule depends on this flag, so
    a false hit would emit a token greedy never shows).  Engineered via a
    perfect draft (d=L) so the final verify round's window reaches past
    the cap."""
    params, prompt, dec0, first = setup(9)
    hist = jnp.full((16,), PAD, jnp.int32)
    hlen = jnp.zeros((), jnp.int32)

    # extended reference: the token at emission index G (first EXCLUDED)
    ref_ext, _ = seq_greedy(
        params, prompt, jax.tree.map(lambda a: a.copy(), dec0), first,
        -1, hist, hlen, steps=G + 2,
    )
    assert len(ref_ext) >= G + 1
    eos = ref_ext[G]  # would be the (G+1)-th greedy token
    # guard: the chosen eos id must not appear inside the emitted window
    # (else it truncates earlier and the boundary case never forms)
    if eos in ref_ext[:G]:
        pytest.skip("eos id re-occurs inside the window for this seed")

    spec = SpecSpec(
        max_new_tokens=G, eos_id=eos, pad_id=PAD, draft_layers=4,
        draft_k=4, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )
    res = speculative_greedy(
        params, CFG, dec0, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), hist, hlen, spec,
        encoder_ngram_size=NGRAM,
    )
    assert int(res.n_tokens) == G
    assert not bool(res.hit_eos)
    assert res.tokens[:G].tolist() == ref_ext[:G]
