"""Early-exit draft adapter (train/draft.py + models/llama.apply_exit_adapter).

Three contracts:
  1. a zero-init adapter is an exact identity (plugging it in changes
     nothing, bit-for-bit);
  2. ANY adapter leaves speculative decoding exactly greedy (it is
     draft-only; the verify forward never sees it) — only acceptance,
     and therefore speed, can change;
  3. distillation actually raises draft/target top-1 agreement and
     measured acceptance on a trained model at small draft depth.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinisst_tpu.decode.speculative import SpecSpec, speculative_greedy
from infinisst_tpu.models import llama as L
from infinisst_tpu.streaming.state import init_decoder_state
from infinisst_tpu.train import draft as DR

sys.path.insert(0, "/root/repo")  # root-level tools_* helpers
sys.path.insert(0, "/root/repo/tests")

from test_speculative import (  # noqa: E402
    CFG, G, NGRAM, PAD, REP, seq_greedy, setup,
)


def _spec(d, k=4):
    return SpecSpec(
        max_new_tokens=G, eos_id=-1, pad_id=PAD, draft_layers=d,
        draft_k=k, no_repeat_ngram_size=NGRAM, repetition_penalty=REP,
    )


def _run(params, prompt, dec, first, d, adapter):
    hist = jnp.full((16,), PAD, jnp.int32)
    return speculative_greedy(
        params, CFG, dec, first, prompt,
        jnp.asarray(len(prompt), jnp.int32), hist,
        jnp.zeros((), jnp.int32), _spec(d),
        encoder_ngram_size=NGRAM, exit_adapter=adapter,
    )


def test_zero_init_adapter_is_identity():
    """w2 = 0 at init: tokens, rounds, AND acceptance identical to the
    adapter-free draft."""
    params, prompt, dec, first = setup(seed=3)
    adapter = DR.init_exit_adapter(jax.random.PRNGKey(0), CFG, rank=32)
    base = _run(params, prompt, jax.tree.map(jnp.copy, dec), first, 2, None)
    with_a = _run(params, prompt, dec, first, 2, adapter)
    assert base.tokens.tolist() == with_a.tokens.tolist()
    assert int(base.rounds) == int(with_a.rounds)
    assert int(base.accepted) == int(with_a.accepted)


@pytest.mark.parametrize("seed", [0, 1])
def test_arbitrary_adapter_stays_greedy_exact(seed):
    """A random (garbage) adapter may wreck acceptance but can never
    change the emitted tokens."""
    params, prompt, dec, first = setup(seed=seed)
    hist = jnp.full((16,), PAD, jnp.int32)
    ref, _ = seq_greedy(
        params, prompt, jax.tree.map(jnp.copy, dec), first, -1, hist,
        jnp.zeros((), jnp.int32),
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 7))
    adapter = {
        "ln": jnp.ones((CFG.hidden_size,)),
        "w1": jax.random.normal(k1, (CFG.hidden_size, 16)),
        "w2": jax.random.normal(k2, (16, CFG.hidden_size)),
    }
    res = _run(params, prompt, dec, first, 1, adapter)
    assert res.tokens[: int(res.n_tokens)].tolist() == ref


def test_save_load_roundtrip_and_depth_check(tmp_path):
    adapter = DR.init_exit_adapter(jax.random.PRNGKey(1), CFG, rank=16)
    path = str(tmp_path / "ada.npz")
    DR.save_adapter(path, adapter, d=2)
    back = DR.load_adapter(path, expect_d=2, dtype=jnp.bfloat16)
    assert back["w1"].dtype == jnp.bfloat16
    assert back["w1"].shape == adapter["w1"].shape
    np.testing.assert_allclose(
        np.asarray(back["ln"], np.float32), np.asarray(adapter["ln"]),
    )
    with pytest.raises(ValueError, match="draft_layers=2"):
        DR.load_adapter(path, expect_d=4)


def test_cli_adapter_guards(tmp_path):
    from argparse import Namespace

    from infinisst_tpu.agents.cli import _load_adapter

    assert _load_adapter(Namespace(spec_adapter=None)) is None
    path = str(tmp_path / "a.npz")
    DR.save_adapter(
        path, DR.init_exit_adapter(jax.random.PRNGKey(0), CFG, 8), d=8
    )
    with pytest.raises(SystemExit, match="--speculative"):
        _load_adapter(Namespace(spec_adapter=path, speculative=False))
    got = _load_adapter(Namespace(
        spec_adapter=path, speculative=True, spec_draft_layers=8,
    ))
    assert got["w1"].shape == (CFG.hidden_size, 8)


def test_distill_rejects_quantized_params():
    from infinisst_tpu.models.quant import quantize_llama_params
    from tools_quant_fidelity import CFG as TCFG  # 128-divisible dims

    params = L.init_params(jax.random.PRNGKey(0), TCFG, jnp.float32)
    qp = quantize_llama_params(
        params, quantize_lm_head=True, act_int8=True
    )
    with pytest.raises(ValueError, match="unquantized"):
        DR.distill(qp, TCFG, 1, [np.zeros((1, 4), np.int32)], steps=1)


def test_distill_adapter_cli_tool(tmp_path):
    """tools_distill_adapter.py end-to-end on the dryrun preset with
    id-line prompts: rollouts, distillation, and a depth-stamped npz
    that load_adapter accepts at the right depth and refuses elsewhere."""
    sys.path.insert(0, "/root/repo")
    import tools_distill_adapter as T

    rng = np.random.RandomState(0)
    pfile = tmp_path / "prompts.txt"
    with open(pfile, "w") as f:
        for _ in range(4):
            f.write(" ".join(str(x) for x in rng.randint(5, 200, 8)) + "\n")
        f.write("1 2\n")  # too short: dropped, not fatal
    out = str(tmp_path / "ada.npz")
    T.main([
        "--model-preset", "dryrun", "--prompts", str(pfile),
        "--prompt-tokens", "6", "--gen-len", "8", "--batch-size", "2",
        "--draft-layers", "1", "--rank", "8", "--steps", "12",
        "--out", out,
    ])
    back = DR.load_adapter(out, expect_d=1)
    assert back["w1"].shape[1] == 8
    with pytest.raises(ValueError, match="draft_layers=1"):
        DR.load_adapter(out, expect_d=2)


def test_rollout_distill_lifts_production_acceptance():
    """The deployable recipe end-to-end: distill the exit adapter on the
    TARGET MODEL'S OWN greedy rollouts (train/draft.rollout_corpus) from
    the serving prompts, then decode those prompts through the
    production speculative path.  Asserts

      1. distillation collapses the KL and lifts rollout-position top-1
         agreement from raw layer-skip (~0.15 here) above 0.9;
      2. emissions stay exactly greedy (token-identical to no-adapter);
      3. acceptance rises MATERIALLY (>= 2x; measured ~0.04 -> ~0.47)
         and verify rounds drop — the quantity that buys wall-clock.

    Teacher-forced corpus distillation is the negative control in
    docs/spec_acceptance.json (adapter(corpus-TF) rows): agreement ~1.0
    on its own batch, acceptance unchanged — exposure bias.  The model
    here is trained on a wide corpus with few steps so logits keep
    realistic entropy (an overfit 8-sequence model pins every rollout
    to memorized text and the raw draft already saturates)."""
    from tools_quant_fidelity import CFG as TCFG
    from tools_quant_fidelity import make_corpus, train

    rng = np.random.RandomState(0)
    corpus = make_corpus(rng, n_seq=64, S=64)
    params = L.init_params(jax.random.PRNGKey(0), TCFG, jnp.float32)
    params = train(params, corpus, 150)

    prompts = jnp.asarray(make_corpus(np.random.RandomState(50), 8, 8))
    rollouts = DR.rollout_corpus(params, TCFG, prompts, 32)
    adapter, hist = DR.distill(
        params, TCFG, 1, [rollouts], steps=300, lr=2e-3,
        key=jax.random.PRNGKey(5), log_every=150,
    )
    assert hist[-1][1] < hist[0][1] * 0.2, hist  # KL collapsed
    assert hist[0][2] < 0.6, hist  # raw layer-skip draft was poor here
    assert hist[-1][2] > 0.9, hist  # distilled agreement high

    spec = SpecSpec(
        max_new_tokens=24, eos_id=-1, pad_id=0, draft_layers=1, draft_k=4,
        no_repeat_ngram_size=0, repetition_penalty=1.0,
    )
    hist_buf = jnp.zeros((8,), jnp.int32)

    def run(exit_adapter, prompt):
        st = init_decoder_state(
            TCFG.num_layers, 1, len(prompt) + 24 + 5, TCFG.num_kv_heads,
            TCFG.head_dim, jnp.float32,
        )
        lg, st = L.decode_step(
            params, TCFG, st, L.embed(params, prompt[None])
        )
        res = speculative_greedy(
            params, TCFG, st, lg[0, -1, : TCFG.vocab_size], prompt,
            jnp.asarray(len(prompt), jnp.int32), hist_buf,
            jnp.zeros((), jnp.int32), spec, exit_adapter=exit_adapter,
        )
        return (
            int(res.accepted), int(res.rounds),
            res.tokens[: int(res.n_tokens)].tolist(),
        )

    base_acc = base_rounds = with_acc = with_rounds = 0
    for i in range(prompts.shape[0]):
        b, rb, toks_b = run(None, prompts[i])
        w, rw, toks_w = run(adapter, prompts[i])
        assert toks_b == toks_w  # exactness: emissions never change
        base_acc += b
        base_rounds += rb
        with_acc += w
        with_rounds += rw
    assert with_acc >= 2 * max(base_acc, 1), (base_acc, with_acc)
    assert with_rounds < base_rounds, (base_rounds, with_rounds)


def test_collect_targets_x_matches_ids_path():
    """collect_targets_x over embed(ids) is EXACTLY collect_targets(ids)
    — the serving-context entry point (speech-spliced embeddings,
    tools_spec_trained_teacher.py) shares the ids path's numerics."""
    params = L.init_params(jax.random.PRNGKey(3), CFG, jnp.float32)
    ids = jnp.asarray(
        np.random.RandomState(1).randint(0, CFG.vocab_size, (2, 12)),
        jnp.int32,
    )
    mask = jnp.ones((2, 12), jnp.float32).at[1, 9:].set(0.0)
    h_a, t_a = DR.collect_targets(params, CFG, ids, 1, mask)
    h_b, t_b = DR.collect_targets_x(
        params, CFG, L.embed(params, ids), 1, mask
    )
    np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_b))
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))


def test_distill_on_features_matches_distill():
    """distill_on_features over precollected (h_d, teacher, mask)
    reproduces distill() exactly on the same single-batch problem (same
    init key, same Adam trajectory) — the feature-path refactor changes
    where the teacher pass runs, not the optimization."""
    params = L.init_params(jax.random.PRNGKey(4), CFG, jnp.float32)
    ids = jnp.asarray(
        np.random.RandomState(2).randint(1, CFG.vocab_size, (2, 16)),
        jnp.int32,
    )
    key = jax.random.PRNGKey(9)
    a1, h1 = DR.distill(
        params, CFG, 1, [ids], steps=40, lr=1e-2, key=key, pad_id=0,
        log_every=20,
    )
    mask = (ids != 0).astype(jnp.float32)
    feats = [(*DR.collect_targets(params, CFG, ids, 1, mask), mask)]
    a2, h2 = DR.distill_on_features(
        params, CFG, feats, steps=40, lr=1e-2, key=key, log_every=20,
    )
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-6
        ),
        a1, a2,
    )
    assert [round(a, 4) for _, _, a in h1] == [
        round(a, 4) for _, _, a in h2
    ]


def test_offline_spliced_embeddings_semantics():
    """Patch positions carry the adapter's speech embeddings in row-order;
    non-patch positions carry the token embeddings."""
    from infinisst_tpu.core.presets import dryrun_config
    from infinisst_tpu.models import adapter as AD
    from infinisst_tpu.models import speech_llm as SL
    from infinisst_tpu.models import wav2vec2 as W

    cfg = dryrun_config()
    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2),
        "adapter": AD.init_params(jax.random.fold_in(k, 1), cfg.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama),
    }
    B, S = 1, 10
    samples = jnp.asarray(
        np.random.RandomState(0).randn(B, 2 * 15360).astype(np.float32)
        * 0.1
    )
    ids = jnp.full((B, S), 5, jnp.int32)
    patch_mask = jnp.zeros((B, S), bool).at[:, 3:7].set(True)
    emb = SL.offline_spliced_embeddings(
        params, cfg, samples, ids, patch_mask, 48, 96,
        dropout_rate=0.0,
    )
    frames = W.forward(params["w2v2"], cfg.w2v2, samples, 48, 96)
    speech = AD.forward(params["adapter"], cfg.adapter, frames)
    tok = L.embed(params["llama"], ids)
    np.testing.assert_allclose(
        np.asarray(emb[:, 3:7]), np.asarray(speech[:, :4]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(emb[:, :3]), np.asarray(tok[:, :3])
    )
    np.testing.assert_array_equal(
        np.asarray(emb[:, 7:]), np.asarray(tok[:, 7:])
    )
