"""Beam-search parity vs HF generate on a tiny converted Llama.

Validates that our jitted lax.while_loop beam engine reproduces HF's
BeamSearchScorer semantics (the behaviour the reference patches but keeps,
patch_hf.py): same winning token sequence under beam=4 with repetition
penalty and no-repeat-ngram processors, greedy tie-breaking aside.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinisst_tpu.convert import from_torch as C
from infinisst_tpu.core.config import LlamaConfig
from infinisst_tpu.decode import beam as beam_mod
from infinisst_tpu.models import llama as L
from infinisst_tpu.streaming.state import init_decoder_state

torch = pytest.importorskip("torch")


def _models(seed):
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=500000.0,
        rope_scaling=False,
    )
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    return hf, cfg, C.to_jax(C.convert_llama(sd, cfg))


@pytest.mark.slow
@pytest.mark.parametrize("seed,max_new", [(0, 8), (3, 12)])
def test_beam_matches_hf(seed, max_new):
    hf, cfg, params = _models(seed)
    rng = np.random.RandomState(seed)
    prompt = rng.randint(5, 120, (1, 7))
    eos_id = 2
    pad_id = 3

    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(prompt),
            num_beams=4,
            max_new_tokens=max_new,
            do_sample=False,
            no_repeat_ngram_size=3,
            repetition_penalty=1.2,
            eos_token_id=eos_id,
            pad_token_id=pad_id,
            length_penalty=1.0,
            early_stopping=False,
        )
    hf_gen = hf_out[0, prompt.shape[1]:].tolist()
    # strip trailing pads + the final eos if present
    while hf_gen and hf_gen[-1] == pad_id:
        hf_gen.pop()
    hf_hit_eos = bool(hf_gen) and hf_gen[-1] == eos_id
    if hf_hit_eos:
        hf_gen = hf_gen[:-1]

    # ours: prefill then beam
    st = init_decoder_state(
        cfg.num_layers, 1, 64, cfg.num_kv_heads, cfg.head_dim,
        dtype=jnp.float32,
    )
    x = L.embed(params, jnp.asarray(prompt))
    logits, st = L.decode_step(params, cfg, st, x)
    spec = beam_mod.BeamSpec(
        beam=4,
        max_new_tokens=max_new,
        eos_id=eos_id,
        pad_id=pad_id,
        no_repeat_ngram_size=3,
        repetition_penalty=1.2,
    )
    res = beam_mod.beam_search(
        params, cfg, st, logits[0, -1],
        jnp.asarray(prompt[0]), jnp.asarray(prompt.shape[1], jnp.int32),
        jnp.zeros((4,), jnp.int32), jnp.asarray(0, jnp.int32),
        spec,
    )
    ours = np.asarray(res.tokens[: int(res.n_tokens)]).tolist()
    assert ours == hf_gen, (ours, hf_gen, hf_hit_eos, bool(res.hit_eos))


@pytest.mark.slow
def test_sample_decode_runs_and_respects_filters():
    """Sampling path: top-k=1 must reduce to greedy; filters keep the
    sampler inside the allowed set."""
    from infinisst_tpu.decode.beam import SampleSpec, sample_decode
    from infinisst_tpu.streaming.state import init_decoder_state

    hf, cfg, params = _models(0)
    prompt = np.random.RandomState(1).randint(5, 120, (1, 6))
    st = init_decoder_state(
        cfg.num_layers, 1, 64, cfg.num_kv_heads, cfg.head_dim,
        dtype=jnp.float32,
    )
    x = L.embed(params, jnp.asarray(prompt))
    logits, st = L.decode_step(params, cfg, st, x)

    spec = SampleSpec(
        max_new_tokens=6, eos_id=2, pad_id=3, top_k=1, temperature=1.0,
    )
    res = sample_decode(
        params, cfg, st, logits[0, -1], jnp.asarray(prompt[0]),
        jnp.asarray(prompt.shape[1], jnp.int32),
        jnp.zeros((4,), jnp.int32), jnp.asarray(0, jnp.int32),
        spec, jax.random.PRNGKey(0),
    )
    # top-k=1 == greedy: must equal a second run with another rng key
    res2 = sample_decode(
        params, cfg, st, logits[0, -1], jnp.asarray(prompt[0]),
        jnp.asarray(prompt.shape[1], jnp.int32),
        jnp.zeros((4,), jnp.int32), jnp.asarray(0, jnp.int32),
        spec, jax.random.PRNGKey(123),
    )
    a = np.asarray(res.tokens[: int(res.n_tokens)])
    b = np.asarray(res2.tokens[: int(res2.n_tokens)])
    np.testing.assert_array_equal(a, b)
    assert int(res.n_tokens) > 0

    # stochastic mode produces valid ids and terminates
    spec2 = SampleSpec(max_new_tokens=6, eos_id=2, pad_id=3, top_p=0.9,
                       temperature=1.3)
    res3 = sample_decode(
        params, cfg, st, logits[0, -1], jnp.asarray(prompt[0]),
        jnp.asarray(prompt.shape[1], jnp.int32),
        jnp.zeros((4,), jnp.int32), jnp.asarray(0, jnp.int32),
        spec2, jax.random.PRNGKey(7),
    )
    toks = np.asarray(res3.tokens[: int(res3.n_tokens)])
    assert ((toks >= 0) & (toks < 128)).all()


@pytest.mark.slow
@pytest.mark.parametrize("plen,length_penalty", [(60, 1.0), (60, 2.0)])
def test_beam_matches_hf_long_prompt(plen, length_penalty):
    """Length normalisation must use GENERATED length only (HF >=4.38 /
    the reference's patched scorer divide by cur_len - decoder_prompt_len).
    With a realistic ~60-token prompt a prompt-inclusive denominator makes
    length_penalty behave like ~0 and flips winners — this pins it."""
    hf, cfg, params = _models(5)
    rng = np.random.RandomState(11)
    prompt = rng.randint(5, 120, (1, plen))
    eos_id = 2
    pad_id = 3
    max_new = 10

    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(prompt),
            num_beams=4,
            max_new_tokens=max_new,
            do_sample=False,
            no_repeat_ngram_size=3,
            repetition_penalty=1.2,
            eos_token_id=eos_id,
            pad_token_id=pad_id,
            length_penalty=length_penalty,
            early_stopping=False,
        )
    hf_gen = hf_out[0, prompt.shape[1]:].tolist()
    while hf_gen and hf_gen[-1] == pad_id:
        hf_gen.pop()
    if hf_gen and hf_gen[-1] == eos_id:
        hf_gen = hf_gen[:-1]

    st = init_decoder_state(
        cfg.num_layers, 1, 128, cfg.num_kv_heads, cfg.head_dim,
        dtype=jnp.float32,
    )
    x = L.embed(params, jnp.asarray(prompt))
    logits, st = L.decode_step(params, cfg, st, x)
    spec = beam_mod.BeamSpec(
        beam=4,
        max_new_tokens=max_new,
        eos_id=eos_id,
        pad_id=pad_id,
        no_repeat_ngram_size=3,
        repetition_penalty=1.2,
        length_penalty=length_penalty,
    )
    res = beam_mod.beam_search(
        params, cfg, st, logits[0, -1],
        jnp.asarray(prompt[0]), jnp.asarray(prompt.shape[1], jnp.int32),
        jnp.zeros((4,), jnp.int32), jnp.asarray(0, jnp.int32),
        spec,
    )
    ours = np.asarray(res.tokens[: int(res.n_tokens)]).tolist()
    assert ours == hf_gen, (ours, hf_gen)
