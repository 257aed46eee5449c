"""Golden-fixture regression tests for the full agent step.

1. test_agent_golden_outputs: the tiny deterministic agent (seeded params +
   StubTokenizer) on fixed audio must reproduce the committed per-chunk
   token ids exactly — pins the template layout, splice offsets, beam
   selection, deferred-commit and history semantics against silent drift
   (VERDICT round-1 weak #3).  Regenerate with
   ``python -m tests.test_golden_agent`` after an INTENTIONAL change.
2. test_two_chunk_decode_matches_hf_generate: cross-chunk cache carry on a
   converted HF Llama — prefill chunk1 -> beam -> commit -> prefill chunk2
   -> beam must equal HF generate() recomputing each chunk from the full
   token history (the reference keeps the winning beam's KV the same way,
   patch_hf.py:924-935).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURE = os.path.join(os.path.dirname(__file__), "golden_agent_outputs.json")


def _run_tiny_agent():
    from tests.test_agent import make_agent

    agent = make_agent()
    rng = np.random.RandomState(1234)
    chunk = agent.chunk_samples
    per_chunk = []
    for i in range(5):
        audio = rng.randn(chunk).astype(np.float32) * 0.1
        before = len(agent.states.target_ids)
        agent.push(audio, finished=(i == 4))
        per_chunk.append([int(t) for t in agent.states.target_ids[before:]])
    return per_chunk


@pytest.mark.slow
def test_agent_golden_outputs():
    got = _run_tiny_agent()
    with open(FIXTURE) as f:
        want = json.load(f)["per_chunk_token_ids"]
    assert got == want, (
        "agent output drifted from the golden fixture — if the change is "
        "intentional, regenerate with `python -m tests.test_golden_agent`"
    )


@pytest.mark.slow
def test_two_chunk_decode_matches_hf_generate():
    torch = pytest.importorskip("torch")
    from tests.test_beam_parity import _models
    from infinisst_tpu.decode import beam as beam_mod
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.streaming.state import init_decoder_state

    hf, cfg, params = _models(7)
    rng = np.random.RandomState(3)
    ids1 = rng.randint(5, 120, (12,))
    ids2 = rng.randint(5, 120, (9,))
    eos_id, pad_id, max_new = 2, 3, 8
    spec = beam_mod.BeamSpec(
        beam=4, max_new_tokens=max_new, eos_id=eos_id, pad_id=pad_id,
    )

    def hf_gen(prompt_ids):
        with torch.no_grad():
            out = hf.generate(
                torch.tensor(np.asarray(prompt_ids, np.int64)[None]),
                num_beams=4, max_new_tokens=max_new, do_sample=False,
                eos_token_id=eos_id, pad_token_id=pad_id,
                length_penalty=1.0, early_stopping=False,
            )
        g = out[0, len(prompt_ids):].tolist()
        while g and g[-1] == pad_id:
            g.pop()
        if g and g[-1] == eos_id:
            g = g[:-1]
        return g

    # HF reference: chunk 2 recomputes from the full history
    hf1 = hf_gen(ids1)
    hf2 = hf_gen(list(ids1) + hf1 + list(ids2))

    # ours: persistent cache across chunks, commit-replay of the winner
    st = init_decoder_state(
        cfg.num_layers, 1, 128, cfg.num_kv_heads, cfg.head_dim,
        dtype=jnp.float32,
    )

    def chunk(st, prompt_ids):
        x = L.embed(params, jnp.asarray(prompt_ids)[None])
        logits, st = L.decode_step(params, cfg, st, x)
        res = beam_mod.beam_search(
            params, cfg, st, logits[0, -1], jnp.asarray(prompt_ids),
            jnp.asarray(len(prompt_ids), jnp.int32),
            jnp.zeros((4,), jnp.int32), jnp.asarray(0, jnp.int32), spec,
        )
        n = int(res.n_tokens)
        won = np.asarray(res.tokens[:n]).tolist()
        # commit the winning tokens into the persistent cache
        if n:
            xe = L.embed(params, jnp.asarray(won)[None])
            _, st = L.decode_step(params, cfg, st, xe)
        return st, won

    st, ours1 = chunk(st, list(ids1))
    st, ours2 = chunk(st, list(ids2))

    assert ours1 == hf1, (ours1, hf1)
    assert ours2 == hf2, (ours2, hf2)


if __name__ == "__main__":
    # replicate the pytest environment exactly (CPU backend, highest
    # matmul precision) so the fixture is reproducible under the suite
    import tests.conftest  # noqa: F401

    out = {"per_chunk_token_ids": _run_tiny_agent()}
    with open(FIXTURE, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {FIXTURE}: {out}")
