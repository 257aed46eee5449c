"""Loss-function unit tests: shifted CE masking, CPO pairing, WACO, and the
sampling logit filters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinisst_tpu.decode import logits as lp
from infinisst_tpu.train.objective import (
    IGNORE_INDEX,
    lm_loss,
    shifted_ce,
    waco_loss,
)


def test_shifted_ce_ignores_masked():
    V = 8
    logits = jnp.zeros((1, 4, V))  # uniform -> nll = log V per token
    labels = jnp.asarray([[IGNORE_INDEX, 2, IGNORE_INDEX, 3]])
    nll, cnt = shifted_ce(logits, labels)
    assert int(cnt[0]) == 2  # positions 1 and 3 (shifted)
    np.testing.assert_allclose(float(nll[0]), 2 * np.log(V), rtol=1e-5)


def test_lm_loss_cpo():
    V = 8
    rng = jax.random.PRNGKey(0)
    row = jax.random.normal(rng, (1, 5, V))
    logits = jnp.tile(row, (2, 1, 1))  # identical win/lose halves
    labels = jnp.asarray([[1, 2, 3, 4, 5], [1, 2, 3, 4, 5]])
    plain = lm_loss(logits, labels)
    cpo = lm_loss(logits, labels, cpo_beta=0.1)
    assert np.isfinite(float(plain)) and np.isfinite(float(cpo))
    # identical win/lose halves -> cpo term = -log sigmoid(0) = log 2
    w_nll, w_cnt = shifted_ce(logits[:1], labels[:1])
    expected = float(w_nll.sum() / w_cnt.sum()) + float(np.log(2))
    np.testing.assert_allclose(float(cpo), expected, rtol=1e-5)


def test_waco_identity_alignment():
    emb = jax.random.normal(jax.random.PRNGKey(1), (6, 16))
    # perfectly aligned pairs -> low loss; shuffled pairs -> higher
    aligned = waco_loss(emb, emb, temperature=0.1)
    shuffled = waco_loss(emb, jnp.roll(emb, 1, axis=0), temperature=0.1)
    assert float(aligned) < float(shuffled)


def test_top_k_top_p_epsilon():
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    k2 = lp.top_k_filter(logits, 2)
    assert np.isfinite(np.asarray(k2[0, :2])).all()
    assert (np.asarray(k2[0, 2:]) < -1e8).all()

    p = lp.top_p_filter(logits, 0.5)
    # top prob is ~0.64 > 0.5, so only the top token survives
    assert np.isfinite(float(p[0, 0]))
    assert (np.asarray(p[0, 1:]) < -1e8).all()

    e = lp.epsilon_filter(logits, 0.2)
    probs = np.asarray(jax.nn.softmax(logits, -1)[0])
    kept = np.asarray(e[0]) > -1e8
    np.testing.assert_array_equal(kept, probs >= 0.2)


def test_repetition_penalty_signs():
    scores = jnp.asarray([[-1.0, -2.0, 0.5]])
    toks = jnp.asarray([[0, 2]])
    valid = jnp.ones((1, 2), bool)
    out = lp.repetition_penalty(scores, toks, valid, 2.0)
    np.testing.assert_allclose(np.asarray(out[0]), [-2.0, -2.0, 0.25])


def test_epsilon_filter_keeps_top1():
    """HF EpsilonLogitsWarper semantics: even a cutoff above the max
    probability leaves the top-1 token unmasked."""
    from infinisst_tpu.decode.logits import NEG_INF, epsilon_filter

    logits = jnp.asarray([[0.1, 0.2, 0.15, 0.05]])  # nearly flat
    out = np.asarray(epsilon_filter(logits, eps=0.9))
    assert out[0, 1] > NEG_INF / 2  # argmax survives
    assert (out[0, [0, 2, 3]] < NEG_INF / 2).all()


def test_top_k_filter_clamps_to_vocab():
    from infinisst_tpu.decode.logits import top_k_filter

    logits = jnp.asarray([[0.3, 0.1, 0.2]])
    out = np.asarray(top_k_filter(logits, k=10_000))
    np.testing.assert_array_equal(out, np.asarray(logits))  # no-op
