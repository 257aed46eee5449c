"""Training losses.

- Shifted cross-entropy with IGNORE_INDEX masking
  (ref: model/llm.py:240-258).
- Optional CPO preference loss over win/lose pairs stacked in the batch
  (ref: model/llm.py:248-256).
- WACO contrastive alignment loss for speech-encoder pretraining
  (ref: model/speech_encoder.py:254-284).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def shifted_ce(
    logits: jnp.ndarray,  # (B, S, V)
    labels: jnp.ndarray,  # (B, S) with IGNORE_INDEX outside targets
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sequence summed NLL and per-sequence target-token counts.

    Tokens < n predict n: logits[..., :-1, :] vs labels[..., 1:].
    """
    lg = logits[:, :-1].astype(jnp.float32)
    lb = labels[:, 1:]
    mask = lb != IGNORE_INDEX
    lb_safe = jnp.where(mask, lb, 0)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, lb_safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(mask, nll, 0.0)
    return nll.sum(-1), mask.sum(-1)


def lm_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    cpo_beta: float = 0.0,
) -> jnp.ndarray:
    """Mean NLL over target tokens; with cpo_beta > 0 the batch is
    interpreted as [winners; losers] halves and the CPO sigmoid loss is
    added to the winners' NLL (ref: model/llm.py:248-256)."""
    seq_nll, seq_cnt = shifted_ce(logits, labels)
    if cpo_beta > 0:
        bsz = labels.shape[0] // 2
        logp_w = -seq_nll[:bsz]
        logp_l = -seq_nll[bsz:]
        cpo = -jax.nn.log_sigmoid(cpo_beta * (logp_w - logp_l)).mean()
        nll = seq_nll[:bsz].sum() / jnp.maximum(seq_cnt[:bsz].sum(), 1)
        return nll + cpo
    return seq_nll.sum() / jnp.maximum(seq_cnt.sum(), 1)


def waco_loss(
    speech_word_emb: jnp.ndarray,  # (N, D) mean speech embedding per word
    text_word_emb: jnp.ndarray,  # (N, D)
    temperature: float = 0.5,
) -> jnp.ndarray:
    """Contrastive (InfoNCE over cosine similarity) word-level alignment
    loss (ref: model/speech_encoder.py:276-284)."""
    s = speech_word_emb / (
        jnp.linalg.norm(speech_word_emb, axis=-1, keepdims=True) + 1e-8
    )
    t = text_word_emb / (
        jnp.linalg.norm(text_word_emb, axis=-1, keepdims=True) + 1e-8
    )
    sim = s @ t.T / temperature
    labels = jnp.arange(sim.shape[0])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -logp[labels, labels].mean()
