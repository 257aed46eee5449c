"""Logit processors as pure jnp functions over fixed-size token buffers.

Replicates the HF processors the reference relies on
(agents/infinisst.py:307-332): repetition penalty, no-repeat-ngram over the
current call's sequence, encoder-no-repeat-ngram over the cross-chunk target
history (patch_hf.py:358,590), token suppression, and the sampling filters
(top-k / top-p / epsilon / temperature) used by the DPO sampling path.

All operate on (beam, V) score tensors and fixed-length (beam, T) token
buffers with an explicit valid length, so they are jit/scan friendly.
Processors apply to log-softmax scores, matching HF ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e9


def repetition_penalty(
    scores: jnp.ndarray,  # (B, V) log-probs (<= 0)
    tokens: jnp.ndarray,  # (B, T) token buffer (prompt + generated)
    valid: jnp.ndarray,  # (B, T) bool
    penalty: float,
) -> jnp.ndarray:
    """HF semantics: score>0 -> score/penalty else score*penalty for every
    token present in the sequence."""
    if penalty == 1.0:
        return scores
    V = scores.shape[-1]

    def presence(toks, val):
        return jnp.zeros((V,), bool).at[toks].max(val)

    present = jax.vmap(presence)(tokens, valid)
    penalized = jnp.where(scores > 0, scores / penalty, scores * penalty)
    return jnp.where(present, penalized, scores)


def _ngram_bans(
    scores_shape_v: int,
    source: jnp.ndarray,  # (B, Ts) tokens containing candidate ngrams
    source_valid_len: jnp.ndarray,  # (B,) int32
    suffix: jnp.ndarray,  # (B, n-1) the last n-1 generated tokens
    have_suffix: jnp.ndarray,  # (B,) bool — enough tokens generated
) -> jnp.ndarray:
    """Return bool (B, V): True = banned.  Bans token source[i+n-1] whenever
    source[i : i+n-1] == suffix and the window lies within the valid span."""
    B, Ts = source.shape
    nm1 = suffix.shape[1]
    n_windows = Ts - nm1
    if n_windows <= 0:
        return jnp.zeros((B, scores_shape_v), bool)

    idx = (
        lax.broadcasted_iota(jnp.int32, (n_windows, nm1), 0)
        + lax.broadcasted_iota(jnp.int32, (n_windows, nm1), 1)
    )  # (W, n-1) window indices
    windows = source[:, idx]  # (B, W, n-1)
    match = (windows == suffix[:, None, :]).all(-1)  # (B, W)
    win_end = jnp.arange(n_windows) + nm1  # index of banned token
    in_valid = win_end[None, :] <= source_valid_len[:, None] - 1
    match = match & in_valid & have_suffix[:, None]
    banned_tok = source[
        jnp.arange(B)[:, None], jnp.minimum(win_end, Ts - 1)[None, :]
    ]  # (B, W)

    def scatter(toks, m):
        return jnp.zeros((scores_shape_v,), bool).at[toks].max(m)

    return jax.vmap(scatter)(banned_tok, match)


def no_repeat_ngram(
    scores: jnp.ndarray,  # (B, V)
    tokens: jnp.ndarray,  # (B, T) current call's sequence buffer
    valid_len: jnp.ndarray,  # (B,)
    ngram_size: int,
) -> jnp.ndarray:
    if ngram_size <= 0:
        return scores
    nm1 = ngram_size - 1
    B, T = tokens.shape

    def tail(toks, v):
        return lax.dynamic_slice(toks, (jnp.maximum(v - nm1, 0),), (nm1,))

    suffix = jax.vmap(tail)(tokens, valid_len)
    have = valid_len >= nm1 + 1  # need at least one full window candidate
    bans = _ngram_bans(scores.shape[-1], tokens, valid_len, suffix, have)
    return jnp.where(bans, NEG_INF, scores)


def encoder_no_repeat_ngram(
    scores: jnp.ndarray,  # (B, V)
    history: jnp.ndarray,  # (B, Lh) cross-chunk target history (lookback)
    history_len: jnp.ndarray,  # (B,)
    tokens: jnp.ndarray,  # (B, T) current sequence buffer
    valid_len: jnp.ndarray,
    ngram_size: int,
) -> jnp.ndarray:
    """Ban continuations of (n-1)-grams that appear in the target history —
    the cross-chunk repetition guard (ref: patch_hf.py:358, generate kwarg
    encoder_input_ids; agents/infinisst.py:298-301)."""
    if ngram_size <= 0:
        return scores
    nm1 = ngram_size - 1

    def tail(toks, v):
        return lax.dynamic_slice(toks, (jnp.maximum(v - nm1, 0),), (nm1,))

    suffix = jax.vmap(tail)(tokens, valid_len)
    have = valid_len >= nm1
    bans = _ngram_bans(scores.shape[-1], history, history_len, suffix, have)
    return jnp.where(bans, NEG_INF, scores)


def suppress_tokens(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mask: (V,) bool, True = suppress."""
    return jnp.where(mask[None, :], NEG_INF, scores)


# ---------------------------------------------------------------------------
# Sampling filters (DPO sampling path; ref: agents/options.py top_p/top_k/
# epsilon_cutoff/temperature)


def temperature_scale(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    return logits / max(temperature, 1e-6)


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])  # HF clamps k to the vocab size
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep top-1)
    cutoff_mask = cum - probs > p
    threshold = jnp.where(cutoff_mask, jnp.inf, sorted_logits).min(
        -1, keepdims=True
    )
    return jnp.where(logits < threshold, NEG_INF, logits)


def epsilon_filter(logits: jnp.ndarray, eps: float) -> jnp.ndarray:
    if eps <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    # HF's EpsilonLogitsWarper keeps min_tokens_to_keep=1: the top-1 token
    # always survives, so a high cutoff on a flat distribution cannot mask
    # the whole vocabulary
    is_top1 = (
        jnp.arange(logits.shape[-1]) == jnp.argmax(logits, -1, keepdims=True)
    )
    return jnp.where((probs < eps) & ~is_top1, NEG_INF, logits)
