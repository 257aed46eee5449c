"""Block-causal streaming attention masks as pure jnp functions.

Semantics mirror the reference mask builders (which build boolean masks with
Python loops over torch tensors):

- ``block_causal_mask``    <-> get_attn_mask_training
  (ref: model/patches/patch_speech_encoder.py:30-50)
- ``streaming_chunk_mask`` <-> get_attn_mask_inference
  (ref: model/patches/patch_speech_encoder.py:52-77)

Unlike the reference, everything here is built from broadcasted iotas so the
masks can be constructed inside jit with static shapes, and the streaming
variant is parameterised by traced values (``n_steps``) so one compiled
program serves the whole stream.

Convention: returned masks are boolean with True = "may attend".  Use
``additive(mask, dtype)`` to convert to a 0/-inf bias for softmax.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

NEG_INF = -1e9  # finite -inf stand-in; avoids NaNs for fully-masked rows


def additive(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean mask -> additive bias (0 where allowed, -inf where masked)."""
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), NEG_INF, dtype))


def block_causal_mask(
    seq_len: int, max_cache_size: int | None = None, blocksize: int = 1
) -> jnp.ndarray:
    """Offline/training block-causal mask with sliding window.

    Position i may attend to position j iff j is in a block that ends at or
    before i's block end, and j > i - max_cache_size.

    Equivalent to the reference's get_attn_mask_training
    (patch_speech_encoder.py:30-50): queries see their whole block
    (including a bounded lookahead within the block) plus up to
    ``max_cache_size`` positions of history.
    """
    q = lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    k = lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    # block end index (exclusive) for each query position
    q_block_end = (q // blocksize + 1) * blocksize
    allowed = k < q_block_end
    if max_cache_size is not None:
        # ref :43-45: mask[i, : max(0, i - max_cache_size)] = 0
        allowed &= k >= q - max_cache_size
    return allowed


def streaming_chunk_mask(
    seq_len: int,
    prefix_len: jnp.ndarray | int,
    max_cache_size: int,
    blocksize: int | jnp.ndarray,
    kv_len: int,
) -> jnp.ndarray:
    """Mask for a new chunk of ``seq_len`` queries attending over a
    right-aligned KV buffer of static width ``kv_len`` (cached prefix
    occupying the rightmost min(prefix_len, max_cache_size) slots of the
    first ``kv_len - seq_len`` positions, then the chunk's own keys).

    Query i (absolute position prefix_len + i) may attend key with absolute
    position p iff:
      - p <= block_end(prefix_len + i)   (block causal; ref :62-69)
      - p >  prefix_len + i - max_cache_size  (sliding window; ref :71-72)
      - the key slot is valid (holds a real frame).

    The reference's get_attn_mask_inference
    (patch_speech_encoder.py:52-77) computes the same thing over a
    dynamically sized [seq_len, seq_len + min(prefix, max_cache)] mask; here
    the KV width is static and invalid slots are masked out, so the jitted
    step never recompiles as the stream grows.

    Args:
      seq_len: number of new queries (one chunk of frames).
      prefix_len: traced int32 — frames already consumed (cache.n_steps).
      max_cache_size: sliding window size in frames.
      blocksize: static int, or traced (B,) int32 for PER-ROW block sizes
        (the mixed-multiplier serving pool: each slot's chunk is one block
        of 48*m_slot frames).
      kv_len: static KV width = cache_capacity + seq_len.
    Returns:
      bool[seq_len, kv_len]  (or [B, seq_len, kv_len] when batched)
    """
    prefix_len = jnp.asarray(prefix_len, jnp.int32)
    if prefix_len.ndim:  # batched: (B,) -> (B, 1, 1)
        prefix_len = prefix_len.reshape(prefix_len.shape + (1, 1))
    blocksize = jnp.asarray(blocksize, jnp.int32)
    if blocksize.ndim:  # batched per-row block sizes
        blocksize = jnp.maximum(blocksize, 1).reshape(
            blocksize.shape + (1, 1)
        )
    cache_cap = kv_len - seq_len
    valid_cached = jnp.minimum(prefix_len, max_cache_size)

    qi = lax.broadcasted_iota(jnp.int32, (seq_len, kv_len), 0)
    kj = lax.broadcasted_iota(jnp.int32, (seq_len, kv_len), 1)

    # absolute positions
    q_abs = prefix_len + qi
    # cached slot j in [0, cache_cap): right-aligned, abs = prefix - (cache_cap - j)
    # new slot j in [cache_cap, kv_len): abs = prefix + (j - cache_cap)
    k_abs = jnp.where(
        kj < cache_cap,
        prefix_len - (cache_cap - kj),
        prefix_len + (kj - cache_cap),
    )
    slot_valid = jnp.where(
        kj < cache_cap, kj >= cache_cap - valid_cached, True
    )

    q_block_end = (q_abs // blocksize + 1) * blocksize
    allowed = (k_abs < q_block_end) & (k_abs > q_abs - max_cache_size - 1)
    return allowed & slot_valid


def left_aligned_decode_mask(
    q_len: int, cache_len: int, valid_len: jnp.ndarray | int
) -> jnp.ndarray:
    """Mask for LLM incremental decode over a left-aligned KV cache.

    The cache holds ``valid_len`` real entries in slots [0, valid_len); the
    ``q_len`` new queries are appended logically at positions
    valid_len .. valid_len+q_len-1 and stored in slots
    [valid_len, valid_len+q_len).  kv width is ``cache_len`` (static).

    Query i may attend: all valid cached slots, plus new slots j' <= i
    (causal within the new block).
    """
    valid_len = jnp.asarray(valid_len, jnp.int32)
    if valid_len.ndim:  # batched: (B,) -> (B, 1, 1)
        valid_len = valid_len.reshape(valid_len.shape + (1, 1))
    qi = lax.broadcasted_iota(jnp.int32, (q_len, cache_len), 0)
    kj = lax.broadcasted_iota(jnp.int32, (q_len, cache_len), 1)
    return kj < valid_len + qi + 1
