"""Streaming state pytrees.

The reference keeps per-layer python lists of growing torch tensors
(W2V2RoPECache, model/speech_encoder.py:80-97; HF DynamicCache for the LLM)
and evicts by slicing + torch.cat (agents/infinisst.py:340-361,
patch_speech_encoder.py:516-520).  Here both caches are fixed-capacity
arrays updated with static-shape ops, so a jitted step never recompiles as
the stream grows:

- ``EncoderState``: right-aligned sliding window.  Appending a chunk of S
  frames = drop the oldest S slots, write the new S at the end (a static
  concat).  Validity is derived from ``n_frames``.
- ``DecoderState``: left-aligned cache with an explicit ``valid_len``;
  appending = dynamic_update_slice at valid_len; chunk-granular eviction
  with pinned system prompt = one gather (see streaming/evict.py).

Keys are stored *unrotated* in both caches; RoPE is applied at read time
over cache-relative positions (ref: patch_llm.py:53-76,
patch_speech_encoder.py:823-824), which is what keeps positions bounded on
unbounded streams.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class EncoderState(NamedTuple):
    """Speech-encoder streaming state (one stream batch).

    k, v: (layers, batch, cache_frames, heads, head_dim) — right-aligned:
      slot j holds the frame with absolute index n_frames - (cache_frames - j);
      slots with negative absolute index are invalid.
    n_frames: (batch,) int32 — total encoder frames consumed so far.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    n_frames: jnp.ndarray


def init_encoder_state(
    n_layers: int,
    batch: int,
    cache_frames: int,
    n_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> EncoderState:
    shape = (n_layers, batch, cache_frames, n_heads, head_dim)
    return EncoderState(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        n_frames=jnp.zeros((batch,), jnp.int32),
    )


class DecoderState(NamedTuple):
    """LLM streaming KV cache (left-aligned, unrotated keys).

    k, v: (layers, batch, capacity, kv_heads, head_dim)
    valid_len: (batch,) int32 — number of live cache entries.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    valid_len: jnp.ndarray


def init_decoder_state(
    n_layers: int,
    batch: int,
    capacity: int,
    n_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> DecoderState:
    shape = (n_layers, batch, capacity, n_kv_heads, head_dim)
    return DecoderState(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        valid_len=jnp.zeros((batch,), jnp.int32),
    )


class RawAudioWindow:
    """Host-side rolling raw-sample window feeding the conv frontend.

    Fixed width = CONV_LEFT_CONTEXT + 2 * chunk_samples.  Because the conv
    stack is translation invariant and the window is zero-initialised, the
    first chunk needs no special case: the zeros play the role of the
    reference's 79+320 zero offset (agents/infinisst.py:216-218), and
    frames produced left of the new chunk are dropped, mirroring
    cache.src_len bookkeeping (patch_speech_encoder.py:254-264).
    """

    def __init__(self, window_samples: int, chunk_samples: int):
        self.window = np.zeros((window_samples,), np.float32)
        self.chunk_samples = chunk_samples

    def push(self, chunk: np.ndarray) -> np.ndarray:
        assert chunk.shape[0] == self.chunk_samples, (
            chunk.shape,
            self.chunk_samples,
        )
        self.window = np.concatenate(
            [self.window[self.chunk_samples :], chunk.astype(np.float32)]
        )
        return self.window

    def reset(self):
        self.window[:] = 0.0
