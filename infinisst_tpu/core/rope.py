"""Rotary position embeddings, applied at attention time over
cache-relative positions ("rotate on read").

Two conventions coexist in the reference system:

- The speech encoder uses ``rotary_embedding_torch`` (interleaved pair
  convention, theta=10000, optional xPos decay); RoPE is applied to Q and the
  *whole* (cached + new) K at attention time with positions 0..kv_len-1
  (ref: model/patches/patch_speech_encoder.py:823-824, :599-631).
- The LLM stores *unrotated* keys in its KV cache and re-applies the Llama
  half-split RoPE (theta=500000, llama-3.1 frequency scaling) after retrieval
  with positions arange(cache_len) relative to the current cache
  (ref: model/patches/patch_llm.py:53-76).

Both are implemented as pure functions over explicit position arrays, which
is what makes rolling cache eviction position-consistent: evicting is index
arithmetic on the host; the kernel just receives smaller relative positions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _interleaved_rotate(x: jnp.ndarray) -> jnp.ndarray:
    """(…, d) -> pairwise rotation partner: [-x1, x0, -x3, x2, …]."""
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def encoder_rope_freqs(head_dim: int, theta: float = 10000.0) -> np.ndarray:
    """Per-pair inverse frequencies, rotary_embedding_torch 'lang' default:
    1 / theta^(2i/d) for i in [0, d/2)."""
    return 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )


def apply_encoder_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    inv_freq: jnp.ndarray,
    xpos_scale_base: float | None = None,
    xpos_downscale: bool = False,
) -> jnp.ndarray:
    """Interleaved-convention RoPE (rotary_embedding_torch semantics).

    Args:
      x: (..., seq, head_dim) — head axis anywhere before seq.
      positions: (seq,) int32 — may be negative for invalid slots (masked
        downstream); rotation is still well-defined.
      inv_freq: (head_dim/2,)
      xpos_scale_base: if set, apply xPos decay (ref uses use_xpos flag;
        release configs disable it).
      xpos_downscale: True for keys (scale^-1), False for queries.
    """
    pos = positions.astype(jnp.float32)
    freqs = pos[..., None] * inv_freq.astype(jnp.float32)  # (..., seq, d/2)
    # interleave to full head_dim: [f0, f0, f1, f1, ...]
    freqs = jnp.repeat(freqs, 2, axis=-1)  # (..., seq, d)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    if xpos_scale_base is not None:
        # xPos decay: scale_i = r_i ** (pos / scale_base), r_i = (2i/d + 0.4)/1.4
        d = inv_freq.shape[0] * 2
        r = (jnp.arange(0, d, 2, dtype=jnp.float32) / d + 0.4) / 1.4
        scale = r ** (pos[..., None] / xpos_scale_base)
        scale = jnp.repeat(scale, 2, axis=-1)
        if xpos_downscale:
            scale = 1.0 / scale
        cos = cos * scale
        sin = sin * scale
    # broadcast over the head axis: x is (..., heads, seq, d), positions (..., seq)
    while cos.ndim < x.ndim:
        cos = cos[..., None, :, :]
        sin = sin[..., None, :, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _interleaved_rotate(xf) * sin
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Llama half-split convention


def llama_rope_freqs(
    head_dim: int,
    theta: float = 500000.0,
    scaling: bool = True,
    factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> np.ndarray:
    """Inverse frequencies with optional llama-3.1 NTK-by-parts scaling."""
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if not scaling:
        return inv_freq
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    wavelen = 2 * math.pi / inv_freq
    scaled = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = (1 - smooth) * scaled / factor + smooth * scaled
    is_medium = (wavelen >= high_freq_wavelen) & (wavelen <= low_freq_wavelen)
    return np.where(is_medium, smoothed, scaled)


def _half_rotate(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_llama_rope(
    x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray
) -> jnp.ndarray:
    """Half-split-convention RoPE (HF Llama semantics).

    x: (..., seq, head_dim); positions: broadcastable to (..., seq).
    """
    pos = positions.astype(jnp.float32)
    freqs = pos[..., None] * inv_freq.astype(jnp.float32)  # (..., seq, d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    # broadcast over head axis if x has one more leading dim than positions
    while cos.ndim < x.ndim:
        cos = cos[..., None, :, :]
        sin = sin[..., None, :, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _half_rotate(xf) * sin
    return out.astype(x.dtype)
