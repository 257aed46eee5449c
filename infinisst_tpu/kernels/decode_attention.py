"""Pallas TPU kernel: fused rotate-on-read decode attention over the
streaming KV cache.

STATUS: experiment, not a production path.  The full A/B grid
(tools_ab_attention.py, docs/ab_attention.json) shows XLA's attention
pipeline winning EVERY (cache 1280-16384) x (pool 1-16) cell by
1.2-2.2x at the 8B geometry, so the decode step runs the XLA einsum path
(models/llama.py:142-153).  Kept as a tested, hardware-correct reference
for the Pallas programming model and as a fallback should a future
backend shift the balance.

The streaming LLM stores *unrotated* keys (rotate-on-read keeps positions
bounded under eviction, ref: model/patches/patch_llm.py:53-76).  The XLA
path materialises a rotated copy of the whole cache every step; this kernel
fuses RoPE into the attention read so each cache byte is touched once:

    for each (batch, kv_head):
      for each key tile:
        k_rot = rope(k_tile, positions)          # VPU, in registers
        s     = q_rot @ k_rot^T                  # MXU
        online-softmax accumulate over v_tile    # flash-attention style

Handles GQA by folding the query-head group into the row dimension, and the
beam-search case where the cache batch is 1 (shared prefix) while queries
carry beam x group rows.

Falls back transparently to a reference jnp implementation off-TPU
(interpret mode in tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _rope_tile(x, pos, inv_freq):
    """Half-split RoPE on a (rows, Dh) tile with per-row positions (rows,)."""
    d2 = x.shape[-1] // 2
    freqs = pos[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    x1, x2 = x[:, :d2], x[:, d2:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


def _decode_attn_kernel(
    # scalar prefetch
    valid_ref,  # (1,) int32: number of valid cache entries
    qpos_ref,  # (1,) int32: query position (== valid for 1-token decode)
    # inputs
    q_ref,  # (R, Dh) query rows (beam*group), unrotated
    k_ref,  # (C, Dh) cache keys for this kv head, unrotated
    v_ref,  # (C, Dh)
    inv_freq_ref,  # (Dh/2,)
    # outputs
    o_ref,  # (R, Dh)
    # scratch
    m_ref,  # (R, 1) running max
    l_ref,  # (R, 1) running denom
    acc_ref,  # (R, Dh) accumulator
    *,
    tile: int,
    n_tiles: int,
    scale: float,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = valid_ref[0]
    qpos = qpos_ref[0]
    inv_freq = inv_freq_ref[:]

    # rotate the query rows once (same position for all rows)
    R = q_ref.shape[0]
    q = q_ref[:].astype(jnp.float32)
    qp = jnp.full((R,), qpos, jnp.int32)
    q = _rope_tile(q, qp, inv_freq) * scale

    start = i * tile
    kpos = start + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
    k = _rope_tile(k_ref[:].astype(jnp.float32), kpos, inv_freq)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, tile)
    mask = (kpos < valid)[None, :]
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, s.max(-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + p.sum(-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(i == n_tiles - 1)
    def _():
        o_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype
        )


def decode_attention(
    q: jnp.ndarray,  # (B, H, Dh) unrotated single-position queries
    cache_k: jnp.ndarray,  # (B, C, KV, Dh) unrotated
    cache_v: jnp.ndarray,  # (B, C, KV, Dh)
    valid_len: jnp.ndarray,  # (B,) int32
    q_pos: jnp.ndarray,  # (B,) int32 rotary position of the query
    inv_freq: jnp.ndarray,  # (Dh/2,)
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused rotate-on-read flash decode attention.  Returns (B, H, Dh)."""
    B, H, Dh = q.shape
    C, KV = cache_k.shape[1], cache_k.shape[2]
    G = H // KV
    scale = 1.0 / math.sqrt(Dh)
    n_tiles = (C + tile - 1) // tile
    assert C % tile == 0, (C, tile)

    # (B, KV, G, Dh) query rows per kv head
    qg = q.reshape(B, KV, G, Dh)

    grid = (n_tiles,)

    kernel = functools.partial(
        _decode_attn_kernel, tile=tile, n_tiles=n_tiles, scale=scale
    )

    def per_bk(q_rows, k_head, v_head, valid, qpos):
        # q_rows (G, Dh), k_head (C, Dh), v_head (C, Dh)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    # index maps receive (grid idx, *scalar-prefetch refs)
                    pl.BlockSpec((G, Dh), lambda i, v, p: (0, 0)),
                    pl.BlockSpec((tile, Dh), lambda i, v, p: (i, 0)),
                    pl.BlockSpec((tile, Dh), lambda i, v, p: (i, 0)),
                    pl.BlockSpec((Dh // 2,), lambda i, v, p: (0,)),
                ],
                out_specs=pl.BlockSpec((G, Dh), lambda i, v, p: (0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((G, 1), jnp.float32),
                    pltpu.VMEM((G, 1), jnp.float32),
                    pltpu.VMEM((G, Dh), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((G, Dh), q.dtype),
            interpret=interpret,
        )(
            valid[None].astype(jnp.int32),
            qpos[None].astype(jnp.int32),
            q_rows,
            k_head,
            v_head,
            inv_freq.astype(jnp.float32),
        )

    # vmapped axes must lead for Mosaic block mapping: (B, KV, C, Dh)
    ck = jnp.transpose(cache_k, (0, 2, 1, 3))
    cv = jnp.transpose(cache_v, (0, 2, 1, 3))
    out = jax.vmap(  # over batch
        jax.vmap(per_bk, in_axes=(0, 0, 0, None, None)),  # over kv head
        in_axes=(0, 0, 0, 0, 0),
    )(qg, ck, cv, valid_len, q_pos)
    return out.reshape(B, H, Dh)


def decode_attention_reference(
    q, cache_k, cache_v, valid_len, q_pos, inv_freq
) -> jnp.ndarray:
    """jnp reference (the XLA fallback path) with identical semantics."""
    B, H, Dh = q.shape
    C, KV = cache_k.shape[1], cache_k.shape[2]
    G = H // KV
    scale = 1.0 / math.sqrt(Dh)

    from infinisst_tpu.core import rope as R

    k_pos = jnp.broadcast_to(jnp.arange(C)[None], (B, C))
    kr = R.apply_llama_rope(
        jnp.transpose(cache_k, (0, 2, 1, 3)), k_pos[:, None], inv_freq
    )  # (B, KV, C, Dh)
    qr = R.apply_llama_rope(
        q.reshape(B, H, 1, Dh), q_pos[:, None, None], inv_freq
    )[:, :, 0]  # (B, H, Dh)
    qg = qr.reshape(B, KV, G, Dh)
    s = jnp.einsum(
        "bkgd,bkcd->bkgc", qg, kr, preferred_element_type=jnp.float32
    ) * scale
    mask = jnp.arange(C)[None, None, None, :] < valid_len[:, None, None, None]
    s = jnp.where(mask, s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    vt = jnp.transpose(cache_v, (0, 2, 1, 3)).astype(jnp.float32)
    out = jnp.einsum("bkgc,bkcd->bkgd", w, vt)
    return out.reshape(B, H, Dh).astype(q.dtype)


# ---------------------------------------------------------------------------
# Single-call batched variant: one pallas_call covers every kv head (grid =
# (kv_heads, key_tiles)), eliminating the per-head dispatch overhead of the
# vmapped version above.


def _decode_attn_batched_kernel(
    valid_ref,  # (1,) int32
    qpos_ref,  # (1,) int32
    q_ref,  # (1, Gp, Dh) padded query rows for this kv head
    k_ref,  # (1, tile, Dh)
    v_ref,  # (1, tile, Dh)
    inv_freq_ref,  # (1, Dh/2)
    o_ref,  # (1, Gp, Dh)
    m_ref,  # (Gp, 1)
    l_ref,  # (Gp, 1)
    acc_ref,  # (Gp, Dh)
    *,
    tile: int,
    n_tiles: int,
    scale: float,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = valid_ref[0]
    qpos = qpos_ref[0]
    inv_freq = inv_freq_ref[0]

    Gp = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)
    qp = jnp.full((Gp,), qpos, jnp.int32)
    q = _rope_tile(q, qp, inv_freq) * scale

    start = t * tile
    kpos = start + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
    k = _rope_tile(k_ref[0].astype(jnp.float32), kpos, inv_freq)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = jnp.where((kpos < valid)[None, :], s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, s.max(-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + p.sum(-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(t == n_tiles - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype
        )


def decode_attention_batched(
    q: jnp.ndarray,  # (B, H, Dh) unrotated single-position queries
    cache_k: jnp.ndarray,  # (B, C, KV, Dh) unrotated
    cache_v: jnp.ndarray,
    valid_len: jnp.ndarray,  # (B,) int32
    q_pos: jnp.ndarray,  # (B,) int32
    inv_freq: jnp.ndarray,  # (Dh/2,)
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """One pallas_call per batch element covering all kv heads."""
    B, H, Dh = q.shape
    C, KV = cache_k.shape[1], cache_k.shape[2]
    G = H // KV
    Gp = max(8, ((G + 7) // 8) * 8)
    scale = 1.0 / math.sqrt(Dh)
    n_tiles = (C + tile - 1) // tile
    assert C % tile == 0, (C, tile)

    qg = q.reshape(B, KV, G, Dh)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    ck = jnp.transpose(cache_k, (0, 2, 1, 3))  # (B, KV, C, Dh)
    cv = jnp.transpose(cache_v, (0, 2, 1, 3))

    kernel = functools.partial(
        _decode_attn_batched_kernel, tile=tile, n_tiles=n_tiles, scale=scale
    )

    def per_b(q_b, k_b, v_b, valid, qpos):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(KV, n_tiles),
                in_specs=[
                    pl.BlockSpec((1, Gp, Dh), lambda h, t, v, p: (h, 0, 0)),
                    pl.BlockSpec((1, tile, Dh), lambda h, t, v, p: (h, t, 0)),
                    pl.BlockSpec((1, tile, Dh), lambda h, t, v, p: (h, t, 0)),
                    pl.BlockSpec((1, Dh // 2), lambda h, t, v, p: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, Gp, Dh), lambda h, t, v, p: (h, 0, 0)
                ),
                scratch_shapes=[
                    pltpu.VMEM((Gp, 1), jnp.float32),
                    pltpu.VMEM((Gp, 1), jnp.float32),
                    pltpu.VMEM((Gp, Dh), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((KV, Gp, Dh), q.dtype),
            interpret=interpret,
        )(
            valid[None].astype(jnp.int32),
            qpos[None].astype(jnp.int32),
            q_b,
            k_b,
            v_b,
            inv_freq[None].astype(jnp.float32),
        )

    out = jax.vmap(per_b)(qg, ck, cv, valid_len, q_pos)  # (B, KV, Gp, Dh)
    return out[:, :, :G].reshape(B, H, Dh)
