"""Llama-3/3.1 decoder with GQA and a streaming unrotated-key KV cache.

TPU-native rebuild of the reference's patched HF Llama
(model/patches/patch_llm.py): keys are stored *unrotated* in the cache and
RoPE is applied after retrieval with positions arange(valid_len) relative to
the current cache (ref: patch_llm.py:53-76).  After chunk-granular eviction
the positions renumber automatically, which keeps rotary positions bounded
on unbounded streams.

Differences from the reference implementation strategy (deliberate, per
SURVEY.md §7):
- the KV cache is a fixed-capacity left-aligned array updated with
  ``lax.dynamic_update_slice`` (no torch.cat growth, no recompilation);
- the layer stack is one ``lax.scan`` over stacked parameters;
- prefill and single-token decode are the same function, jitted per static
  query length.

Parameter pytree:
  embed:    (V, D)  token embedding
  layers (stacked, leading dim L):
    input_ln:  (L, D)      rms norm scale
    post_ln:   (L, D)
    wq: (L, D, H*Dh)  wk: (L, D, KV*Dh)  wv: (L, D, KV*Dh)  wo: (L, H*Dh, D)
    w_gate: (L, D, I)  w_up: (L, D, I)  w_down: (L, I, D)
  final_ln: (D,)
  lm_head:  (D, V)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from infinisst_tpu.core import masks as M
from infinisst_tpu.core import rope as R
from infinisst_tpu.core.config import LlamaConfig
from infinisst_tpu.models.quant import mm
from infinisst_tpu.streaming.state import DecoderState

Params = Dict[str, Any]


def _rms_norm(x, scale, eps):
    xf = x.astype(jnp.float32)
    var = (xf * xf).mean(-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(
        x.dtype
    )


def apply_exit_adapter(adapter: Params, h: jnp.ndarray, eps: float):
    """Trained early-exit adapter (residual gated MLP) applied to the
    hidden state pre-``final_ln``.  Used by the layer-skip speculative
    draft: the adapter is distilled (train/draft.py) to map the layer-d
    hidden toward the full model's final hidden, raising draft acceptance
    at small d without touching backbone weights (LayerSkip-style
    self-distillation, Elhoushi et al. 2024 — but adapter-only, so the
    target model's own outputs are bit-identical with or without it).

    ``w2`` is zero-initialised, so an untrained adapter is an exact
    identity.  Pytree: {'ln': (D,), 'w1': (D, r), 'w2': (r, D)}."""
    y = _rms_norm(h, adapter["ln"], eps)
    y = jax.nn.silu(mm(y, adapter["w1"]))
    return h + mm(y, adapter["w2"]).astype(h.dtype)


def rope_inv_freq(cfg: LlamaConfig) -> jnp.ndarray:
    return jnp.asarray(
        R.llama_rope_freqs(
            cfg.head_dim,
            cfg.rope_theta,
            cfg.rope_scaling,
            cfg.rope_scaling_factor,
            cfg.rope_low_freq_factor,
            cfg.rope_high_freq_factor,
            cfg.rope_original_max_position,
        ),
        jnp.float32,
    )


def decode_step(
    params: Params,
    cfg: LlamaConfig,
    state: DecoderState,
    x_embed: jnp.ndarray,  # (B, S, D) input embeddings (speech already spliced)
    valid_mask: Optional[jnp.ndarray] = None,  # (B, S) 1 = real token
    attn_probe: Optional[Tuple[int, int, int]] = None,
) -> Tuple[jnp.ndarray, DecoderState]:
    """Forward S new positions against the cache; append their K/V.

    RoPE positions are cache-relative: cached entry j gets position j, new
    query i gets position valid_len + i (ref: patch_llm.py:60-76).

    Returns (logits (B, S, V), new_state).
    """
    B, S, D = x_embed.shape
    C = state.k.shape[2]
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg)
    vlen = state.valid_len  # (B,)

    # Attention runs over [cache (C slots) | new (S slots)] concatenated.
    # cache slot j is visible iff j < valid_len; new slot j' iff j' <= i
    # (causal within the appended block) and the token is real.
    qi = lax.broadcasted_iota(jnp.int32, (B, S, C + S), 1)
    kj = lax.broadcasted_iota(jnp.int32, (B, S, C + S), 2)
    mask = jnp.where(
        kj < C, kj < vlen[:, None, None], (kj - C) <= qi
    )
    if valid_mask is not None:
        new_ok = jnp.concatenate(
            [
                jnp.ones((B, C), bool),
                valid_mask.astype(bool),
            ],
            axis=1,
        )
        mask = mask & new_ok[:, None, :]
    bias = M.additive(mask)[:, None]  # (B,1,S,C+S)

    k_pos = jnp.concatenate(
        [
            lax.broadcasted_iota(jnp.int32, (B, C), 1),
            vlen[:, None] + lax.broadcasted_iota(jnp.int32, (B, S), 1),
        ],
        axis=1,
    )  # (B, C+S)
    q_pos = vlen[:, None] + lax.broadcasted_iota(jnp.int32, (B, S), 1)

    scale = 1.0 / math.sqrt(Dh)

    def body(h, per_layer):
        lp, ck, cv = per_layer
        y = _rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
        q = mm(y, lp["wq"]).reshape(B, S, H, Dh)
        k_new = mm(y, lp["wk"]).reshape(B, S, KV, Dh)
        v_new = mm(y, lp["wv"]).reshape(B, S, KV, Dh)

        k_all = jnp.concatenate([ck, k_new], axis=1)  # (B, C+S, KV, Dh)
        v_all = jnp.concatenate([cv, v_new], axis=1)

        # rotate on read
        qr = R.apply_llama_rope(
            jnp.transpose(q, (0, 2, 1, 3)), q_pos[:, None], inv_freq
        )  # (B,H,S,Dh)
        kr = R.apply_llama_rope(
            jnp.transpose(k_all, (0, 2, 1, 3)), k_pos[:, None], inv_freq
        )  # (B,KV,C+S,Dh)
        vt = jnp.transpose(v_all, (0, 2, 1, 3))

        # GQA: fold groups into the head axis
        qg = qr.reshape(B, KV, H // KV, S, Dh)
        logits = jnp.einsum(
            "bkgsd,bktd->bkgst", qg, kr, preferred_element_type=jnp.float32
        )
        logits = logits * scale + bias.astype(jnp.float32)[:, 0][:, None, None]
        w = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
        if attn_probe is not None:
            _, a0, a1 = attn_probe
            span = w.astype(jnp.float32).mean(axis=(1, 2))[:, :, a0:a1]
            probe = jnp.argmax(span, axis=-1).astype(jnp.int32)  # (B, S)
        else:
            probe = jnp.zeros((B, S), jnp.int32)
        attn = jnp.einsum("bkgst,bktd->bkgsd", w, vt)
        attn = jnp.transpose(attn.reshape(B, H, S, Dh), (0, 2, 1, 3))
        h = h + mm(attn.reshape(B, S, H * Dh), lp["wo"])

        y = _rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        y = jax.nn.silu(mm(y, lp["w_gate"])) * mm(y, lp["w_up"])
        h = h + mm(y, lp["w_down"])
        return h, (k_new, v_new, probe)

    h, scanned = lax.scan(
        lambda carry, per: body(carry, per),
        x_embed,
        (params["layers"], state.k, state.v),
    )
    new_kv = (scanned[0], scanned[1])
    probes = scanned[2]
    if "exit_adapter" in params:
        # speculative draft path only: params with this key are the
        # draft's truncated pytree (decode/speculative.py) — the target
        # model's params never carry it
        h = apply_exit_adapter(params["exit_adapter"], h, cfg.rms_norm_eps)
    h = _rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    logits = mm(h, params["lm_head"])[..., : cfg.vocab_size]

    # append new K/V at valid_len (per batch element)
    def append(buf, new):
        # buf: (L,B,C,KV,Dh), new: (L,B,S,KV,Dh)
        def per_batch(buf_b, new_b, start):
            return lax.dynamic_update_slice(
                buf_b, new_b.astype(buf_b.dtype), (0, start, 0, 0)
            )

        return jax.vmap(per_batch, in_axes=(1, 1, 0), out_axes=1)(
            buf, new, vlen
        )

    n_append = (
        valid_mask.sum(-1).astype(jnp.int32)
        if valid_mask is not None
        else jnp.full((B,), S, jnp.int32)
    )
    new_state = DecoderState(
        k=append(state.k, new_kv[0]),
        v=append(state.v, new_kv[1]),
        valid_len=vlen + n_append,
    )
    if attn_probe is not None:
        layer = attn_probe[0] % probes.shape[0]
        return logits, new_state, probes[layer]
    return logits, new_state


def offline_hidden(
    params: Params,
    cfg: LlamaConfig,
    x_embed: jnp.ndarray,  # (B, S, D)
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S) 1 = real
    remat: bool = False,
    num_layers: Optional[int] = None,
) -> jnp.ndarray:
    """Pre-``final_ln`` hidden after the first ``num_layers`` layers
    (default: all), plain causal attention, no cache.  This is exactly
    the hidden the layer-skip speculative draft sees at depth d
    (decode_step over params.layers[:d]), so it is the distillation
    input for the early-exit adapter (train/draft.py).

    Returns h (B, S, D)."""
    layers = params["layers"]
    if num_layers is not None:
        layers = jax.tree.map(lambda a: a[:num_layers], layers)
    return _offline_scan(layers, cfg, x_embed, attention_mask, remat)


def offline_forward(
    params: Params,
    cfg: LlamaConfig,
    x_embed: jnp.ndarray,  # (B, S, D)
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S) 1 = real
    remat: bool = False,
) -> jnp.ndarray:
    """Training forward: plain causal attention, no cache.

    ``remat`` checkpoints each layer (gradient checkpointing).
    Returns logits (B, S, V)."""
    h = _offline_scan(params["layers"], cfg, x_embed, attention_mask, remat)
    h = _rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    return h @ params["lm_head"]


def _offline_scan(
    layers: Params,
    cfg: LlamaConfig,
    x_embed: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    remat: bool,
) -> jnp.ndarray:
    B, S, D = x_embed.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg)
    qi = lax.broadcasted_iota(jnp.int32, (S, S), 0)
    kj = lax.broadcasted_iota(jnp.int32, (S, S), 1)
    mask = (kj <= qi)[None]
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, :].astype(bool)
    bias = M.additive(mask)[:, None]  # (B,1,S,S)
    pos = lax.broadcasted_iota(jnp.int32, (1, S), 1)
    scale = 1.0 / math.sqrt(Dh)

    def body(h, lp):
        y = _rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
        q = (y @ lp["wq"]).reshape(B, S, H, Dh)
        k = (y @ lp["wk"]).reshape(B, S, KV, Dh)
        v = (y @ lp["wv"]).reshape(B, S, KV, Dh)
        qr = R.apply_llama_rope(
            jnp.transpose(q, (0, 2, 1, 3)), pos[:, None], inv_freq
        )
        kr = R.apply_llama_rope(
            jnp.transpose(k, (0, 2, 1, 3)), pos[:, None], inv_freq
        )
        vt = jnp.transpose(v, (0, 2, 1, 3))
        qg = qr.reshape(B, KV, H // KV, S, Dh)
        logits = jnp.einsum(
            "bkgsd,bktd->bkgst", qg, kr, preferred_element_type=jnp.float32
        )
        logits = logits * scale + bias.astype(jnp.float32)[:, 0][:, None, None]
        w = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
        attn = jnp.einsum("bkgst,bktd->bkgsd", w, vt)
        attn = jnp.transpose(attn.reshape(B, H, S, Dh), (0, 2, 1, 3))
        h = h + attn.reshape(B, S, H * Dh) @ lp["wo"]
        y = _rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        y = jax.nn.silu(y @ lp["w_gate"]) * (y @ lp["w_up"])
        h = h + y @ lp["w_down"]
        return h, None

    scan_body = jax.checkpoint(body) if remat else body
    h, _ = lax.scan(scan_body, x_embed, layers)
    return h


def embed(params: Params, token_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][token_ids]


# ---------------------------------------------------------------------------
# Beam-search token step with shared prefix cache
#
# During one chunk's beam search the chunk prefix (system/user/assistant
# headers + speech) is identical for every beam; only the <= max_new_tokens
# generated so far differ.  The reference repeat-interleaves the whole KV
# cache across beams (patch_hf.py:305-342) and gathers it per step; here the
# prefix stays un-replicated (batch 1) and only a small per-beam generation
# buffer is reordered — a large memory/bandwidth saving on TPU.


def beam_token_step(
    params: Params,
    cfg: LlamaConfig,
    prefix: DecoderState,  # batch dim 1, valid_len (1,)
    gen_k: jnp.ndarray,  # (L, beam, G, KV, Dh) generated-token keys (unrotated)
    gen_v: jnp.ndarray,
    gen_len: jnp.ndarray,  # scalar int32: tokens generated so far (same for all beams)
    x_embed: jnp.ndarray,  # (beam, 1, D) embeddings of the last tokens
    attn_probe: Optional[Tuple[int, int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step for all beams.  Returns (logits (beam, V), new gen_k,
    new gen_v, attn_idx (beam,)) with this step's K/V written at slot
    ``gen_len``.  attn_probe=(layer, span_start, span_end) records the
    argmax head-averaged attention over the span (AlignAtt signal,
    ref: agents/alignatt.py:150-167); -1 when disabled."""
    beam, S, D = x_embed.shape
    assert S == 1
    C = prefix.k.shape[2]
    G = gen_k.shape[2]
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg)
    plen = prefix.valid_len[0]  # scalar

    # Two-block attention: [shared prefix C | per-beam gen G].  The prefix
    # block is NOT broadcast/materialised per beam — it enters the einsum
    # with no beam axis, so its K/V cross HBM once per step instead of
    # ``beam`` times (at 8B/C=1280 the per-beam materialisation was ~2 GB
    # of avoidable traffic per decode step).
    kj_p = jnp.arange(C)
    bias_p = jnp.where(kj_p < plen, 0.0, M.NEG_INF)[None, None, None, :]
    kj_g = jnp.arange(G)
    bias_g = jnp.where(kj_g < gen_len + 1, 0.0, M.NEG_INF)[None, None, None, :]
    g_pos = (plen + kj_g)[None, None]  # (1,1,G)
    q_pos = (plen + gen_len)[None, None]  # (1,1)

    scale = 1.0 / math.sqrt(Dh)

    # The layer scan indexes the stacked weights from the CLOSURE instead of
    # passing them as scan xs: under vmap (batched_beam_search, pooled
    # serving) the scan batching rule broadcasts xs across the lane axis —
    # 3 x 14 GB materialised copies of the FFN weights at 8B/pool-8.  The
    # layer index must stay UNBATCHED too (a batched index would turn the
    # weight lookup into a per-lane gather), so it rides the scan carry,
    # which keeps its unbatched status under vmap.
    layers = params["layers"]

    def body(carry, per_layer):
        h, li = carry
        pk, pv, gk, gv = per_layer
        lp = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, li, 0, keepdims=False),
            layers,
        )
        y = _rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
        q = mm(y, lp["wq"]).reshape(beam, 1, H, Dh)
        k_new = mm(y, lp["wk"]).reshape(beam, 1, KV, Dh)
        v_new = mm(y, lp["wv"]).reshape(beam, 1, KV, Dh)

        gk = lax.dynamic_update_slice(
            gk, k_new.astype(gk.dtype), (0, gen_len, 0, 0)
        )
        gv = lax.dynamic_update_slice(
            gv, v_new.astype(gv.dtype), (0, gen_len, 0, 0)
        )

        qr = R.apply_llama_rope(
            jnp.transpose(q, (0, 2, 1, 3)), q_pos, inv_freq
        )  # (beam,H,1,Dh)
        # prefix keys rotated once (no beam axis): (1,KV,C,Dh) -> (KV,C,Dh)
        kr_p = R.apply_llama_rope(
            jnp.transpose(pk, (0, 2, 1, 3)), kj_p[None, None], inv_freq
        )[0]
        kr_g = R.apply_llama_rope(
            jnp.transpose(gk, (0, 2, 1, 3)), g_pos, inv_freq
        )  # (beam,KV,G,Dh)

        qg = qr.reshape(beam, KV, H // KV, 1, Dh)
        logits_p = jnp.einsum(
            "bkgsd,ktd->bkgst", qg, kr_p, preferred_element_type=jnp.float32
        )
        logits_g = jnp.einsum(
            "bkgsd,bktd->bkgst", qg, kr_g, preferred_element_type=jnp.float32
        )
        logits = jnp.concatenate(
            [logits_p * scale + bias_p, logits_g * scale + bias_g], axis=-1
        )
        w = jax.nn.softmax(logits, axis=-1)
        if attn_probe is not None:
            _, a0, a1 = attn_probe
            span = w.mean(axis=(1, 2))[:, 0, a0:a1]
            probe = jnp.argmax(span, axis=-1).astype(jnp.int32)  # (beam,)
        else:
            probe = jnp.full((beam,), -1, jnp.int32)
        w = w.astype(pv.dtype)
        attn = jnp.einsum(
            "bkgst,tkd->bkgsd", w[..., :C], pv[0]
        ) + jnp.einsum("bkgst,btkd->bkgsd", w[..., C:], gv)
        attn = jnp.transpose(attn.reshape(beam, H, 1, Dh), (0, 2, 1, 3))
        h = h + mm(attn.reshape(beam, 1, H * Dh), lp["wo"])
        y = _rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        y = jax.nn.silu(mm(y, lp["w_gate"])) * mm(y, lp["w_up"])
        h = h + mm(y, lp["w_down"])
        return (h, li + 1), (gk, gv, probe)

    (h, _), (new_gk, new_gv, probes) = lax.scan(
        body,
        (x_embed, jnp.asarray(0, jnp.int32)),
        (prefix.k, prefix.v, gen_k, gen_v),
    )
    if "exit_adapter" in params:
        # speculative draft path only (decode/spec_beam.py drafts through
        # this step): params with this key are the draft's truncated
        # pytree — the target model's params never carry it
        h = apply_exit_adapter(params["exit_adapter"], h, cfg.rms_norm_eps)
    h = _rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    logits = mm(h, params["lm_head"])[:, 0, : cfg.vocab_size]  # (beam, V)
    if attn_probe is not None:
        layer = attn_probe[0] % probes.shape[0]
        attn_idx = probes[layer]
    else:
        attn_idx = probes[0]
    return logits, new_gk, new_gv, attn_idx


def beam_tree_step(
    params: Params,
    cfg: LlamaConfig,
    prefix: DecoderState,  # batch dim 1, valid_len (1,)
    gen_k: jnp.ndarray,  # (L, B, Gb, KV, Dh) committed per-beam keys
    gen_v: jnp.ndarray,
    gen_len: jnp.ndarray,  # scalar int32: committed tokens per beam
    x_embed: jnp.ndarray,  # (N, D) tree-node embeddings
    node_pos: jnp.ndarray,  # (N,) int32: gen_len + level of each node
    tree_bias: jnp.ndarray,  # (N, N) additive mask: ancestors (incl. self)
    root: jnp.ndarray,  # (N,) int32: committed-beam index of each node
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One FULL forward over a drafted beam TREE: N nodes, each a
    (beam-slot, level) hypothesis extension, verified in a single weight
    stream (the speculative beam decoder, decode/spec_beam.py).

    Three attention blocks per query node: the shared chunk prefix
    (streamed once, no node axis — the two-block trick of
    beam_token_step), the committed per-beam generation buffer gathered
    by the node's ROOT beam (which committed path the node extends), and
    the tree itself under ``tree_bias`` (a node sees exactly its
    ancestor chain including itself — cross-slot ancestry is what plain
    causal (B, S) decode cannot express).

    K/V are cached UNROTATED (rotate-on-read), so a node's K/V are
    position-independent and the decoder can COMMIT accepted nodes by
    copying the returned tree K/V into the gen buffers.

    Returns (logits (N, V), k_tree (L, N, KV, Dh), v_tree)."""
    N, D = x_embed.shape
    C = prefix.k.shape[2]
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg)
    plen = prefix.valid_len[0]

    kj_p = jnp.arange(C)
    bias_p = jnp.where(kj_p < plen, 0.0, M.NEG_INF)[None, None, None, None, :]
    Gb = gen_k.shape[2]
    kj_g = jnp.arange(Gb)
    bias_g = jnp.where(kj_g < gen_len, 0.0, M.NEG_INF)[None, None, None, None, :]
    g_pos = (plen + kj_g)[None, None]  # (1,1,Gb)
    q_pos = (plen + node_pos)[None]  # (1,N) -> rotate per node
    bias_t = tree_bias[:, None, None, None, :]  # (N,1,1,1,N)

    scale = 1.0 / math.sqrt(Dh)
    layers = params["layers"]

    def body(carry, per_layer):
        h, li = carry  # h (N, 1, D) — one token per node row
        pk, pv, gk, gv = per_layer
        lp = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, li, 0, keepdims=False),
            layers,
        )
        y = _rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
        q = mm(y, lp["wq"]).reshape(N, 1, H, Dh)
        k_new = mm(y, lp["wk"]).reshape(N, KV, Dh)
        v_new = mm(y, lp["wv"]).reshape(N, KV, Dh)

        qr = R.apply_llama_rope(
            jnp.transpose(q, (0, 2, 1, 3)), q_pos.T[:, None], inv_freq
        )  # (N,H,1,Dh)
        kr_p = R.apply_llama_rope(
            jnp.transpose(pk, (0, 2, 1, 3)), kj_p[None, None], inv_freq
        )[0]  # (KV,C,Dh)
        gk_n = gk[root]  # (N, Gb, KV, Dh) committed keys by node root
        gv_n = gv[root]
        kr_g = R.apply_llama_rope(
            jnp.transpose(gk_n, (0, 2, 1, 3)), g_pos, inv_freq
        )  # (N,KV,Gb,Dh)
        # tree keys rotated at each NODE's own position
        kr_t = R.apply_llama_rope(
            jnp.transpose(k_new[None], (0, 2, 1, 3)), q_pos[:, None],
            inv_freq,
        )[0]  # (KV,N,Dh)

        qg = qr.reshape(N, KV, H // KV, 1, Dh)
        logits_p = jnp.einsum(
            "nkgsd,ktd->nkgst", qg, kr_p, preferred_element_type=jnp.float32
        ) * scale + bias_p
        logits_g = jnp.einsum(
            "nkgsd,nktd->nkgst", qg, kr_g,
            preferred_element_type=jnp.float32,
        ) * scale + bias_g
        logits_t = jnp.einsum(
            "nkgsd,kmd->nkgsm", qg, kr_t,
            preferred_element_type=jnp.float32,
        ) * scale + bias_t
        logits = jnp.concatenate([logits_p, logits_g, logits_t], axis=-1)
        w = jax.nn.softmax(logits, axis=-1).astype(pv.dtype)
        attn = (
            jnp.einsum("nkgst,tkd->nkgsd", w[..., :C], pv[0])
            + jnp.einsum("nkgst,ntkd->nkgsd", w[..., C : C + Gb], gv_n)
            + jnp.einsum("nkgsm,mkd->nkgsd", w[..., C + Gb :], v_new)
        )
        attn = jnp.transpose(attn.reshape(N, H, 1, Dh), (0, 2, 1, 3))
        h = h + mm(attn.reshape(N, 1, H * Dh), lp["wo"])
        y = _rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        y = jax.nn.silu(mm(y, lp["w_gate"])) * mm(y, lp["w_up"])
        h = h + mm(y, lp["w_down"])
        return (h, li + 1), (k_new, v_new)

    (h, _), (k_tree, v_tree) = lax.scan(
        body,
        (x_embed[:, None], jnp.asarray(0, jnp.int32)),
        (prefix.k, prefix.v, gen_k, gen_v),
    )
    h = _rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    logits = mm(h, params["lm_head"])[:, 0, : cfg.vocab_size]  # (N, V)
    return logits, k_tree, v_tree


# ---------------------------------------------------------------------------
# Eviction


def evict_cache(
    state: DecoderState,
    keep_len: jnp.ndarray,  # (B,) int32: tail length to keep
    sys_len: jnp.ndarray | int,  # pinned prefix length (0 to disable)
) -> DecoderState:
    """Chunk-granular eviction with pinned system prompt (LLM-Inf).

    Keeps cache[0:sys_len] ++ cache[valid-keep : valid]; the result is
    left-aligned with valid_len = sys_len + keep_len.  One gather along the
    cache axis (ref semantics: agents/infinisst.py:340-361).
    """
    C = state.k.shape[2]
    vlen = state.valid_len
    sys_len = jnp.broadcast_to(
        jnp.asarray(sys_len, jnp.int32), vlen.shape
    )
    idx = jax.vmap(
        lambda v, k, s: jnp.where(
            jnp.arange(C) < s,
            jnp.arange(C),
            jnp.clip(jnp.arange(C) + (v - k) - s, 0, C - 1),
        )
    )(vlen, keep_len, sys_len)  # (B, C)

    def gather(buf):  # (L,B,C,KV,Dh)
        # row-gather per (layer, batch) with a (C,) index — take_along_axis
        # would broadcast the index to the full buffer shape (an int32
        # transient 2x the cache itself: ~5.4 GB at 8B pool-16, the OOM
        # that killed pool-16 serving)
        def per_l(buf_l):  # (B, C, KV, Dh)
            return jax.vmap(lambda m, i: m[i])(buf_l, idx)

        return jax.vmap(per_l)(buf)

    return DecoderState(
        k=gather(state.k),
        v=gather(state.v),
        valid_len=sys_len + keep_len,
    )


# ---------------------------------------------------------------------------
# Init


def init_params(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 10)
    D, I, L, V = (
        cfg.hidden_size,
        cfg.intermediate_size,
        cfg.num_layers,
        cfg.vocab_size,
    )
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def stacked(k, shape):
        return jax.random.normal(k, (L,) + shape, dtype) / math.sqrt(shape[0])

    layers = {
        "input_ln": jnp.ones((L, D), dtype),
        "post_ln": jnp.ones((L, D), dtype),
        "wq": stacked(ks[0], (D, H * Dh)),
        "wk": stacked(ks[1], (D, KV * Dh)),
        "wv": stacked(ks[2], (D, KV * Dh)),
        "wo": stacked(ks[3], (H * Dh, D)),
        "w_gate": stacked(ks[4], (D, I)),
        "w_up": stacked(ks[5], (D, I)),
        "w_down": stacked(ks[6], (I, D)),
    }
    return {
        "embed": jax.random.normal(ks[7], (V, D), dtype) * 0.02,
        "layers": layers,
        "final_ln": jnp.ones((D,), dtype),
        "lm_head": jax.random.normal(ks[8], (D, V), dtype) / math.sqrt(D),
    }
