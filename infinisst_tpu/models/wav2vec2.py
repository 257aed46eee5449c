"""wav2vec2-style chunked-causal speech encoder, TPU-native.

Re-implements the behaviour of the reference's patched fairseq wav2vec2
(model/patches/patch_speech_encoder.py) as pure functions over a parameter
pytree:

- conv feature extractor (7 layers, stride 320, receptive field 400),
  'layer_norm' extractor mode (per-layer LayerNorm) as in the vox/large
  checkpoints (ref: model/speech_encoder.py:18-78 for the block structure).
- 24-layer pre-LN transformer with block-causal streaming attention and
  RoPE applied at attention time over cache-relative positions
  (ref: patch_speech_encoder.py:464-554 encoder fwd, :556-596 layer fwd,
  :692-933 attention with cache).
- the layer stack is a single ``lax.scan`` over stacked parameters, so the
  whole encoder compiles as one fused program regardless of depth.
- training dropout (input / attention-output / ffn, the fairseq w2v2
  defaults) is applied when a ``dropout_rng`` is passed to :func:`forward`;
  inference paths never drop.

Two entry points:
- :func:`forward` — offline/training forward over a full utterance with the
  training block mask (ref mask: get_attn_mask_training).
- :func:`chunk_step` — fixed-shape streaming step: one chunk of raw samples
  in, one chunk of frames out, EncoderState updated.  Never recompiles.

Parameter pytree layout (all dense weights stored as (in, out)):
  conv:      [{w: (k, in, out), ln_scale, ln_bias}] * 7        (list)
  post_ln:   {scale, bias}                      # after extractor, over 512
  post_proj: {w: (512, 1024), b}
  layers (stacked along axis 0 with length L):
    ln1_scale, ln1_bias, ln2_scale, ln2_bias:   (L, D)
    wq, wk, wv, wo:                              (L, D, D)
    bq, bk, bv, bo:                              (L, D)
    fc1_w: (L, D, F), fc1_b: (L, F), fc2_w: (L, F, D), fc2_b: (L, D)
  final_ln:  {scale, bias}                      # layer_norm_first => at end
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from infinisst_tpu.core import masks as M
from infinisst_tpu.core import rope as R
from infinisst_tpu.core.config import W2V2Config
from infinisst_tpu.streaming.state import EncoderState

Params = Dict[str, Any]


def _layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def _gelu(x):
    # fairseq/torch default GELU is the exact (erf) variant.
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Conv feature extractor


def _group_norm_per_channel(h, scale, bias, eps=1e-5):
    """torch GroupNorm(dim, dim) on (B, C, T): each channel normalised over
    its own time axis (the 'default' extractor mode's first-layer norm)."""
    hf = h.astype(jnp.float32)
    mu = hf.mean(-1, keepdims=True)
    var = ((hf - mu) ** 2).mean(-1, keepdims=True)
    y = (hf - mu) * lax.rsqrt(var + eps)
    return (
        y * scale.astype(jnp.float32)[None, :, None]
        + bias.astype(jnp.float32)[None, :, None]
    ).astype(h.dtype)


def conv_extractor(params: Params, cfg: W2V2Config, x: jnp.ndarray) -> jnp.ndarray:
    """(B, T) raw samples -> (B, frames, conv_dim).

    Valid (no-padding) convs; out_len per layer = floor((L-k)/s)+1
    (ref: model/speech_encoder.py:202-217).  Two extractor modes as in
    fairseq: 'layer_norm' (per-layer LN — vox/large w2v2) and 'default'
    (GroupNorm on the first layer only — hubert / base w2v2,
    ref: model/patches/patch_speech_encoder.py:80-218 hubert path)."""
    h = x[:, None, :]  # (B, 1, T)  NCW
    for i, (layer_cfg, p) in enumerate(zip(cfg.conv_layers, params["conv"])):
        h = lax.conv_general_dilated(
            h.astype(p["w"].dtype),
            # stored (k, in, out) -> OIW
            jnp.transpose(p["w"], (2, 1, 0)),
            window_strides=(layer_cfg.stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        if "b" in p:  # vox/LV-60 checkpoints: conv_bias=True
            h = h + p["b"].astype(h.dtype)[None, :, None]
        if cfg.extractor_mode == "layer_norm":
            h = jnp.transpose(h, (0, 2, 1))  # (B, T', C)
            h = _layer_norm(h, p["ln_scale"], p["ln_bias"])
            h = _gelu(h)
            h = jnp.transpose(h, (0, 2, 1))
        else:  # 'default': GroupNorm(dim, dim) on layer 0 only
            if i == 0:
                h = _group_norm_per_channel(h, p["gn_scale"], p["gn_bias"])
            h = _gelu(h)
    return jnp.transpose(h, (0, 2, 1))  # (B, frames, C)


def sinusoidal_positions(offset, length: int, d_model: int) -> jnp.ndarray:
    """Absolute sinusoidal position embeddings [sin | cos], the abs-pos
    fallback when RoPE is off (ref: patch_speech_encoder.py:448-461).
    ``offset`` may be traced (the stream's absolute frame count; positions
    are NOT cache-relative in this mode, as in the reference).  Computed in
    f32 (the reference computes in bf16, which rounds integer positions
    above 256 — a quirk, not a behaviour to preserve)."""
    half = d_model // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
    )
    pos = (jnp.asarray(offset, jnp.float32) + jnp.arange(length, dtype=jnp.float32))
    ang = pos[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
    if d_model % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros((length, 1), jnp.float32)], axis=1)
    return emb


def conv_out_length(cfg: W2V2Config, length):
    """Mirror of _get_feat_extract_output_lengths for the extractor stack."""
    for l in cfg.conv_layers:
        length = (length - l.kernel) // l.stride + 1
    return length


# ---------------------------------------------------------------------------
# Transformer encoder (scan over stacked layers)


def _attention(
    q: jnp.ndarray,  # (B, S, H, Dh) unrotated, unscaled
    k: jnp.ndarray,  # (B, K, H, Dh) unrotated
    v: jnp.ndarray,  # (B, K, H, Dh)
    bias: jnp.ndarray,  # (B or 1, 1, S, K) additive
    q_pos: jnp.ndarray,  # (B, S) int32
    k_pos: jnp.ndarray,  # (B, K) int32
    cfg: W2V2Config,
    inv_freq: jnp.ndarray,
) -> jnp.ndarray:
    scale = 1.0 / math.sqrt(cfg.head_dim)
    q = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, S, Dh)
    k = jnp.transpose(k, (0, 2, 1, 3))
    v = jnp.transpose(v, (0, 2, 1, 3))
    if cfg.use_rope:
        xb = cfg.xpos_scale_base if cfg.use_xpos else None
        q = R.apply_encoder_rope(q, q_pos, inv_freq, xb, xpos_downscale=False)
        k = R.apply_encoder_rope(k, k_pos, inv_freq, xb, xpos_downscale=True)
    logits = jnp.einsum(
        "bhsd,bhkd->bhsk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhsk,bhkd->bhsd", w, v)
    return jnp.transpose(out, (0, 2, 1, 3))  # (B, S, H, Dh)


def _split_heads(x, n_heads):
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads)


def _encoder_stack(
    params: Params,
    cfg: W2V2Config,
    x: jnp.ndarray,  # (B, S, D)
    bias: jnp.ndarray,  # additive (B or 1, 1, S, K)
    q_pos: jnp.ndarray,
    k_pos: jnp.ndarray,
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],  # (L,B,C,H,Dh) x2
    inv_freq: jnp.ndarray,
    remat: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.1,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Scan the transformer layers; returns output and the new per-layer
    K/V for the processed chunk (to be appended to the cache by the caller).
    """
    H = cfg.encoder_attention_heads
    L = params["layers"]["wq"].shape[0]
    S = x.shape[1]

    def _drop(rng, t):
        if rng is None:
            return t
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, t.shape)
        return jnp.where(keep, t / (1.0 - dropout_rate), 0.0).astype(t.dtype)

    def body(carry, per_layer):
        h, rng = carry if dropout_rng is not None else (carry, None)
        lp, ck, cv = per_layer
        if rng is not None:
            rng, r1, r2 = jax.random.split(rng, 3)
        else:
            r1 = r2 = None
        y = _layer_norm(h, lp["ln1_scale"], lp["ln1_bias"])
        q = _split_heads(y @ lp["wq"] + lp["bq"], H)
        k_new = _split_heads(y @ lp["wk"] + lp["bk"], H)
        v_new = _split_heads(y @ lp["wv"] + lp["bv"], H)
        if ck is not None:
            k = jnp.concatenate([ck, k_new], axis=1)
            v = jnp.concatenate([cv, v_new], axis=1)
        else:
            k, v = k_new, v_new
        attn = _attention(q, k, v, bias, q_pos, k_pos, cfg, inv_freq)
        attn = attn.reshape(*attn.shape[:2], -1) @ lp["wo"] + lp["bo"]
        h = h + _drop(r1, attn)
        y = _layer_norm(h, lp["ln2_scale"], lp["ln2_bias"])
        y = _gelu(y @ lp["fc1_w"] + lp["fc1_b"])
        y = y @ lp["fc2_w"] + lp["fc2_b"]
        h = h + _drop(r2, y)
        new_carry = (h, rng) if dropout_rng is not None else h
        return new_carry, (k_new, v_new)

    if cache_kv is None:

        def scan_body(c, lp):
            return body(c, (lp, None, None))

        if remat:
            scan_body = jax.checkpoint(scan_body)
        init = (x, dropout_rng) if dropout_rng is not None else x
        out_carry, new_kv = lax.scan(scan_body, init, params["layers"])
        x = out_carry[0] if dropout_rng is not None else out_carry
    else:

        def scan_body(h, per):
            lp, ck, cv = per
            return body(h, (lp, ck, cv))

        x, new_kv = lax.scan(
            scan_body, x, (params["layers"], cache_kv[0], cache_kv[1])
        )

    x = _layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
    return x, new_kv


def _prep_frames(params: Params, cfg: W2V2Config, samples: jnp.ndarray):
    """Conv extractor + post layer_norm + projection to encoder dim."""
    feats = conv_extractor(params, cfg, samples)  # (B, F, 512)
    feats = _layer_norm(
        feats, params["post_ln"]["scale"], params["post_ln"]["bias"]
    )
    feats = feats @ params["post_proj"]["w"] + params["post_proj"]["b"]
    return feats


def forward(
    params: Params,
    cfg: W2V2Config,
    samples: jnp.ndarray,  # (B, T) raw audio (incl. 399-sample zero offset)
    block_frames: int,
    max_cache_frames: int,
    frame_lengths: Optional[jnp.ndarray] = None,  # (B,) valid frames
    remat: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.1,
) -> jnp.ndarray:
    """Offline/training forward with the block-causal training mask.

    Mirrors uni_w2v2_forward + uni_transformer_encoder_extract_features on
    a fresh cache (ref: patch_speech_encoder.py:228-554).
    Returns (B, frames, encoder_dim).
    """
    x = _prep_frames(params, cfg, samples)
    B, F, D = x.shape
    mask = M.block_causal_mask(F, max_cache_frames, block_frames)  # (F, F)
    mask = mask[None, None]
    if frame_lengths is not None:
        kv_valid = (
            lax.broadcasted_iota(jnp.int32, (B, 1, 1, F), 3)
            < frame_lengths[:, None, None, None]
        )
        mask = mask & kv_valid
        x = x * (
            lax.broadcasted_iota(jnp.int32, (B, F, 1), 1)
            < frame_lengths[:, None, None]
        ).astype(x.dtype)
    bias = M.additive(mask)
    pos = lax.broadcasted_iota(jnp.int32, (B, F), 1)
    inv_freq = jnp.asarray(R.encoder_rope_freqs(cfg.head_dim), jnp.float32)
    if not cfg.use_rope:
        x = x + sinusoidal_positions(0, F, D)[None].astype(x.dtype)
    if dropout_rng is not None:
        rng_in, rng_stack = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(rng_in, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0).astype(x.dtype)
    else:
        rng_stack = None
    out, _ = _encoder_stack(
        params, cfg, x, bias, pos, pos, None, inv_freq, remat=remat,
        dropout_rng=rng_stack, dropout_rate=dropout_rate,
    )
    return out


def chunk_step(
    params: Params,
    cfg: W2V2Config,
    state: EncoderState,
    window: jnp.ndarray,  # (B, CONV_LEFT_CONTEXT + 2*chunk_samples)
    chunk_frames: int,
    max_cache_frames: int,
    row_frames: Optional[jnp.ndarray] = None,  # (B,) real new frames/row
) -> Tuple[jnp.ndarray, EncoderState]:
    """Streaming step: encode one chunk with the sliding-window cache.

    ``window`` is the host-maintained rolling raw-sample window (see
    RawAudioWindow); the conv runs over the whole window and the first
    ``chunk_frames`` outputs (belonging to the previous chunk) are dropped —
    the static-shape equivalent of the reference's cache.src / src_len
    bookkeeping (patch_speech_encoder.py:241-264).

    ``row_frames`` enables MIXED chunk sizes in one batched call (the
    mixed-multiplier serving pool): ``chunk_frames`` is then the padded
    maximum (48 * m_max) and row i carries ``row_frames[i]`` real new
    frames (48 * m_i; 0 = the row sits this step out).  Row i's real
    samples must sit right-aligned in its window (the engine's per-row
    roll guarantees this); its conv outputs are left-aligned here, the
    attention block size becomes its own chunk (one chunk = one block,
    as in the uniform path), and the ring append shifts by exactly
    ``row_frames[i]`` — a row with 0 frames passes through UNCHANGED,
    which also makes skipped ticks state-safe.

    Returns (frames (B, chunk_frames, D) — real rows left-aligned,
    new_state).
    """
    x = _prep_frames(params, cfg, window)
    # conv over the window yields 2*chunk_frames outputs; keep the new half.
    x = x[:, -chunk_frames:]
    B, S, D = x.shape
    C = state.k.shape[2]
    n = state.n_frames  # (B,)

    if row_frames is not None:
        rf = jnp.asarray(row_frames, jnp.int32)
        # left-align each row's (right-aligned) real conv outputs
        j = lax.broadcasted_iota(jnp.int32, (B, S), 1)
        src = jnp.clip(S - rf[:, None] + j, 0, S - 1)
        x = jnp.take_along_axis(x, src[:, :, None], axis=1)
    else:
        rf = None

    if not cfg.use_rope:
        # abs-pos fallback: sinusoidal at the ABSOLUTE stream offset
        # (ref: patch_speech_encoder.py:489-494 — not cache-relative)
        emb = jax.vmap(
            lambda off: sinusoidal_positions(off, S, D)
        )(n)
        x = x + emb.astype(x.dtype)

    mask = M.streaming_chunk_mask(
        S, n, max_cache_frames,
        chunk_frames if rf is None else rf, C + S,
    )  # (B, S, C+S)
    if rf is not None:
        # only the first row_frames[i] new keys are real
        kj = lax.broadcasted_iota(jnp.int32, (B, S, C + S), 2)
        mask = mask & ((kj < C) | (kj - C < rf[:, None, None]))
    bias = M.additive(mask)[:, None]  # (B, 1, S, C+S)

    valid = jnp.minimum(n, C)[:, None]  # (B, 1)
    k_idx = lax.broadcasted_iota(jnp.int32, (B, C + S), 1)
    k_pos = k_idx - (C - valid)  # cached: j-(C-valid); new: valid + i
    q_pos = valid + lax.broadcasted_iota(jnp.int32, (B, S), 1)

    inv_freq = jnp.asarray(R.encoder_rope_freqs(cfg.head_dim), jnp.float32)
    out, new_kv = _encoder_stack(
        params, cfg, x, bias, q_pos, k_pos, (state.k, state.v), inv_freq
    )
    if rf is None:
        # right-aligned sliding append: drop oldest S slots, append the chunk
        new_k = jnp.concatenate([state.k[:, :, S:], new_kv[0]], axis=2)
        new_v = jnp.concatenate([state.v[:, :, S:], new_kv[1]], axis=2)
        return out, EncoderState(k=new_k, v=new_v, n_frames=n + S)
    # per-row shift append: ring slides by row_frames[i] (0 = unchanged)
    idx = (rf[:, None] + jnp.arange(C)[None, :])[None, :, :, None, None]

    def shift(buf, new):
        full = jnp.concatenate([buf, new], axis=2)  # (L, B, C+S, H, Dh)
        return jnp.take_along_axis(full, idx, axis=2)

    return out, EncoderState(
        k=shift(state.k, new_kv[0]),
        v=shift(state.v, new_kv[1]),
        n_frames=n + rf,
    )


# ---------------------------------------------------------------------------
# Init


def init_params(
    key: jax.Array, cfg: W2V2Config, dtype=jnp.float32
) -> Params:
    ks = jax.random.split(key, 16)
    D, F_, L = (
        cfg.encoder_embed_dim,
        cfg.encoder_ffn_embed_dim,
        cfg.encoder_layers,
    )
    conv_dim = cfg.conv_layers[-1].dim

    conv = []
    in_d = 1
    i = 0
    for lc in cfg.conv_layers:
        w = jax.random.normal(
            jax.random.fold_in(ks[0], i), (lc.kernel, in_d, lc.dim), dtype
        ) * math.sqrt(2.0 / (lc.kernel * in_d))
        entry = {"w": w}
        if cfg.conv_bias:
            entry["b"] = jnp.zeros((lc.dim,), dtype)
        if cfg.extractor_mode == "layer_norm":
            entry["ln_scale"] = jnp.ones((lc.dim,), dtype)
            entry["ln_bias"] = jnp.zeros((lc.dim,), dtype)
        elif i == 0:  # 'default': GroupNorm on the first layer only
            entry["gn_scale"] = jnp.ones((lc.dim,), dtype)
            entry["gn_bias"] = jnp.zeros((lc.dim,), dtype)
        conv.append(entry)
        in_d = lc.dim
        i += 1

    def dense(k, shape):
        fan_in = shape[0]
        return jax.random.normal(k, shape, dtype) / math.sqrt(fan_in)

    def stacked(k, shape):
        return jax.random.normal(k, (L,) + shape, dtype) / math.sqrt(shape[0])

    layers = {
        "ln1_scale": jnp.ones((L, D), dtype),
        "ln1_bias": jnp.zeros((L, D), dtype),
        "ln2_scale": jnp.ones((L, D), dtype),
        "ln2_bias": jnp.zeros((L, D), dtype),
        "wq": stacked(ks[1], (D, D)),
        "wk": stacked(ks[2], (D, D)),
        "wv": stacked(ks[3], (D, D)),
        "wo": stacked(ks[4], (D, D)),
        "bq": jnp.zeros((L, D), dtype),
        "bk": jnp.zeros((L, D), dtype),
        "bv": jnp.zeros((L, D), dtype),
        "bo": jnp.zeros((L, D), dtype),
        "fc1_w": stacked(ks[5], (D, F_)),
        "fc1_b": jnp.zeros((L, F_), dtype),
        "fc2_w": stacked(ks[6], (F_, D)),
        "fc2_b": jnp.zeros((L, D), dtype),
    }
    return {
        "conv": conv,
        "post_ln": {
            "scale": jnp.ones((conv_dim,), dtype),
            "bias": jnp.zeros((conv_dim,), dtype),
        },
        "post_proj": {
            "w": dense(ks[7], (conv_dim, D)),
            "b": jnp.zeros((D,), dtype),
        },
        "layers": layers,
        "final_ln": {
            "scale": jnp.ones((D,), dtype),
            "bias": jnp.zeros((D,), dtype),
        },
    }
