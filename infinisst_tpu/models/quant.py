"""Weight-only int8 quantization for the decode path.

Single-stream decode is bound by streaming decoder weights from HBM; the
Pallas kernel (kernels/quant_matmul.py) dequantises int8 tiles in VMEM so
each weight byte crosses HBM at half width — measured 1.69x faster than the
bf16 XLA matmul on v5e for the decode shapes.

``quantize_llama_params`` converts the stacked per-layer projection
matrices to {'q': int8, 'scale': f32} leaves (per-out-channel symmetric);
the token embedding (gather) and optionally the lm_head stay bf16.
``mm`` is the dispatching matmul used by models/llama.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from infinisst_tpu.kernels.quant_matmul import (
    quantize_activation,
    quantize_weight,
    quantized_matmul,
    quantize_activation_grouped,
    quantized_matmul_w8a8,
    quantized_matmul_w8a8_grouped,
)

QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def mm(y: jnp.ndarray, w, interpret: bool = False) -> jnp.ndarray:
    """y @ w for plain or quantized weights; y (..., D).

    Two quantized layouts (distinguished by the scale key, so the pytree
    stays arrays-only):
      {'q', 'scale'}     weight-only int8: in-VMEM bf16 dequant before the
                         MXU (bf16-exact activations);
      {'q', 'scale_a8'}  W8A8: per-row activation quant + native int8 MXU
                         accumulation — no weight convert at all, which
                         matters at very wide outputs (the 128k lm_head,
                         where the VPU dequant cost exceeded the bandwidth
                         saving)."""
    if isinstance(w, dict) and "a" in w:
        # low-rank factored weight W ~= A @ B (speculative draft heads,
        # decode/speculative.make_lowrank_draft_head): two skinny matmuls
        # stream r*(D+V) bytes instead of D*V — at the 128k-wide lm_head
        # this is the dominant draft-step cost
        return mm(mm(y, w["a"]), w["b"])
    if not is_quantized(w):
        return y @ w
    shape = y.shape
    y2 = y.reshape(-1, shape[-1])
    if "scale_a8" in w:
        if w["scale_a8"].ndim == 2:
            # per-(128-wide input group, out-channel) weight scales AND
            # per-(row, group) activation scales: the finer grain bounds
            # the quant error of outlier channels (the optional
            # quality-belt mode; fidelity table in ARCHITECTURE.md).
            import os

            if (
                jax.default_backend() == "tpu"
                and os.environ.get("INFINISST_GROUPED_PALLAS") == "1"
            ):
                # Pallas grouped kernel: measured SLOWER end-to-end than
                # the XLA einsum at 8B decode shapes (0.309 vs 0.213 RTF
                # — the fixed per-call cost across 7 projections x 32
                # layers dominates, same failure mode as the demoted
                # per-channel W8A8 kernel); kept behind this env flag as
                # a measured-and-rejected alternative for shapes where a
                # fused kernel may win (single very wide matmuls).
                out = quantized_matmul_w8a8_grouped(
                    y2, w["q"], w["scale_a8"], out_dtype=y.dtype
                )
            else:
                # XLA fallback (CPU tests / non-TPU): G-batched int8 dot +
                # rescale-sum; same quantize_activation_grouped as the
                # kernel, so both backends are bit-identical
                Gr, O = w["scale_a8"].shape
                M, D = y2.shape
                gs = D // Gr
                y_q, y_s = quantize_activation_grouped(y2, gs)
                acc = jnp.einsum(
                    "mgk,gko->mgo",
                    y_q.reshape(M, Gr, gs), w["q"].reshape(Gr, gs, O),
                    preferred_element_type=jnp.int32,
                )
                out = (
                    acc.astype(jnp.float32)
                    * y_s[..., None]
                    * w["scale_a8"][None]
                ).sum(axis=1).astype(y.dtype)
        else:
            # Pure XLA: int8 x int8 dot_general lowers natively to the MXU
            # (int32 accumulate) and the rescale fuses into the surrounding
            # graph — no per-op Pallas launch overhead (at 7 projections x
            # 32 layers per decode step the fixed kernel-call cost
            # dominated the Pallas W8A8 variant,
            # kernels/quant_matmul.quantized_matmul_w8a8).
            y_q, y_s = quantize_activation(y2)
            acc = jax.lax.dot_general(
                y_q, w["q"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = (
                acc.astype(jnp.float32) * y_s * w["scale_a8"][None, :]
            ).astype(y.dtype)
    else:
        out = quantized_matmul(y2, w["q"], w["scale"], interpret=interpret)
    return out.reshape(*shape[:-1], out.shape[-1])


def _quantize_grouped(w2d: jnp.ndarray, gs: int):
    """(D, O) -> int8 q (D, O) + per-(group, out-channel) scales
    (D//gs, O)."""
    D, O = w2d.shape
    wg = w2d.reshape(D // gs, gs, O).astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(wg / s[:, None, :]), -127, 127).astype(jnp.int8)
    return q.reshape(D, O), s


def _quantize_stacked(
    w: jnp.ndarray, a8: bool = False, group_size: int = 0
) -> Dict[str, jnp.ndarray]:
    """(L, D, O) -> per (L, O) channel scales, or per (L, D//gs, O) group
    scales when ``group_size`` is set (requires a8)."""
    L = w.shape[0]
    qs, ss = [], []
    for i in range(L):
        if group_size:
            assert a8, "grouped scales are only wired for the W8A8 path"
            q, s = _quantize_grouped(w[i], group_size)
        else:
            q, s = quantize_weight(w[i], axis=0)
        qs.append(q)
        ss.append(s.astype(jnp.float32))
    return {
        "q": jnp.stack(qs),
        ("scale_a8" if a8 else "scale"): jnp.stack(ss),
    }


def init_quantized_llama(key, cfg, dtype=None, embed_dtype=None,
                         act_int8=False, lm_head_int8=False,
                         group_size=0, head_group_size=None):
    """Random-init llama params directly in int8 (projections) + bf16
    (embed/lm_head/norms) — avoids staging the full bf16 model in HBM,
    which matters when the quantized model barely fits the chip (8B on one
    16 GB v5e).  ``group_size`` initialises per-(input-group, out-channel)
    scales (the W8A8 quality-belt layout; requires act_int8).
    ``head_group_size`` defaults to 0 (per-channel head — the belt keeps
    the head per-channel: fidelity-equal on the proxy and the grouped
    einsum costs ~25% extra on the 512 MB head stream); pass
    ``group_size`` explicitly to group the head too."""
    import math

    import jax

    if group_size:
        assert act_int8, "group_size requires act_int8"
    embed_dtype = embed_dtype or jnp.bfloat16
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KV, Dh, L, V = (
        cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers,
        cfg.vocab_size,
    )

    skey = "scale_a8" if act_int8 else "scale"

    def qmat(k, shape):
        q = jax.random.randint(k, (L,) + shape, -127, 128, jnp.int8)
        sval = 1.0 / (127 * math.sqrt(shape[0]))
        if group_size:
            scale = jnp.full(
                (L, shape[0] // group_size, shape[-1]), sval, jnp.float32
            )
        else:
            scale = jnp.full((L, shape[-1]), sval, jnp.float32)
        return {"q": q, skey: scale}

    ks = jax.random.split(key, 10)
    layers = {
        "input_ln": jnp.ones((L, D), embed_dtype),
        "post_ln": jnp.ones((L, D), embed_dtype),
        "wq": qmat(ks[0], (D, H * Dh)),
        "wk": qmat(ks[1], (D, KV * Dh)),
        "wv": qmat(ks[2], (D, KV * Dh)),
        "wo": qmat(ks[3], (H * Dh, D)),
        "w_gate": qmat(ks[4], (D, I)),
        "w_up": qmat(ks[5], (D, I)),
        "w_down": qmat(ks[6], (I, D)),
    }
    # lm_head default bf16: the weight-only int8 head (in-VMEM bf16 dequant)
    # measured SLOWER end-to-end — the convert is VPU-bound at 128k output
    # width.  ``lm_head_int8`` uses the W8A8 path instead (native int8 MXU,
    # no convert), which restores the 2x byte saving on the ~2.1 GB head.
    hgs = 0 if head_group_size is None else head_group_size
    if lm_head_int8:
        # vocab padded to a 512 multiple (128263 with the 7 special tokens
        # is not even 128-divisible); pad scales are zero and llama.py
        # slices logits back to vocab_size
        Vp = ((V + 511) // 512) * 512
        sval = 1.0 / (127 * math.sqrt(D))
        if hgs:
            scale = jnp.full((D // hgs, Vp), sval, jnp.float32)
            scale = scale.at[:, V:].set(0.0)
        else:
            scale = jnp.full((Vp,), sval, jnp.float32)
            scale = scale.at[V:].set(0.0)
        lm_head = {
            "q": jax.random.randint(ks[8], (D, Vp), -127, 128, jnp.int8),
            "scale_a8": scale,
        }
    else:
        lm_head = jax.random.normal(
            ks[8], (D, V), embed_dtype
        ) / math.sqrt(D)
    return {
        "embed": jax.random.normal(ks[7], (V, D), embed_dtype) * 0.02,
        "layers": layers,
        "final_ln": jnp.ones((D,), embed_dtype),
        "lm_head": lm_head,
    }


def quantize_llama_params(
    params: Dict[str, Any],
    quantize_lm_head: bool = False,
    act_int8: bool = False,
    group_size: int = 0,
    head_group_size: Optional[int] = None,
) -> Dict[str, Any]:
    """Quantize the per-layer projections (and optionally lm_head).

    ``act_int8`` selects the W8A8 path for the projections; the lm_head
    (when quantized) always uses W8A8 — weight-only dequant at 128k width
    is VPU-bound and loses to bf16.  ``group_size`` (e.g. 128, W8A8 only)
    switches to per-(input-group, out-channel) weight scales and
    per-(row, group) activation scales — finer-grained error bounds for
    outlier channels at a small rescale-sum cost (fidelity table:
    ARCHITECTURE.md).  Requires all projection output dims to be multiples
    of 128 (true for the bench/flagship configs; tiny test configs should
    pass interpret=True to mm or stay bf16)."""
    if group_size:
        assert act_int8, "group_size requires act_int8 (W8A8)"
    out = dict(params)
    layers = dict(params["layers"])
    for k in QUANT_KEYS:
        w = layers[k]
        assert w.shape[-1] % 128 == 0, (k, w.shape)
        if group_size:
            assert w.shape[1] % group_size == 0, (k, w.shape, group_size)
        layers[k] = _quantize_stacked(w, a8=act_int8, group_size=group_size)
    out["layers"] = layers
    hgs = 0 if head_group_size is None else head_group_size
    if quantize_lm_head:
        w = params["lm_head"]
        V = w.shape[-1]
        Vp = ((V + 511) // 512) * 512
        if Vp != V:
            w = jnp.pad(w, ((0, 0), (0, Vp - V)))
        if hgs:
            q, s = _quantize_grouped(w, hgs)
            s = s.at[:, V:].set(0.0) if Vp != V else s
        else:
            q, s = quantize_weight(w, axis=0)
            s = s.at[V:].set(0.0) if Vp != V else s
        out["lm_head"] = {"q": q, "scale_a8": s.astype(jnp.float32)}
    return out
