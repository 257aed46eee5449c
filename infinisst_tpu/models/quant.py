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

from typing import Any, Dict

import jax
import jax.numpy as jnp

from infinisst_tpu.kernels.quant_matmul import quantize_weight, quantized_matmul

QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def mm(y: jnp.ndarray, w, interpret: bool = False) -> jnp.ndarray:
    """y @ w for plain or quantized weights; y (..., D)."""
    if not is_quantized(w):
        return y @ w
    shape = y.shape
    out = quantized_matmul(
        y.reshape(-1, shape[-1]), w["q"], w["scale"], interpret=interpret
    )
    return out.reshape(*shape[:-1], out.shape[-1])


def _quantize_stacked(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(L, D, O) -> per (L, O) channel scales."""
    L = w.shape[0]
    qs, ss = [], []
    for i in range(L):
        q, s = quantize_weight(w[i], axis=0)
        qs.append(q)
        ss.append(s.astype(jnp.float32))
    return {"q": jnp.stack(qs), "scale": jnp.stack(ss)}


def init_quantized_llama(key, cfg, dtype=None, embed_dtype=None):
    """Random-init llama params directly in int8 (projections) + bf16
    (embed/lm_head/norms) — avoids staging the full bf16 model in HBM,
    which matters when the quantized model barely fits the chip (8B on one
    16 GB v5e)."""
    import math

    import jax

    embed_dtype = embed_dtype or jnp.bfloat16
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KV, Dh, L, V = (
        cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers,
        cfg.vocab_size,
    )

    def qmat(k, shape):
        q = jax.random.randint(k, (L,) + shape, -127, 128, jnp.int8)
        scale = jnp.full((L, shape[-1]), 1.0 / (127 * math.sqrt(shape[0])),
                         jnp.float32)
        return {"q": q, "scale": scale}

    def qmat_flat(k, shape):
        q = jax.random.randint(k, shape, -127, 128, jnp.int8)
        scale = jnp.full((shape[-1],), 1.0 / (127 * math.sqrt(shape[0])),
                         jnp.float32)
        return {"q": q, "scale": scale}

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
    # lm_head stays bf16: an int8 head (vocab padded to 512) was measured
    # SLOWER end-to-end (the in-kernel int8->bf16 convert is compute-bound
    # at 128k output width); quantize_llama_params(quantize_lm_head=True)
    # remains available for experimentation.
    del qmat_flat
    return {
        "embed": jax.random.normal(ks[7], (V, D), embed_dtype) * 0.02,
        "layers": layers,
        "final_ln": jnp.ones((D,), embed_dtype),
        "lm_head": jax.random.normal(ks[8], (D, V), embed_dtype)
        / math.sqrt(D),
    }


def quantize_llama_params(
    params: Dict[str, Any], quantize_lm_head: bool = False
) -> Dict[str, Any]:
    """Quantize the per-layer projections (and optionally lm_head).
    Requires all projection output dims to be multiples of 128 (true for
    the bench/flagship configs; tiny test configs should pass
    interpret=True to mm or stay bf16)."""
    out = dict(params)
    layers = dict(params["layers"])
    for k in QUANT_KEYS:
        w = layers[k]
        assert w.shape[-1] % 128 == 0, (k, w.shape)
        layers[k] = _quantize_stacked(w)
    out["layers"] = layers
    if quantize_lm_head:
        w = params["lm_head"]
        V = w.shape[-1]
        Vp = ((V + 511) // 512) * 512
        if Vp != V:
            w = jnp.pad(w, ((0, 0), (0, Vp - V)))
        q, s = quantize_weight(w, axis=0)
        s = s.at[V:].set(0.0) if Vp != V else s
        out["lm_head"] = {"q": q, "scale": s.astype(jnp.float32)}
    return out
