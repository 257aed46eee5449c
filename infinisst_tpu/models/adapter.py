"""Length adapter ("length_shrink") + projection into LLM embedding space.

Two conv blocks (conv -> LayerNorm -> GELU), each stride 2 and kernel 2,
giving a 4x temporal downsample (20 ms frames -> 80 ms speech tokens), then
a linear projection to the LLM hidden size.

ref: model/speech_encoder.py:18-78 (ConvFeatureExtractionModel block
structure), :117-121 (construction with cfg "[(1024,2,2)] * 2"), :233-234
(apply + proj).

Because kernel == stride for every layer, the adapter is chunk-local: a
chunk of 48*m frames maps to 12*m tokens with no cross-chunk context, so
the streaming path needs no adapter state.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from infinisst_tpu.core.config import AdapterConfig
from infinisst_tpu.models.wav2vec2 import _gelu, _layer_norm

Params = Dict[str, Any]


def forward(params: Params, cfg: AdapterConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, frames, in_dim) -> (B, frames//4, out_dim)."""
    h = jnp.transpose(x, (0, 2, 1))  # NCW
    for layer_cfg, p in zip(cfg.conv_layers, params["conv"]):
        h = lax.conv_general_dilated(
            h.astype(p["w"].dtype),
            jnp.transpose(p["w"], (2, 1, 0)),  # (k,in,out) -> OIW
            window_strides=(layer_cfg.stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        h = jnp.transpose(h, (0, 2, 1))
        h = _layer_norm(h, p["ln_scale"], p["ln_bias"])
        h = _gelu(h)
        h = jnp.transpose(h, (0, 2, 1))
    h = jnp.transpose(h, (0, 2, 1))  # (B, T', C)
    return h @ params["proj"]["w"] + params["proj"]["b"]


def out_length(cfg: AdapterConfig, length):
    """length_shrink part of _get_feat_extract_output_lengths
    (ref: model/speech_encoder.py:202-217)."""
    for l in cfg.conv_layers:
        length = (length - l.kernel) // l.stride + 1
    return length


def init_params(key: jax.Array, cfg: AdapterConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, len(cfg.conv_layers) + 1)
    conv = []
    in_d = cfg.in_dim
    for i, lc in enumerate(cfg.conv_layers):
        w = jax.random.normal(
            ks[i], (lc.kernel, in_d, lc.dim), dtype
        ) * math.sqrt(2.0 / (lc.kernel * in_d))
        conv.append(
            {
                "w": w,
                "ln_scale": jnp.ones((lc.dim,), dtype),
                "ln_bias": jnp.zeros((lc.dim,), dtype),
            }
        )
        in_d = lc.dim
    proj = {
        "w": jax.random.normal(ks[-1], (in_d, cfg.out_dim), dtype)
        / math.sqrt(in_d),
        "b": jnp.zeros((cfg.out_dim,), dtype),
    }
    return {"conv": conv, "proj": proj}
