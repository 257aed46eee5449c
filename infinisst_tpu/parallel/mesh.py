"""Device mesh + sharding rules.

The reference's distribution story is NCCL all-reduce under DeepSpeed ZeRO-2
(train/main.py:170-174, SURVEY.md §5.8): data parallelism with sharded
optimizer state; no TP/PP/SP.  On TPU the same capabilities (and more) fall
out of GSPMD: we lay out a 2-axis mesh

    ('data', 'model')

- 'data'  — batch sharding for DP; parameters and optimizer state are
  additionally sharded along 'data' when ``zero=True`` (the
  FSDP/ZeRO-equivalent: XLA inserts reduce-scatter/all-gather over ICI).
- 'model' — tensor parallelism over attention heads / FFN hidden dim for
  the 8B decoder (an upgrade over the reference, which serves on one GPU).

All shardings are expressed as PartitionSpec trees matched to the parameter
pytrees by structure; jit + sharding constraints let XLA place the
collectives (no hand-written NCCL analogue required).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * model
    assert len(devices) >= n, (len(devices), n)
    dev = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


# -- parameter partition specs ---------------------------------------------
# Dense weights are stored (in, out).  TP rule of thumb: shard the output of
# column-parallel layers (qkv, gate/up) and the input of row-parallel layers
# (o_proj, down) on 'model'; XLA inserts the psum at the row-parallel matmul.
# ZeRO: additionally shard the non-TP dim on 'data'.


def _spec(tp_dim: Optional[int], ndim: int, zero: bool, zero_dim: Optional[int]):
    axes: list = [None] * ndim
    if tp_dim is not None:
        axes[tp_dim] = "model"
    if zero and zero_dim is not None and axes[zero_dim] is None:
        axes[zero_dim] = "data"
    return P(*axes)


def llama_param_specs(zero: bool = False) -> Dict[str, Any]:
    """PartitionSpec tree matching models.llama param layout (stacked
    layers have a leading layer axis => dims shift by 1)."""
    return {
        "embed": _spec(1, 2, zero, 0),  # (V, D): shard D on model, V on data
        "layers": {
            "input_ln": _spec(None, 2, zero, 1),
            "post_ln": _spec(None, 2, zero, 1),
            "wq": _spec(2, 3, zero, 1),  # (L, D, H*Dh) out=model
            "wk": _spec(2, 3, zero, 1),
            "wv": _spec(2, 3, zero, 1),
            "wo": _spec(1, 3, zero, 2),  # (L, H*Dh, D) in=model
            "w_gate": _spec(2, 3, zero, 1),
            "w_up": _spec(2, 3, zero, 1),
            "w_down": _spec(1, 3, zero, 2),
        },
        "final_ln": _spec(None, 1, zero, 0),
        "lm_head": _spec(1, 2, zero, 0),  # (D, V) out=model
    }


def w2v2_param_specs(w2v2_cfg, zero: bool = False) -> Dict[str, Any]:
    """Spec tree structurally matching models.wav2vec2.init_params for
    ``w2v2_cfg`` (conv bias / extractor-mode variants included)."""
    conv = []
    for i, _ in enumerate(w2v2_cfg.conv_layers):
        entry = {"w": _spec(None, 3, zero, 2)}
        if w2v2_cfg.conv_bias:
            entry["b"] = P(None)
        if w2v2_cfg.extractor_mode == "layer_norm":
            entry["ln_scale"] = P(None)
            entry["ln_bias"] = P(None)
        elif i == 0:  # 'default': GroupNorm on layer 0 only
            entry["gn_scale"] = P(None)
            entry["gn_bias"] = P(None)
        conv.append(entry)
    return {
        "conv": conv,
        "post_ln": {"scale": P(None), "bias": P(None)},
        "post_proj": {"w": _spec(1, 2, zero, 0), "b": _spec(None, 1, None, None)},
        "layers": {
            "ln1_scale": _spec(None, 2, zero, 1),
            "ln1_bias": _spec(None, 2, zero, 1),
            "ln2_scale": _spec(None, 2, zero, 1),
            "ln2_bias": _spec(None, 2, zero, 1),
            "wq": _spec(2, 3, zero, 1),
            "wk": _spec(2, 3, zero, 1),
            "wv": _spec(2, 3, zero, 1),
            "wo": _spec(1, 3, zero, 2),
            "bq": _spec(1, 2, None, None),
            "bk": _spec(1, 2, None, None),
            "bv": _spec(1, 2, None, None),
            "bo": _spec(None, 2, zero, 1),
            "fc1_w": _spec(2, 3, zero, 1),
            "fc1_b": _spec(1, 2, None, None),
            "fc2_w": _spec(1, 3, zero, 2),
            "fc2_b": _spec(None, 2, zero, 1),
        },
        "final_ln": {"scale": P(None), "bias": P(None)},
    }


def adapter_param_specs(n_conv: int, zero: bool = False) -> Dict[str, Any]:
    return {
        "conv": [
            {
                "w": _spec(None, 3, zero, 2),
                "ln_scale": P(None),
                "ln_bias": P(None),
            }
            for _ in range(n_conv)
        ],
        "proj": {"w": _spec(1, 2, zero, 0), "b": _spec(0, 1, None, None)},
    }


def model_param_specs(cfg, zero: bool = False) -> Dict[str, Any]:
    """Spec tree for the combined speech-LLM params."""
    return {
        "w2v2": w2v2_param_specs(cfg.w2v2, zero),
        "adapter": adapter_param_specs(len(cfg.adapter.conv_layers), zero),
        "llama": llama_param_specs(zero),
    }


def sanitize_spec(shape, spec: P, mesh: Mesh) -> P:
    """Make ``spec`` legal for ``shape``: every sharded dim must divide
    evenly by its mesh-axis size (XLA requires even tiling for explicit
    shardings).  The flagship vocab is deliberately odd (128263 = 128256 +
    the reference's 7 added tokens, core/config.py LlamaConfig), so the
    static rule trees (llama_param_specs etc.) can assign an axis to an
    indivisible dim.  Rules, per array:

    1. axes of mesh size 1 are dropped (no-op shardings free their dim);
    2. an axis whose size does not divide its dim MIGRATES to another dim
       that can absorb it (appended to that dim's existing axes when the
       combined tiling still divides — e.g. embed (V=128263, D=4096) on
       dp8: P('data', None) -> P(None, 'data'));
    3. an axis with no viable home is dropped (that dim replicates).
    """
    dims: list = []
    for i in range(len(shape)):
        entry = spec[i] if i < len(spec) else None
        if entry is None:
            dims.append([])
        elif isinstance(entry, (tuple, list)):
            dims.append([a for a in entry if mesh.shape.get(a, 1) > 1])
        else:
            dims.append([entry] if mesh.shape.get(entry, 1) > 1 else [])

    def divisor(axes):
        d = 1
        for a in axes:
            d *= mesh.shape[a]
        return d

    homeless = []
    for i, axes in enumerate(dims):
        while axes and shape[i] % divisor(axes) != 0:
            homeless.append(axes.pop())
    for a in homeless:
        # prefer the largest dim that can absorb the axis
        cands = [
            i for i in range(len(shape))
            if shape[i] % (divisor(dims[i]) * mesh.shape[a]) == 0
        ]
        if cands:
            best = max(cands, key=lambda i: shape[i] // divisor(dims[i]))
            dims[best].append(a)

    def pack(axes):
        if not axes:
            return None
        return axes[0] if len(axes) == 1 else tuple(axes)

    return P(*[pack(a) for a in dims])


def sanitize_specs(shapes_tree, spec_tree, mesh: Mesh):
    """Shape-aware pass over a spec tree (see sanitize_spec).
    ``shapes_tree`` may hold arrays or ShapeDtypeStructs."""
    return jax.tree.map(
        lambda x, s: sanitize_spec(x.shape, s, mesh),
        shapes_tree,
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def tree_shardings(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, mesh: Mesh, spec_tree):
    sh = tree_shardings(mesh, sanitize_specs(params, spec_tree, mesh))
    return jax.tree.map(jax.device_put, params, sh)
