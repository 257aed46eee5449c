"""Checkpoint save/restore via orbax, plus export to the reference's
published format.

Replaces the reference's Lightning ModelCheckpoint + DeepSpeed shard merge
pipeline (train/main.py:156-160, train/zero_to_fp32.py + prune_bin.py):
orbax natively writes sharded pytrees from a pjit mesh, so the "merge ZeRO
shards to fp32 bin" step disappears; ``export_torch_bin`` produces a
reference-compatible ``pytorch_model.bin`` for interop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _mgr(directory: str, max_to_keep: int = 2):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save(directory: str, state, step: int, max_to_keep: int = 2):
    import orbax.checkpoint as ocp

    mgr = _mgr(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp  # noqa: F401

    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    return mgr.latest_step()


def restore(directory: str, abstract_state) -> Any:
    """Restore the latest checkpoint into the structure/shardings of
    ``abstract_state`` (obtained via jax.eval_shape + shardings)."""
    import orbax.checkpoint as ocp

    mgr = _mgr(directory)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {directory}")
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def export_torch_bin(params, model_cfg, path: str):
    """Write a reference-format pruned state dict (pytorch_model.bin):
    llama under 'model.*'/'lm_head.*', encoder under
    'model.speech_encoder.*' (ref naming: train/prune_bin.py +
    model/model.py:114-133)."""
    import torch

    from infinisst_tpu.convert.from_torch import export_llama

    sd = {}
    for k, v in export_llama(params["llama"], model_cfg.llama).items():
        sd[k] = torch.tensor(np.asarray(v))

    w = params["w2v2"]
    pre = "model.speech_encoder.speech_encoder."
    for i, c in enumerate(w["conv"]):
        sd[f"{pre}feature_extractor.conv_layers.{i}.0.weight"] = torch.tensor(
            np.asarray(c["w"]).transpose(2, 1, 0)
        )
        sd[f"{pre}feature_extractor.conv_layers.{i}.2.1.weight"] = torch.tensor(
            np.asarray(c["ln_scale"])
        )
        sd[f"{pre}feature_extractor.conv_layers.{i}.2.1.bias"] = torch.tensor(
            np.asarray(c["ln_bias"])
        )
    sd[f"{pre}layer_norm.weight"] = torch.tensor(np.asarray(w["post_ln"]["scale"]))
    sd[f"{pre}layer_norm.bias"] = torch.tensor(np.asarray(w["post_ln"]["bias"]))
    sd[f"{pre}post_extract_proj.weight"] = torch.tensor(
        np.asarray(w["post_proj"]["w"]).T
    )
    sd[f"{pre}post_extract_proj.bias"] = torch.tensor(
        np.asarray(w["post_proj"]["b"])
    )
    ly = w["layers"]
    n_layers = np.asarray(ly["wq"]).shape[0]
    for i in range(n_layers):
        b = f"{pre}encoder.layers.{i}"
        sd[f"{b}.self_attn_layer_norm.weight"] = torch.tensor(np.asarray(ly["ln1_scale"][i]))
        sd[f"{b}.self_attn_layer_norm.bias"] = torch.tensor(np.asarray(ly["ln1_bias"][i]))
        sd[f"{b}.final_layer_norm.weight"] = torch.tensor(np.asarray(ly["ln2_scale"][i]))
        sd[f"{b}.final_layer_norm.bias"] = torch.tensor(np.asarray(ly["ln2_bias"][i]))
        for ours, theirs in [("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"), ("wo", "out_proj")]:
            sd[f"{b}.self_attn.{theirs}.weight"] = torch.tensor(np.asarray(ly[ours][i]).T)
        for ours, theirs in [("bq", "q_proj"), ("bk", "k_proj"), ("bv", "v_proj"), ("bo", "out_proj")]:
            sd[f"{b}.self_attn.{theirs}.bias"] = torch.tensor(np.asarray(ly[ours][i]))
        sd[f"{b}.fc1.weight"] = torch.tensor(np.asarray(ly["fc1_w"][i]).T)
        sd[f"{b}.fc1.bias"] = torch.tensor(np.asarray(ly["fc1_b"][i]))
        sd[f"{b}.fc2.weight"] = torch.tensor(np.asarray(ly["fc2_w"][i]).T)
        sd[f"{b}.fc2.bias"] = torch.tensor(np.asarray(ly["fc2_b"][i]))
    sd[f"{pre}encoder.layer_norm.weight"] = torch.tensor(
        np.asarray(w["final_ln"]["scale"])
    )
    sd[f"{pre}encoder.layer_norm.bias"] = torch.tensor(
        np.asarray(w["final_ln"]["bias"])
    )

    a = params["adapter"]
    apre = "model.speech_encoder."
    for i, c in enumerate(a["conv"]):
        sd[f"{apre}length_shrink.conv_layers.{i}.0.weight"] = torch.tensor(
            np.asarray(c["w"]).transpose(2, 1, 0)
        )
        sd[f"{apre}length_shrink.conv_layers.{i}.2.1.weight"] = torch.tensor(
            np.asarray(c["ln_scale"])
        )
        sd[f"{apre}length_shrink.conv_layers.{i}.2.1.bias"] = torch.tensor(
            np.asarray(c["ln_bias"])
        )
    sd[f"{apre}proj.weight"] = torch.tensor(np.asarray(a["proj"]["w"]).T)
    sd[f"{apre}proj.bias"] = torch.tensor(np.asarray(a["proj"]["b"]))

    torch.save(sd, path)
    return sd
