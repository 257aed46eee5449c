"""Model-size presets.

- ``flagship_config``: Llama-3.1-8B + wav2vec2-large — the reference system's
  scale (ref: scripts/infer/infinisst.sh llama-3.1-8b + wav2vec_vox).
  Needs TP over >= 4 chips in bf16.
- ``bench_1chip_config``: same structure with a ~1.5B decoder that fits a
  single v5e chip (16 GB HBM) in bf16, for single-chip benchmarking.
- ``dryrun_config``: miniature with head counts divisible by a 4-way model
  axis, for multi-chip sharding dry-runs on virtual devices.
"""

from __future__ import annotations

from infinisst_tpu.core.config import (
    AdapterConfig,
    LlamaConfig,
    ModelConfig,
    SpecialTokens,
    W2V2Config,
    conv_cfg,
)


def flagship_config() -> ModelConfig:
    return ModelConfig()  # defaults are 8B / w2v2-large


def bench_1chip_config() -> ModelConfig:
    return ModelConfig(
        adapter=AdapterConfig(out_dim=2048),
        llama=LlamaConfig(
            hidden_size=2048,
            intermediate_size=8192,
            num_layers=16,
            num_heads=16,
            num_kv_heads=8,
            head_dim=128,
        ),
    )


def dryrun_config() -> ModelConfig:
    return ModelConfig(
        w2v2=W2V2Config(
            encoder_embed_dim=128,
            encoder_layers=2,
            encoder_attention_heads=8,
            encoder_ffn_embed_dim=256,
        ),
        adapter=AdapterConfig(
            conv_layers=conv_cfg([(128, 2, 2)] * 2), in_dim=128, out_dim=128
        ),
        llama=LlamaConfig(
            vocab_size=1024,
            hidden_size=128,
            intermediate_size=256,
            num_layers=2,
            num_heads=8,
            num_kv_heads=4,
            head_dim=16,
            rope_scaling=False,
        ),
        # special-token ids INSIDE the 1024 vocab (the Llama defaults sit
        # at 128000+ and would clamp-gather garbage embeddings)
        tokens=SpecialTokens(
            bos=1000, eot=1001, eos=1001, start_header=1002,
            end_header=1003, pad=1004, user=1005, assistant=1006,
            newline2=1007, sp_patch=1008, sp_start=1009, sp_end=1010,
            latency=(1011, 1012, 1013, 1014), end_of_text=999,
        ),
    )
