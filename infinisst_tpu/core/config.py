"""Configuration dataclasses for the TPU-native InfiniSST framework.

The reference system (/root/reference) configures itself through three disjoint
mechanisms — HfArgumentParser dataclasses, argparse groups, and shell variables
(SURVEY.md §5.6); the length-shrink config is even an eval'd Python string
(reference model/speech_encoder.py:119).  Here every component is configured by a
plain frozen dataclass so configs are hashable (usable as jit static args) and
serializable.

Reference parity notes are given per-field as `ref:` comments
(file:line into /root/reference).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


# Samples per second of input audio.  ref: agents/infinisst.py:201 (16 kHz).
SAMPLE_RATE = 16000
# One wav2vec2 conv-extractor frame covers 20 ms = 320 samples (total stride).
SAMPLES_PER_FRAME = 320
# The conv stack's receptive field is 400 samples; the first emitted frame
# therefore needs 399 samples of left context.  The reference prepends
# 79 + 320 = 399 zeros to the first chunk (ref: agents/infinisst.py:216-218).
CONV_LEFT_CONTEXT = 79 + 320
# One speech token after the 4x length adapter covers 80 ms.
FRAMES_PER_SPEECH_TOKEN = 4
# 960 ms chunk = 48 encoder frames = 12 speech tokens.
FRAMES_PER_BLOCK = 48


@dataclass(frozen=True)
class ConvLayerConfig:
    dim: int
    kernel: int
    stride: int


def conv_cfg(layers) -> Tuple[ConvLayerConfig, ...]:
    return tuple(ConvLayerConfig(*l) for l in layers)


# Standard wav2vec2 feature extractor: 7 conv layers, total stride 320,
# receptive field 400 samples.  ref: model/speech_encoder.py:21 (comment),
# fairseq wav2vec2 defaults.
W2V2_CONV_LAYERS = conv_cfg(
    [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2
)

# Length adapter ("length_shrink"): 2 conv layers, 4x temporal downsample.
# ref: scripts/train/stage1.sh:62  --length_shrink_cfg "[(1024,2,2)] * 2"
LENGTH_SHRINK_LAYERS = conv_cfg([(1024, 2, 2)] * 2)


@dataclass(frozen=True)
class W2V2Config:
    """wav2vec2-large ("vox") speech encoder.

    ref: fairseq wav2vec_vox checkpoint dims; model/speech_encoder.py:147-172.
    """

    conv_layers: Tuple[ConvLayerConfig, ...] = W2V2_CONV_LAYERS
    # The released LV-60 "vox" checkpoints (incl. wav2vec_vox_960h_pl.pt,
    # the encoder the reference loads — model/speech_encoder.py:147-172)
    # are trained with conv biases: fairseq wav2vec2_large_librivox.yaml
    # sets conv_bias=true (HF mirror facebook/wav2vec2-large-lv60 agrees).
    # fairseq builds the model from the checkpoint's own cfg, so the
    # biases are live at inference; dropping them is a numerics bug.
    conv_bias: bool = True
    # 'layer_norm' = per-conv-layer LayerNorm (vox / large models).
    extractor_mode: str = "layer_norm"
    encoder_embed_dim: int = 1024
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    encoder_ffn_embed_dim: int = 4096
    # Pre-LN transformer: reference asserts layer_norm_first
    # (patch_speech_encoder.py:571).
    layer_norm_first: bool = True
    activation: str = "gelu"
    # Rotary embeddings applied at attention time over cache-relative
    # positions (patch_speech_encoder.py:823-824).  xpos decay optional;
    # the release configs use rope without xpos (scripts/infer/infinisst.sh:80).
    use_rope: bool = True
    use_xpos: bool = False
    xpos_scale_base: int = 512

    @property
    def head_dim(self) -> int:
        return self.encoder_embed_dim // self.encoder_attention_heads


@dataclass(frozen=True)
class AdapterConfig:
    """Length adapter + projection into LLM embedding space.

    ref: model/speech_encoder.py:117-121, :233-234.
    """

    conv_layers: Tuple[ConvLayerConfig, ...] = LENGTH_SHRINK_LAYERS
    in_dim: int = 1024
    out_dim: int = 4096  # LLM embedding dim


@dataclass(frozen=True)
class LlamaConfig:
    """Llama-3/3.1 decoder config.

    Defaults are Llama-3.1-8B-Instruct.  The vocab includes the 7 extra
    special tokens registered by the reference (<sp_patch> <sp_start>
    <sp_end> <latency_1..4>); ref: model/llm.py:149-190.
    """

    vocab_size: int = 128263  # 128256 + 7 added tokens
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # Llama-3.1 rope scaling ("llama3" type).  Llama-3.0 uses none.
    rope_scaling: bool = True
    rope_scaling_factor: float = 8.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    tie_word_embeddings: bool = False

    @property
    def num_kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads


@dataclass(frozen=True)
class SpecialTokens:
    """Token ids used to build prompts and splice speech embeddings.

    Values are the Llama-3/3.1 tokenizer ids; the added speech/latency
    tokens follow the base vocab (ids 128256+).  ref: train/dataset.py:47-57,
    model/llm.py:169-190, agents/alignatt.py:142 (sp_patch == 128256).
    """

    bos: int = 128000  # <|begin_of_text|>
    end_of_text: int = 128001  # <|end_of_text|>
    eot: int = 128009  # <|eot_id|>
    eos: int = 128009
    start_header: int = 128006  # <|start_header_id|>
    end_header: int = 128007  # <|end_header_id|>
    pad: int = 128004  # <|finetune_right_pad_id|>
    user: int = 882  # 'user'
    assistant: int = 78191  # 'assistant'
    newline2: int = 271  # '\n\n'
    sp_patch: int = 128256  # <sp_patch>
    sp_start: int = 128257  # <sp_start>
    sp_end: int = 128258  # <sp_end>
    latency: Tuple[int, int, int, int] = (128259, 128260, 128261, 128262)


@dataclass(frozen=True)
class StreamConfig:
    """Streaming runtime geometry.  All shapes the jitted steps see are a
    pure function of this config + the latency multiplier, so the set of
    compiled programs over an unbounded stream is closed (SURVEY.md §7).
    """

    # Encoder block size in 20 ms frames; 48 = 960 ms.
    # ref: scripts/infer/infinisst.sh:79  --block-size 48
    block_frames: int = FRAMES_PER_BLOCK
    # Encoder KV sliding window in frames.  ref: --max-cache-size 576.
    max_cache_frames: int = 576
    # LLM KV cache eviction threshold in tokens.  ref: --max-llm-cache-size 1000.
    max_llm_cache_tokens: int = 1000
    # Static LLM cache buffer capacity.  Must exceed max_llm_cache_tokens by
    # at least one chunk's worth of tokens (prompt + generated) so eviction
    # can run after the overflowing chunk.  Rounded for tiling.
    llm_cache_capacity: int = 1280
    # Pin the system prompt K/V on eviction (LLM-Inf).
    # ref: agents/infinisst.py:347-359, --always-cache-system-prompt.
    always_cache_system_prompt: bool = True
    # Latency multiplier bounds; chunks are 960*m ms.
    max_multiplier: int = 4
    # Generation.  ref: scripts/infer/infinisst.sh:42-48.
    beam: int = 4
    max_new_tokens_per_mult: int = 10  # max_new_tokens = 10 * m
    no_repeat_ngram_size: int = 5
    no_repeat_ngram_lookback: int = 100
    repetition_penalty: float = 1.2
    # Raw source buffer cap (samples).  ref: agents/infinisst.py:58.
    max_src_samples: int = 1_600_000

    def chunk_frames(self, multiplier: int) -> int:
        return self.block_frames * multiplier

    def chunk_samples(self, multiplier: int) -> int:
        return self.block_frames * multiplier * SAMPLES_PER_FRAME

    def chunk_speech_tokens(self, multiplier: int) -> int:
        return self.block_frames * multiplier // FRAMES_PER_SPEECH_TOKEN

    def conv_window_samples(self, multiplier: int) -> int:
        """Raw-sample window fed to the conv frontend each chunk: previous
        chunk's tail + left context + the new chunk.
        ref: patch_speech_encoder.py:259  max_src_token_len = 79+320+320*blocksize,
        concatenated with the incoming chunk (:241-243)."""
        return CONV_LEFT_CONTEXT + 2 * self.chunk_samples(multiplier)

    def max_new_tokens(self, multiplier: int) -> int:
        return self.max_new_tokens_per_mult * multiplier


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout.  data: DP/ZeRO axis; model: TP axis."""

    data: int = 1
    model: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.model


@dataclass(frozen=True)
class ModelConfig:
    """Top-level bundle for the speech-LLM."""

    w2v2: W2V2Config = field(default_factory=W2V2Config)
    adapter: AdapterConfig = field(default_factory=AdapterConfig)
    llama: LlamaConfig = field(default_factory=LlamaConfig)
    tokens: SpecialTokens = field(default_factory=SpecialTokens)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def tiny_model_config(vocab_size: int = 128263) -> ModelConfig:
    """A miniature config with the same structure, for tests and CI."""
    return ModelConfig(
        w2v2=W2V2Config(
            conv_layers=W2V2_CONV_LAYERS,
            encoder_embed_dim=64,
            encoder_layers=2,
            encoder_attention_heads=4,
            encoder_ffn_embed_dim=128,
        ),
        adapter=AdapterConfig(
            conv_layers=conv_cfg([(64, 2, 2)] * 2), in_dim=64, out_dim=64
        ),
        llama=LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            rope_scaling=False,
        ),
    )
