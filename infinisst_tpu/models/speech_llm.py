"""Combined speech-LLM: chunked speech encoder -> adapter -> Llama decoder,
with speech embeddings spliced into the chat transcript.

Mirrors SpeechLlamaModel.forward's behaviour (ref: model/llm.py:51-126): on
each chunk, encode the new speech, embed the prompt tokens, and replace the
<sp_patch> span with the speech embeddings; subsequent decode steps embed
only the last token.  Splice positions are deterministic given the template
(the reference searches for header tokens at runtime; here the host passes
the static patch offset).

All functions are jit-compatible with static shapes per latency multiplier.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp
from jax import lax

from infinisst_tpu.core.config import ModelConfig
from infinisst_tpu.models import adapter as adapter_mod
from infinisst_tpu.models import llama as llama_mod
from infinisst_tpu.models import wav2vec2 as w2v2_mod
from infinisst_tpu.streaming.state import DecoderState, EncoderState

Params = Dict[str, Any]  # {'w2v2': ..., 'adapter': ..., 'llama': ...}


class StreamState(NamedTuple):
    encoder: EncoderState
    decoder: DecoderState


def encode_chunk(
    params: Params,
    cfg: ModelConfig,
    enc_state: EncoderState,
    window: jnp.ndarray,  # (B, conv_window_samples)
    chunk_frames: int,
    max_cache_frames: int,
    row_frames=None,  # (B,) per-row real frame counts (mixed multipliers)
) -> Tuple[jnp.ndarray, EncoderState]:
    """Raw-sample window -> (B, chunk_frames/4, llm_dim) speech tokens.

    With ``row_frames``, rows may carry different real chunk sizes (see
    wav2vec2.chunk_step); the adapter is chunk-local with VALID padding,
    so each row's first row_frames/4 output tokens are unaffected by the
    padded tail."""
    frames, enc_state = w2v2_mod.chunk_step(
        params["w2v2"], cfg.w2v2, enc_state, window, chunk_frames,
        max_cache_frames, row_frames=row_frames,
    )
    tokens = adapter_mod.forward(params["adapter"], cfg.adapter, frames)
    return tokens, enc_state


def splice_speech(
    params: Params,
    ids: jnp.ndarray,  # (B, S) prompt token ids for this chunk
    speech: jnp.ndarray,  # (B, P, D) speech embeddings
    patch_start,  # int or traced scalar: index of the first <sp_patch>
) -> jnp.ndarray:
    """Embed ids and overwrite the contiguous <sp_patch> span with speech
    (ref: model/llm.py:86-113)."""
    emb = llama_mod.embed(params["llama"], ids)
    return lax.dynamic_update_slice(
        emb, speech.astype(emb.dtype), (0, patch_start, 0)
    )


def prefill_chunk(
    params: Params,
    cfg: ModelConfig,
    state: StreamState,
    window: jnp.ndarray,  # (B, conv_window_samples)
    ids: jnp.ndarray,  # (B, S) chunk prompt ids (template with patches)
    patch_start: int,
    chunk_frames: int,
    max_cache_frames: int,
) -> Tuple[jnp.ndarray, StreamState]:
    """Encode one audio chunk, splice into the chunk's prompt ids, and run
    the decoder prefill.  Returns (logits (B, S, V), new state)."""
    speech, enc_state = encode_chunk(
        params, cfg, state.encoder, window, chunk_frames, max_cache_frames
    )
    emb = splice_speech(params, ids, speech, patch_start)
    logits, dec_state = llama_mod.decode_step(
        params["llama"], cfg.llama, state.decoder, emb
    )
    return logits, StreamState(encoder=enc_state, decoder=dec_state)


def commit_tokens(
    params: Params,
    cfg: ModelConfig,
    dec_state: DecoderState,
    token_buf: jnp.ndarray,  # (B, T) winning tokens, right-padded
    n_valid: jnp.ndarray,  # (B,) number of real tokens
) -> DecoderState:
    """Append the winning beam's generated tokens to the persistent cache by
    replaying them in one prefill (static shape).  This replaces the
    reference's per-hypothesis DynamicCache snapshots
    (patch_hf.py:113-128, :193-208) with a single cheap forward."""
    emb = llama_mod.embed(params["llama"], token_buf)
    valid = (
        lax.broadcasted_iota(jnp.int32, token_buf.shape, 1)
        < n_valid[:, None]
    ).astype(jnp.int32)
    _, dec_state = llama_mod.decode_step(
        params["llama"], cfg.llama, dec_state, emb, valid_mask=valid
    )
    return dec_state


def offline_forward(
    params: Params,
    cfg: ModelConfig,
    samples: jnp.ndarray,  # (B, T) raw audio incl. zero offset
    ids: jnp.ndarray,  # (B, S)
    patch_mask: jnp.ndarray,  # (B, S) bool: True where ids == sp_patch
    block_frames: int,
    max_cache_frames: int,
    frame_lengths: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    dropout_rng=None,
    dropout_rate: float = 0.1,
) -> jnp.ndarray:
    """Training / offline forward: full-utterance encoder with the training
    block mask, speech spliced at patch positions (which may be ragged per
    batch row), causal LLM forward.  Returns logits (B, S, V)."""
    emb = offline_spliced_embeddings(
        params, cfg, samples, ids, patch_mask, block_frames,
        max_cache_frames, frame_lengths, remat=remat,
        dropout_rng=dropout_rng, dropout_rate=dropout_rate,
    )
    return llama_mod.offline_forward(
        params["llama"], cfg.llama, emb, attention_mask, remat=remat
    )


def offline_spliced_embeddings(
    params: Params,
    cfg: ModelConfig,
    samples: jnp.ndarray,
    ids: jnp.ndarray,
    patch_mask: jnp.ndarray,
    block_frames: int,
    max_cache_frames: int,
    frame_lengths: Optional[jnp.ndarray] = None,
    remat: bool = False,
    dropout_rng=None,
    dropout_rate: float = 0.1,
) -> jnp.ndarray:
    """The embedding stage of :func:`offline_forward`: encoder frames ->
    adapter -> splice into token embeddings at patch positions.  Exposed
    so tools can run LLM-side teacher passes over the REAL spliced
    context (e.g. draft-adapter distillation on the agent's serving
    distribution — train/draft.collect_targets_x)."""
    frames = w2v2_mod.forward(
        params["w2v2"], cfg.w2v2, samples, block_frames, max_cache_frames,
        frame_lengths, remat=remat, dropout_rng=dropout_rng,
        dropout_rate=dropout_rate,
    )
    speech = adapter_mod.forward(params["adapter"], cfg.adapter, frames)
    emb = llama_mod.embed(params["llama"], ids)
    # scatter speech tokens into patch positions row-by-row: position of the
    # j-th patch in row b receives speech[b, j].
    P = speech.shape[1]
    # rank of each position among patches in its row
    patch_rank = jnp.cumsum(patch_mask.astype(jnp.int32), axis=1) - 1
    gather_idx = jnp.clip(patch_rank, 0, P - 1)
    speech_at_pos = jnp.take_along_axis(
        speech, gather_idx[:, :, None], axis=1
    )
    return jnp.where(
        patch_mask[:, :, None], speech_at_pos.astype(emb.dtype), emb
    )
