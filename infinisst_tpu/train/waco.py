"""WACO speech-encoder pretraining: word-level contrastive alignment.

Mirror of the reference's standalone speech-encoder Lightning path
(model/speech_encoder.py:238-323): encode speech, mean-pool word-level
speech embeddings using MFA word spans (80 ms per speech token,
ref :265-267), mean-pool the corresponding LLM text embeddings, and
minimise the InfoNCE loss over the cosine-similarity matrix
(train/objective.waco_loss).

Word spans arrive via the TSV 'speech_word'/'text_word' columns
(train/dataset.py:191-194).  Since span counts vary per batch, spans are
padded to a static maximum and masked.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from infinisst_tpu.core.config import ModelConfig
from infinisst_tpu.models import adapter as adapter_mod
from infinisst_tpu.models import wav2vec2 as w2v2_mod
from infinisst_tpu.train.objective import waco_loss

SPEECH_TOKEN_SEC = 0.08


@dataclass
class WacoBatch:
    speech: jnp.ndarray  # (B, T) raw samples incl. offset
    frame_lengths: jnp.ndarray  # (B,)
    text_ids: jnp.ndarray  # (B, S)
    # word spans, padded to W per batch:
    speech_spans: jnp.ndarray  # (B, W, 2) speech-token [start, end] inclusive
    text_spans: jnp.ndarray  # (B, W, 2) text-token [start, end] inclusive
    span_mask: jnp.ndarray  # (B, W) bool


def collate_waco(samples, model_cfg: ModelConfig, max_spans: int = 64):
    """Build a WacoBatch from SpeechToTextItems carrying speech_word /
    text_word spans (seconds / token indices, ref :259-267)."""
    B = len(samples)
    sp = np.zeros((B, max_spans, 2), np.int32)
    tp = np.zeros((B, max_spans, 2), np.int32)
    mask = np.zeros((B, max_spans), bool)
    for b, x in enumerate(samples):
        if not x.speech_word:
            continue
        for w, (s_span, t_span) in enumerate(
            zip(x.speech_word[:max_spans], x.text_word[:max_spans])
        ):
            s_l = int(np.floor(s_span[0] / SPEECH_TOKEN_SEC))
            s_r = int(np.ceil(s_span[1] / SPEECH_TOKEN_SEC)) - 1
            sp[b, w] = (s_l, max(s_r, s_l))
            tp[b, w] = (int(t_span[0]), int(t_span[1]))
            mask[b, w] = True
    return sp, tp, mask


def waco_step_fn(
    model_cfg: ModelConfig,
    block_frames: int,
    max_cache_frames: int,
    temperature: float = 0.5,
):
    """Returns loss_fn(params, llm_embed_table, batch) — llm embeddings are
    frozen (ref :123-125)."""

    def loss_fn(params, llm_embed, batch: WacoBatch):
        frames = w2v2_mod.forward(
            params["w2v2"], model_cfg.w2v2, batch.speech, block_frames,
            max_cache_frames, batch.frame_lengths,
        )
        speech = adapter_mod.forward(
            params["adapter"], model_cfg.adapter, frames
        )  # (B, P, D)
        text = llm_embed[batch.text_ids]  # (B, S, D)

        B, P, D = speech.shape
        W = batch.speech_spans.shape[1]

        def pool(seq, spans):
            # mean over [l, r] inclusive, per span
            L = seq.shape[0]
            idx = jnp.arange(L)[None, :]
            sel = (idx >= spans[:, 0:1]) & (idx <= spans[:, 1:2])  # (W, L)
            s = sel.astype(seq.dtype) @ seq  # (W, D)
            return s / jnp.maximum(sel.sum(-1, keepdims=True), 1)

        sp_emb = jax.vmap(pool)(speech, batch.speech_spans)  # (B, W, D)
        tx_emb = jax.vmap(pool)(text, batch.text_spans)
        flat_mask = batch.span_mask.reshape(-1)
        sp_flat = sp_emb.reshape(-1, D)
        tx_flat = tx_emb.reshape(-1, D)
        # masked InfoNCE: restrict rows/cols to valid spans by pushing
        # invalid similarities to -inf off-diagonal and +0 on diagonal
        s = sp_flat / (
            jnp.linalg.norm(sp_flat, axis=-1, keepdims=True) + 1e-8
        )
        t = tx_flat / (
            jnp.linalg.norm(tx_flat, axis=-1, keepdims=True) + 1e-8
        )
        sim = (s @ t.T) / temperature
        valid = flat_mask[:, None] & flat_mask[None, :]
        eye = jnp.eye(sim.shape[0], dtype=bool)
        sim = jnp.where(valid | eye, sim, -1e9)
        logp = jax.nn.log_softmax(sim, axis=-1)
        diag = jnp.diagonal(logp)
        n = jnp.maximum(flat_mask.sum(), 1)
        return -(jnp.where(flat_mask, diag, 0.0).sum() / n)

    return loss_fn
