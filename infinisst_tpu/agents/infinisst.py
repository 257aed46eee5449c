"""InfiniSST streaming agent: host-side policy loop driving jitted
fixed-shape encode/decode steps.

Mirrors the reference agent's behaviour (agents/infinisst.py:270-395) with a
TPU-native execution model:

- the host keeps a rolling raw-sample window, the transcript, and the
  chunk-boundary bookkeeping (``cache_checkpoints``);
- per chunk, ONE jitted call runs: encoder chunk step -> adapter -> speech
  splice -> LLM prefill -> beam search -> winning-beam commit;
- LLM cache eviction (chunk-granular, pinned system prompt — LLM-Inf) is a
  second jitted call issued only when the cache exceeds the limit
  (ref: agents/infinisst.py:340-361);
- the compiled-shape set is closed: {first,later} x {full chunk, tail
  sizes} per multiplier; nothing recompiles as the stream grows.

Host <-> device traffic per chunk: audio window up, (tokens, n_tokens,
hit_eos) down.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from time import perf_counter
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from infinisst_tpu.agents.base import (
    AgentStates,
    ReadAction,
    SpeechToTextAgent,
    WriteAction,
)
from infinisst_tpu.core.config import (
    CONV_LEFT_CONTEXT,
    SAMPLES_PER_FRAME,
    ModelConfig,
    StreamConfig,
)
from infinisst_tpu.data.template import PromptBuilder
from infinisst_tpu.decode import beam as beam_mod
from infinisst_tpu.models import llama as llama_mod
from infinisst_tpu.models import speech_llm
from infinisst_tpu.streaming.state import (
    init_decoder_state,
    init_encoder_state,
)


@dataclass
class InfiniSSTOptions:
    """Generation / policy options (ref: agents/options.py,
    agents/infinisst.py:185-198; defaults = release script values,
    scripts/infer/infinisst.sh:42-88)."""

    latency_multiplier: int = 1
    max_latency_multiplier: int = 4
    beam: int = 4
    max_new_tokens_per_mult: int = 10
    no_repeat_ngram_size: int = 5
    no_repeat_ngram_lookback: int = 100
    repetition_penalty: float = 1.2
    max_llm_cache_size: int = 1000
    always_cache_system_prompt: bool = True
    min_start_sec: float = 0.0
    source_lang: str = "English"
    target_lang: str = "German"
    suppress_tokens: Optional[np.ndarray] = None  # ids to ban
    rtf_timing: bool = False  # print per-chunk wall time


class InfiniSSTAgent(SpeechToTextAgent):
    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        stream_cfg: StreamConfig,
        builder: PromptBuilder,
        opts: InfiniSSTOptions,
        param_dtype=jnp.float32,
    ):
        self.params = params
        self.cfg = model_cfg
        self.stream = stream_cfg
        self.builder = builder
        self.opts = opts
        self.dtype = param_dtype
        self.tokenizer = builder.tokenizer

        m = opts.latency_multiplier
        self.chunk_samples = stream_cfg.chunk_samples(m)
        self.chunk_frames = stream_cfg.chunk_frames(m)
        self.unit_samples = stream_cfg.chunk_samples(1)  # 960 ms padding unit
        self.window_samples = CONV_LEFT_CONTEXT + 2 * self.chunk_samples
        self.max_new = stream_cfg.max_new_tokens(m)

        V = model_cfg.llama.vocab_size
        sup = np.zeros((V,), bool)
        if opts.suppress_tokens is not None:
            sup[np.asarray(opts.suppress_tokens, np.int64)] = True
        self._suppress = jnp.asarray(sup)

        self._gen_fns: Dict = {}  # (n_units, first) -> jitted generate_chunk
        self._evict_fn = jax.jit(llama_mod.evict_cache)
        super().__init__()
        self._init_device_state()

    # -- state -------------------------------------------------------------
    def _init_device_state(self):
        w = self.cfg.w2v2
        ll = self.cfg.llama
        self.enc_state = init_encoder_state(
            w.encoder_layers,
            1,
            self.stream.max_cache_frames,
            w.encoder_attention_heads,
            w.head_dim,
            self.dtype,
        )
        self.dec_state = init_decoder_state(
            ll.num_layers,
            1,
            self.stream.llm_cache_capacity,
            ll.num_kv_heads,
            ll.head_dim,
            self.dtype,
        )
        self.window = np.zeros((self.window_samples,), np.float32)
        self.cache_checkpoints = []  # token counts at chunk ends (host mirror)
        self.llm_cache_len = 0  # host mirror of dec_state.valid_len
        self.system_prompt_size = 0
        self.first_chunk = True

    def reset(self):
        super().reset()
        self._init_device_state()

    def build_states(self):
        return AgentStates()

    # -- jitted chunk step ---------------------------------------------------
    def _generate_chunk_fn(self, n_units: int, first: bool):
        """Build + cache the fused jitted step for a chunk of ``n_units``
        960 ms units (n_units == m except for the stream tail)."""
        key = (n_units, first)
        if key in self._gen_fns:
            return self._gen_fns[key]

        m = self.opts.latency_multiplier
        prompt = self.builder.chunk_prompt(m, first, n_patches=12 * n_units)
        prompt_ids = jnp.asarray(prompt.ids)[None]
        patch_start = prompt.patch_start
        chunk_frames = 48 * n_units
        spec = beam_mod.BeamSpec(
            beam=self.opts.beam,
            max_new_tokens=self.max_new,
            eos_id=self.cfg.tokens.eos,
            pad_id=self.cfg.tokens.pad,
            no_repeat_ngram_size=self.opts.no_repeat_ngram_size,
            repetition_penalty=self.opts.repetition_penalty,
        )
        cfg = self.cfg
        stream = self.stream
        enc_ng = self.opts.no_repeat_ngram_size
        suppress = self._suppress

        @jax.jit
        def generate_chunk(params, enc_state, dec_state, window, hist, hist_len):
            logits, st = speech_llm.prefill_chunk(
                params,
                cfg,
                speech_llm.StreamState(enc_state, dec_state),
                window,
                prompt_ids,
                patch_start,
                chunk_frames,
                stream.max_cache_frames,
            )
            res = beam_mod.beam_search(
                params["llama"],
                cfg.llama,
                st.decoder,
                logits[0, -1],
                prompt_ids[0],
                jnp.asarray(prompt_ids.shape[1], jnp.int32),
                hist,
                hist_len,
                spec,
                encoder_ngram_size=enc_ng,
                suppress_mask=suppress,
            )
            dec = speech_llm.commit_tokens(
                params,
                cfg,
                st.decoder,
                res.tokens[None],
                res.n_tokens[None],
            )
            return res, st.encoder, dec

        self._gen_fns[key] = (generate_chunk, prompt)
        return self._gen_fns[key]

    # -- policy ------------------------------------------------------------
    def policy(self, states: Optional[AgentStates] = None):
        if states is None:
            states = self.states
        opts = self.opts

        if states.source_sample_rate == 0:
            length_in_seconds = 0.0
        else:
            length_in_seconds = len(states.source) / states.source_sample_rate

        if not states.source_finished and length_in_seconds < opts.min_start_sec:
            return ReadAction()
        if states.source_finished and length_in_seconds < 0.32:
            return WriteAction(content="", finished=True)

        t0 = perf_counter()

        # ref: agents/infinisst.py:204-206 — cap the raw source buffer.
        if len(states.source) > self.stream.max_src_samples:
            drop = len(states.source) - self.stream.max_src_samples
            states.src_len -= drop
            states.source = states.source[-self.stream.max_src_samples :]

        new = np.asarray(states.source[states.src_len :], np.float32)
        if new.size == 0 and not states.source_finished:
            return ReadAction()

        translation_parts = []
        # process accumulated audio in full chunks; the stream tail (on
        # source_finished) is padded to 960 ms units (ref :211-213).
        pos = 0
        while True:
            remaining = new.size - pos
            if remaining >= self.chunk_samples:
                seg = new[pos : pos + self.chunk_samples]
                n_units = self.opts.latency_multiplier
                pos += self.chunk_samples
            elif states.source_finished and remaining > 0:
                n_units = int(np.ceil(remaining / self.unit_samples))
                seg = np.zeros((n_units * self.unit_samples,), np.float32)
                seg[:remaining] = new[pos:]
                pos += remaining
            else:
                break
            text = self._process_chunk(states, seg, n_units)
            if text:
                translation_parts.append(text)
        states.src_len += pos

        translation = " ".join(translation_parts).strip().replace("�", "")
        if opts.rtf_timing:
            jax.block_until_ready(self.dec_state.k)
            print(f"generate: {perf_counter() - t0:.4f} seconds")

        states.segment_idx += 1
        if translation != "" or states.source_finished:
            return WriteAction(content=translation, finished=states.source_finished)
        return ReadAction()

    def _process_chunk(self, states: AgentStates, seg: np.ndarray, n_units: int) -> str:
        opts = self.opts
        m = opts.latency_multiplier

        # rolling window update (host)
        if n_units == m:
            self.window = np.concatenate([self.window[len(seg) :], seg])
            window = self.window
        else:  # tail: previous context + short tail
            keep = CONV_LEFT_CONTEXT + self.chunk_samples
            window = np.concatenate([self.window[-keep:], seg])
            self.window = np.concatenate(
                [self.window[len(seg) :], seg]
            )  # keep rolling (unused afterwards)

        first = self.first_chunk
        if first:
            self.system_prompt_size = self.builder.system_prompt_size(m)
        fn, prompt = self._generate_chunk_fn(n_units, first)

        lookback = opts.no_repeat_ngram_lookback
        hist = np.full((lookback,), self.cfg.tokens.pad, np.int32)
        tail = states.target_ids[-lookback:]
        hist[: len(tail)] = tail
        res, self.enc_state, self.dec_state = fn(
            self.params,
            self.enc_state,
            self.dec_state,
            jnp.asarray(window)[None],
            jnp.asarray(hist),
            jnp.asarray(len(tail), jnp.int32),
        )
        n_tok = int(res.n_tokens)
        hit_eos = bool(res.hit_eos)
        out_ids = np.asarray(res.tokens[:n_tok]).tolist()
        if not hit_eos and n_tok > 0:
            # the reference drops the final token when generation stops at
            # the cap without EOS (sequences[..., :-1], infinisst.py:363)
            out_ids = out_ids[:-1]

        self.first_chunk = False
        states.target_ids.extend(out_ids)

        # --- cache bookkeeping (host mirror; ref :337-361)
        self.llm_cache_len += prompt.ids.shape[0] + n_tok
        self.cache_checkpoints.append(self.llm_cache_len)
        if self.llm_cache_len > opts.max_llm_cache_size:
            new_len = self.llm_cache_len
            for i, ckpt in enumerate(self.cache_checkpoints):
                new_len = self.llm_cache_len - ckpt
                if new_len <= opts.max_llm_cache_size:
                    self.cache_checkpoints = self.cache_checkpoints[i + 1 :]
                    trimmed = ckpt
                    if opts.always_cache_system_prompt:
                        trimmed -= self.system_prompt_size
                    self.cache_checkpoints = [
                        c - trimmed for c in self.cache_checkpoints
                    ]
                    break
            sys_len = (
                self.system_prompt_size
                if opts.always_cache_system_prompt
                else 0
            )
            self.dec_state = self._evict_fn(
                self.dec_state,
                jnp.asarray([new_len], jnp.int32),
                jnp.asarray(sys_len, jnp.int32),
            )
            self.llm_cache_len = new_len + sys_len

        text = self.tokenizer.decode(out_ids, skip_special_tokens=True).strip()
        return text.replace("�", "")
