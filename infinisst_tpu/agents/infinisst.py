"""InfiniSST streaming agent: host-side policy loop driving jitted
fixed-shape encode/decode steps.

Mirrors the reference agent's behaviour (agents/infinisst.py:270-395) with a
TPU-native execution model:

- the host keeps only the transcript and chunk-boundary bookkeeping
  (``cache_checkpoints``); everything touched per chunk — the rolling raw-
  sample window, the n-gram history buffer, both KV caches — lives on
  device and is threaded through ONE fused jitted call per chunk
  (encoder chunk step -> adapter -> speech splice -> LLM prefill -> beam
  search -> winning-beam commit -> history update);
- per chunk the host uploads just the new audio (int16) and downloads one
  packed int32 vector [n_committed, hit_eos, n_emit, tokens...] — critical
  when the device link has high per-transfer latency;
- LLM cache eviction (chunk-granular, pinned system prompt — LLM-Inf) is
  dispatched asynchronously, never synchronised on
  (ref: agents/infinisst.py:340-361);
- the compiled-shape set is closed: {first,later} x {full chunk, tail
  sizes} per multiplier; nothing recompiles as the stream grows.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
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
    dpo_sampling: bool = False  # dump per-chunk translations for DPO
    output_file: str = "translations.json"
    quantize: bool = False  # int8 weight-only decode (Pallas dequant matmul)
    # sampling decode (the reference's --do-sample path used to collect
    # DPO data, ref: agents/options.py temperature/top_k/top_p/
    # epsilon_cutoff, agents/infinisst.py:196): replaces beam search with
    # ancestral sampling through the same processor stack
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    epsilon_cutoff: float = 0.0
    sample_seed: int = 0
    # speculative greedy decode (decode/speculative.py): layer-skip draft
    # + k-token verify.  IMPLIES greedy semantics (beam is ignored) —
    # output is exactly sequential processed-greedy, only faster when the
    # draft's acceptance rate is high.  TPU-native extension; the
    # reference has no speculative path.
    speculative: bool = False
    spec_draft_layers: int = 8
    spec_k: int = 4
    spec_accept_all: bool = False  # bench-only machinery ceiling
    # shortlist draft head: the draft scores only spec_head_vocab vocab
    # ids through a column-sliced lm_head — shrinking the per-draft-step
    # head stream.  Default shortlist is the id prefix (BPE ids are
    # merge-frequency-ordered); spec_head_ids supplies corpus-ranked ids
    # instead (docs/spec_acceptance.json: ranked shortlists keep 65-80%
    # of full-head acceptance at 1/4 width).  0 = full head.  Exact
    # either way (decode/speculative.make_draft_head).
    spec_head_vocab: int = 0
    spec_head_ids: Optional[np.ndarray] = None
    # low-rank draft head (decode/speculative.make_lowrank_draft_head):
    # the draft scores the FULL vocab through truncated-SVD factors
    # A (D, r) @ B (r, V), cutting the dominant draft-step head stream
    # ~D/r x.  Exact either way (verify keeps the full head).
    # spec_lowrank_rank builds the factors at init by SVD of the model's
    # own lm_head (host-side; use on CPU-loaded checkpoints);
    # spec_lowrank_head supplies prebuilt {'a','b'} factors directly
    # (benchmarks / precomputed npz).  Mutually exclusive with
    # spec_head_vocab and with each other.
    spec_lowrank_rank: int = 0
    spec_lowrank_head: Optional[dict] = None
    # distilled early-exit adapter (train/draft.py): raises the draft's
    # acceptance at small spec_draft_layers without touching the
    # backbone; draft-only, so emissions stay exactly greedy.  A dict
    # {'ln','w1','w2'} (e.g. train.draft.load_adapter) — pass
    # expect_d=spec_draft_layers at load to catch depth mismatches.
    spec_adapter: Optional[dict] = None
    # speculative BEAM search (decode/spec_beam.py): draft the beam
    # evolution k levels, verify the whole tree in one weight stream —
    # the winner is exactly beam_search's (the reference's QUALITY
    # configuration gets the speculative speedup).  Requires
    # speculative=True and beam > 1; emission uses the deferred-commit
    # pend path like plain beam.
    spec_beam: bool = False
    # acceptance guard: --speculative cannot lose.  The agent tracks an
    # EMA of tokens-per-verify-round and, once it sits below the
    # weight-stream break-even (decode/speculative.
    # breakeven_tokens_per_round) for spec_guard_patience consecutive
    # chunks, permanently drops the stream to plain decode — same
    # emissions (speculation is exact), plain-decode cost.  Disabled
    # automatically under spec_accept_all (a bench ceiling, never below
    # break-even); set spec_guard=False to measure the raw overhead
    # envelope (bench --spec-no-guard).
    spec_guard: bool = True
    spec_guard_decay: float = 0.7  # per-chunk EMA decay
    spec_guard_patience: int = 3  # consecutive below-threshold chunks
    spec_guard_margin: float = 1.0  # threshold multiplier
    # AOT-compile the guard's plain fallback graph in a background
    # thread at the FIRST below-break-even chunk, so a later trip swaps
    # graphs without stalling the stream on a synchronous compile (a
    # fresh 8B graph takes minutes on a cold compile cache; the patience
    # window is the headroom).  Costs nothing on the healthy path — the
    # warm only starts once the EMA first dips below break-even.
    spec_warm_fallback: bool = True


class InfiniSSTAgent(SpeechToTextAgent):
    # subclasses with offline policies (AlignAtt/StreamAtt) never evict the
    # streaming LLM cache; they override this to skip the eviction pre-warm
    _uses_eviction = True

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        stream_cfg: StreamConfig,
        builder: PromptBuilder,
        opts: InfiniSSTOptions,
        param_dtype=jnp.float32,
    ):
        if opts.quantize:
            from infinisst_tpu.models.quant import quantize_llama_params

            params = dict(params)
            params["llama"] = quantize_llama_params(params["llama"])
        if opts.speculative and opts.spec_head_vocab:
            from infinisst_tpu.decode.speculative import make_draft_head

            if not 0 < opts.spec_head_vocab < model_cfg.llama.vocab_size:
                raise ValueError(
                    f"spec_head_vocab={opts.spec_head_vocab} must be in "
                    f"(0, vocab_size={model_cfg.llama.vocab_size})"
                )
            params = dict(params)
            # sliced ONCE at init (device op); rides the params pytree into
            # the jitted chunk fn so it is an input, not a graph constant
            params["spec_draft_head"] = make_draft_head(
                params["llama"]["lm_head"], opts.spec_head_vocab,
                ids=opts.spec_head_ids,
            )
        if opts.speculative and (
            opts.spec_lowrank_rank or opts.spec_lowrank_head is not None
        ):
            if opts.spec_head_vocab:
                raise ValueError(
                    "spec_lowrank_* and spec_head_vocab are mutually "
                    "exclusive draft-head choices"
                )
            if opts.spec_lowrank_rank and opts.spec_lowrank_head is not None:
                raise ValueError(
                    "pass spec_lowrank_rank (build by SVD at init) OR "
                    "spec_lowrank_head (prebuilt factors), not both"
                )
            params = dict(params)
            if opts.spec_lowrank_head is not None:
                w = opts.spec_lowrank_head
                D = model_cfg.llama.hidden_size
                if w["a"].shape[0] != D or (
                    w["a"].shape[1] != w["b"].shape[0]
                ):
                    raise ValueError(
                        f"spec_lowrank_head factor shapes "
                        f"{w['a'].shape} x {w['b'].shape} do not chain "
                        f"from hidden size {D}"
                    )
                params["spec_draft_head"] = {
                    "w": jax.tree.map(
                        lambda a: jnp.asarray(a, param_dtype), w
                    )
                }
            else:
                from infinisst_tpu.decode.speculative import (
                    make_lowrank_draft_head,
                )

                params["spec_draft_head"] = make_lowrank_draft_head(
                    params["llama"]["lm_head"], opts.spec_lowrank_rank,
                    dtype=param_dtype,
                )
        if opts.speculative and opts.spec_adapter is not None:
            D = model_cfg.llama.hidden_size
            if opts.spec_adapter["ln"].shape != (D,):
                raise ValueError(
                    f"spec_adapter hidden size "
                    f"{opts.spec_adapter['ln'].shape} does not match the "
                    f"model ({D},)"
                )
            params = dict(params)
            # rides the params pytree into the jitted chunk fn (a traced
            # input, not a baked constant), cast to the compute dtype
            params["spec_adapter"] = jax.tree.map(
                lambda a: jnp.asarray(a, param_dtype), opts.spec_adapter
            )
        self.params = params
        self.cfg = model_cfg
        self.stream = stream_cfg
        self.builder = builder
        self.opts = opts
        self.dtype = param_dtype
        self.tokenizer = builder.tokenizer

        self.unit_samples = stream_cfg.chunk_samples(1)  # 960 ms padding unit
        # the device window is sized for the max multiplier so that
        # update_multiplier (ref: agents/infinisst.py:125-128) never needs
        # to reshape device state
        self.window_samples = CONV_LEFT_CONTEXT + 2 * stream_cfg.chunk_samples(
            opts.max_latency_multiplier
        )
        self._set_multiplier_geometry(opts.latency_multiplier)

        V = model_cfg.llama.vocab_size
        sup = np.zeros((V,), bool)
        if opts.suppress_tokens is not None:
            sup[np.asarray(opts.suppress_tokens, np.int64)] = True
        self._suppress = jnp.asarray(sup)

        self._gen_fns: Dict = {}  # (n_units, first) -> jitted generate_chunk
        # acceptance-guard break-even (static per config): tokens a verify
        # round must emit for speculation to beat plain decode
        self._spec_breakeven = None
        if opts.speculative and opts.spec_guard and not opts.spec_accept_all:
            from infinisst_tpu.decode.speculative import (
                breakeven_tokens_per_round,
            )

            self._spec_breakeven = breakeven_tokens_per_round(
                params["llama"],
                model_cfg.llama.num_layers,
                opts.spec_draft_layers,
                opts.spec_k,
                draft_head=params.get("spec_draft_head"),
                exit_adapter=params.get("spec_adapter"),
            )
        super().__init__()
        self._init_device_state()

    def _set_multiplier_geometry(self, m: int):
        self.opts.latency_multiplier = m
        self.chunk_samples = self.stream.chunk_samples(m)
        self.chunk_frames = self.stream.chunk_frames(m)
        self.max_new = self.stream.max_new_tokens(m)

    def update_multiplier(self, multiplier: int):
        """Change the latency multiplier mid-stream
        (ref: agents/infinisst.py:125-128).  Device state is shape-stable;
        only the per-m compiled step changes."""
        assert 1 <= multiplier <= self.opts.max_latency_multiplier
        self._set_multiplier_geometry(multiplier)

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
        # device-resident rolling window + n-gram history + deferred-commit
        # pending tokens (the previous chunk's winning tokens, folded into
        # the next chunk's prefill to save one weight stream per chunk)
        self.window = jnp.zeros((1, self.window_samples), jnp.float32)
        Lh = self.opts.no_repeat_ngram_lookback
        self.hist = jnp.full((Lh,), self.cfg.tokens.pad, jnp.int32)
        self.hist_len = jnp.zeros((), jnp.int32)
        self.pend_cap = self.stream.max_new_tokens(
            self.opts.max_latency_multiplier
        )
        self.pend_tokens = jnp.full(
            (self.pend_cap,), self.cfg.tokens.pad, jnp.int32
        )
        self.pend_n = jnp.zeros((), jnp.int32)
        self.cache_checkpoints = []  # token counts at chunk ends (host mirror)
        self._chunk_counter = 0  # per-chunk sampling rng stream
        self._sample_base_key = None  # built lazily on first sampled chunk
        self.llm_cache_len = 0  # host mirror (logical: physical + pending)
        self.pend_n_host = 0
        # count of cache trims decided so far (bench/serve observability:
        # lets long-stream rows locate the eviction boundary)
        self.evictions = 0
        # deferred eviction: (keep_physical, sys_len) decided after the
        # previous chunk, applied inside the NEXT chunk's compiled step
        self._pending_evict = None
        self.system_prompt_size = 0
        self.first_chunk = True
        # cumulative speculative-decode stats (acceptance reporting)
        self.spec_rounds = 0
        self.spec_drafted = 0
        self.spec_accepted = 0
        self.spec_emitted = 0
        # acceptance guard (per-stream): EMA of tokens-per-verify-round,
        # consecutive below-break-even chunks, and the sticky fallback
        self._spec_tpr_ema = None
        self._spec_below = 0
        self._spec_fallback = False
        # background AOT warm of the fallback graph (spec_warm_fallback)
        self._fallback_warm = None  # the warm thread, once started
        self._fallback_compiled: Dict = {}  # key -> (compiled, prompt)

    def reset(self):
        super().reset()
        self._init_device_state()

    @property
    def spec_fallback_active(self) -> bool:
        """True once the acceptance guard dropped this stream to plain
        decode (bench/telemetry surface)."""
        return self._spec_fallback

    def flush_pending_evict(self):
        """Apply a deferred cache trim now (normally it rides the next
        chunk's compiled step).  Only needed when inspecting ``dec_state``
        between chunks — e.g. end-of-stream invariant checks; a live stream
        never calls this."""
        if self._pending_evict is None:
            return
        keep, sys_len = self._pending_evict
        self._pending_evict = None
        self.dec_state = jax.jit(
            llama_mod.evict_cache, donate_argnums=(0,)
        )(
            self.dec_state,
            jnp.asarray([keep], jnp.int32),
            jnp.asarray(sys_len, jnp.int32),
        )

    def build_states(self):
        return AgentStates()

    # -- jitted chunk step ---------------------------------------------------
    def _generate_chunk_fn(self, n_units: int, first: bool,
                           fallback: Optional[bool] = None):
        """Build + cache the fused jitted step for a chunk of ``n_units``
        960 ms units (n_units == m except for the stream tail).
        ``fallback`` overrides the guard's sticky flag (the background
        warm builds the fallback variant BEFORE the trip)."""
        m = self.opts.latency_multiplier
        # the acceptance guard's fallback selects the PLAIN decode variant
        # of the step (same emissions — speculation is exact — without the
        # draft's cost); both variants may coexist in the compile set
        if fallback is None:
            fallback = self._spec_fallback
        key = (m, n_units, first, fallback)
        if fallback:
            # a tripped stream prefers the background-warmed executable:
            # the swap then costs nothing.  If the warm is still
            # compiling, wait for it (the compile is already underway —
            # never slower than starting a synchronous one here).
            if (self._fallback_warm is not None
                    and self._fallback_warm.is_alive()
                    and self._spec_fallback):
                self._fallback_warm.join()
            if key in self._fallback_compiled:
                return self._fallback_compiled[key]
        if key in self._gen_fns:
            return self._gen_fns[key]
        prompt = self.builder.chunk_prompt(m, first, n_patches=12 * n_units)
        prompt_ids = jnp.asarray(prompt.ids)[None]
        patch_start = prompt.patch_start
        chunk_frames = 48 * n_units
        chunk_samples = n_units * self.unit_samples
        full_m_samples = self.chunk_samples
        # the guard's greedy fallback must stay GREEDY-exact: plain beam
        # search at beam=1 selects the argmax chain (speculation ignores
        # opts.beam, which the bench sets to 4 for the plain headline)
        plain_beam = (
            1
            if (fallback and self.opts.speculative
                and not self.opts.spec_beam and not self.opts.do_sample)
            else self.opts.beam
        )
        spec = beam_mod.BeamSpec(
            beam=plain_beam,
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
        G = self.max_new
        Lh = self.opts.no_repeat_ngram_lookback
        is_tail = n_units != m
        do_sample = self.opts.do_sample
        speculative = self.opts.speculative
        spec_beam = speculative and self.opts.spec_beam and not fallback
        # guard fallback: ALL modes drop to the TRUE PLAIN graph.
        # greedy: plain decode is token-identical (speculation is exact).
        # spec_beam: plain beam_search (winner-identical).  sampling: the
        # plain sampler — exact in distribution like the spec sampler,
        # but a different realised sample path (documented swap; with
        # top_k=1 still token-identical).  A d = L self-draft fallback
        # was measured instead first and REJECTED: batched-verify float
        # accumulation forks near-ties on the argmax, so its "perfect"
        # acceptance drops below 1 and hardware cost landed ~1.5x plain
        # (0.2465 vs 0.1634 RTF, docs/hw_rows_r4.jsonl ra0.75 row) —
        # the guard must recover plain cost, not approximately-plain.
        spec_d = self.opts.spec_draft_layers
        if fallback:
            speculative = False
        if spec_beam:
            if do_sample:
                raise ValueError(
                    "spec_beam is beam-search-exact; it cannot be "
                    "combined with --do-sample"
                )
            if self.opts.beam <= 1:
                raise ValueError("spec_beam requires beam > 1")
        if speculative and not spec_beam:
            from infinisst_tpu.decode import speculative as spec_mod

            if do_sample:
                # speculative SAMPLING: exact in distribution vs the
                # sample_decode path (same processed target law), the
                # draft only moves speed (decode/speculative.py)
                if self.opts.spec_accept_all:
                    raise ValueError(
                        "--spec-accept-all is a greedy bench mode; it has "
                        "no sampling counterpart"
                    )
                sp_spec = spec_mod.SpecSampleSpec(
                    max_new_tokens=self.max_new,
                    eos_id=self.cfg.tokens.eos,
                    pad_id=self.cfg.tokens.pad,
                    draft_layers=spec_d,
                    draft_k=self.opts.spec_k,
                    temperature=self.opts.temperature,
                    top_k=self.opts.top_k,
                    top_p=self.opts.top_p,
                    epsilon_cutoff=self.opts.epsilon_cutoff,
                    no_repeat_ngram_size=self.opts.no_repeat_ngram_size,
                    repetition_penalty=self.opts.repetition_penalty,
                )
            else:
                sp_spec = spec_mod.SpecSpec(
                    max_new_tokens=self.max_new,
                    eos_id=self.cfg.tokens.eos,
                    pad_id=self.cfg.tokens.pad,
                    draft_layers=spec_d,
                    draft_k=self.opts.spec_k,
                    no_repeat_ngram_size=self.opts.no_repeat_ngram_size,
                    repetition_penalty=self.opts.repetition_penalty,
                    accept_all=self.opts.spec_accept_all,
                )
        if do_sample:
            sspec = beam_mod.SampleSpec(
                max_new_tokens=self.max_new,
                eos_id=self.cfg.tokens.eos,
                pad_id=self.cfg.tokens.pad,
                temperature=self.opts.temperature,
                top_p=self.opts.top_p,
                top_k=self.opts.top_k,
                epsilon_cutoff=self.opts.epsilon_cutoff,
                no_repeat_ngram_size=self.opts.no_repeat_ngram_size,
                repetition_penalty=self.opts.repetition_penalty,
            )

        P = self.pend_cap

        def generate_chunk(params, enc_state, dec_state, window, hist,
                           hist_len, pend_tokens, pend_n, chunk_i16,
                           ev_keep, ev_sys, rng=None):
            # deferred eviction: the PREVIOUS chunk's cache trim (decided on
            # host from its emission count) is applied here, inside the same
            # compiled step as this chunk's prefill — a separate eviction
            # dispatch costs a fixed ~26 ms RTT per chunk on high-latency
            # links (the gather itself is <1 ms).  Identity when no trim is
            # pending (ev_keep == valid_len, ev_sys == 0).  The cache the
            # prefill sees is bit-identical to the old evict-after-chunk
            # ordering; capacity bounds are unchanged (the trim still lands
            # before the next append).  ref: agents/infinisst.py:340-361.
            dec_state = llama_mod.evict_cache(dec_state, ev_keep, ev_sys)
            # roll the device window; tail chunks use the last
            # (left_context + prev_chunk) of the window + the short tail
            new = chunk_i16.astype(jnp.float32)[None, :] / 32768.0
            window = jnp.concatenate(
                [window[:, chunk_samples:], new], axis=1
            )
            if not is_tail:
                # conv input: left context + previous chunk + this chunk
                conv_in = window[:, -(CONV_LEFT_CONTEXT + 2 * chunk_samples):]
            else:
                # short tail: left context + one full-m chunk of history +
                # the tail
                conv_in = window[
                    :, -(CONV_LEFT_CONTEXT + full_m_samples + chunk_samples):
                ]

            # deferred commit: prefill [prev winning tokens | chunk prompt]
            # in ONE pass (one weight stream instead of two; the cache ends
            # up identical to commit-then-prefill since order is preserved)
            speech, enc2 = speech_llm.encode_chunk(
                params, cfg, enc_state, conv_in, chunk_frames,
                stream.max_cache_frames,
            )
            prompt_emb = speech_llm.splice_speech(
                params, prompt_ids, speech, patch_start
            )  # (1, S, D)
            S = prompt_emb.shape[1]
            D = prompt_emb.shape[2]
            pend_emb = llama_mod.embed(params["llama"], pend_tokens[None])
            buf = jnp.zeros((1, P + S, D), prompt_emb.dtype)
            buf = jax.lax.dynamic_update_slice(buf, pend_emb, (0, 0, 0))
            buf = jax.lax.dynamic_update_slice(buf, prompt_emb, (0, pend_n, 0))
            valid = (
                jnp.arange(P + S)[None] < (pend_n + S)
            ).astype(jnp.int32)
            logits, dec2 = llama_mod.decode_step(
                params["llama"], cfg.llama, dec_state, buf, valid_mask=valid
            )
            last_logits = jax.lax.dynamic_index_in_dim(
                logits[0], pend_n + S - 1, axis=0, keepdims=False
            )
            if spec_beam:
                from infinisst_tpu.decode.spec_beam import spec_beam_search

                res = spec_beam_search(
                    params["llama"],
                    cfg.llama,
                    dec2,
                    last_logits,
                    prompt_ids[0],
                    jnp.asarray(prompt_ids.shape[1], jnp.int32),
                    hist,
                    hist_len,
                    spec,  # the plain BeamSpec — same semantics
                    draft_layers=self.opts.spec_draft_layers,
                    draft_k=self.opts.spec_k,
                    encoder_ngram_size=enc_ng,
                    suppress_mask=suppress,
                    draft_head=params.get("spec_draft_head"),
                    exit_adapter=params.get("spec_adapter"),
                    accept_all=self.opts.spec_accept_all,
                )
            elif do_sample and not speculative:
                res = beam_mod.sample_decode(
                    params["llama"],
                    cfg.llama,
                    dec2,
                    last_logits,
                    prompt_ids[0],
                    jnp.asarray(prompt_ids.shape[1], jnp.int32),
                    hist,
                    hist_len,
                    sspec,
                    rng,
                    encoder_ngram_size=enc_ng,
                    suppress_mask=suppress,
                )
            elif speculative:
                from infinisst_tpu.decode import speculative as spec_mod

                fn = (
                    spec_mod.speculative_sample
                    if do_sample else spec_mod.speculative_greedy
                )
                extra_rng = {"rng": rng} if do_sample else {}
                res = fn(
                    params["llama"],
                    cfg.llama,
                    dec2,
                    last_logits,
                    prompt_ids[0],
                    jnp.asarray(prompt_ids.shape[1], jnp.int32),
                    hist,
                    hist_len,
                    sp_spec,
                    encoder_ngram_size=enc_ng,
                    suppress_mask=suppress,
                    draft_head=params.get("spec_draft_head"),
                    exit_adapter=params.get("spec_adapter"),
                    **extra_rng,
                )
            else:
                res = beam_mod.beam_search(
                    params["llama"],
                    cfg.llama,
                    dec2,
                    last_logits,
                    prompt_ids[0],
                    jnp.asarray(prompt_ids.shape[1], jnp.int32),
                    hist,
                    hist_len,
                    spec,
                    encoder_ngram_size=enc_ng,
                    suppress_mask=suppress,
                )
            # emitted tokens: drop the final one when the cap was hit
            # without EOS (ref quirk: sequences[..., :-1], infinisst.py:363)
            n_emit = jnp.where(
                res.hit_eos, res.n_tokens, jnp.maximum(res.n_tokens - 1, 0)
            )
            if speculative and not spec_beam:
                # speculative verification already committed the generated
                # tokens' K/V into the cache; roll back to the EMITTED
                # prefix (the cap-dropped final token must not condition
                # future chunks) and leave nothing pending.
                dec2 = res.dec._replace(
                    valid_len=res.dec.valid_len - (res.n_tokens - n_emit)
                )
                pend_out = jnp.full((P,), cfg.tokens.pad, jnp.int32)
                pend_n_out = jnp.zeros((), jnp.int32)
            else:
                # new pending = this chunk's EMITTED tokens (committed next
                # call).  The reference also drops the capped last token
                # from the cache (its KV is never computed:
                # sequences[:, :-1] before the next forward), so pending
                # must hold n_emit tokens, not n_tokens — otherwise the
                # model conditions on a token the user never saw.
                pend_out = jnp.full((P,), cfg.tokens.pad, jnp.int32)
                pend_out = jax.lax.dynamic_update_slice(
                    pend_out, res.tokens, (0,)
                )
                pend_out = jnp.where(
                    jnp.arange(P) < n_emit, pend_out, cfg.tokens.pad
                )
                pend_n_out = n_emit
            # device-side history ring update (last Lh emitted tokens):
            # append the new tokens at hist_len, keep the trailing Lh window
            cat = jnp.concatenate([hist, jnp.full((G,), cfg.tokens.pad, hist.dtype)])
            cat = jax.lax.dynamic_update_slice(cat, res.tokens, (hist_len,))
            new_len = jnp.minimum(hist_len + n_emit, Lh)
            start = hist_len + n_emit - new_len
            new_hist = jax.lax.dynamic_slice(cat, (start,), (Lh,))
            # mask garbage beyond new_len
            new_hist = jnp.where(
                jnp.arange(Lh) < new_len, new_hist, cfg.tokens.pad
            )
            parts = [
                res.n_tokens[None],
                res.hit_eos.astype(jnp.int32)[None],
                n_emit[None],
                res.tokens,
            ]
            if speculative:
                # draft diagnostics for the bench / acceptance reporting
                parts += [res.rounds[None], res.drafted[None],
                          res.accepted[None]]
            packed = jnp.concatenate(parts)
            return (
                packed, enc2, dec2, window, new_hist, new_len,
                pend_out, pend_n_out,
            )

        gen = jax.jit(generate_chunk, donate_argnums=(1, 2, 3, 4, 6))
        self._gen_fns[key] = (gen, prompt)
        return self._gen_fns[key]

    def _start_fallback_warm(self, n_units: int):
        """AOT-compile the guard's plain fallback step for the steady
        chunk shape in a daemon thread.  Started at the FIRST
        below-break-even chunk, so by the time the guard trips
        (``spec_guard_patience`` chunks later) the swap costs an
        executable lookup, not a synchronous compile — a fresh 8B graph
        takes minutes to build on a cold compile cache.  Lowering uses
        ShapeDtypeStructs only (state buffers are donated by the live
        step and must not be touched); best-effort — on any failure the
        trip compiles synchronously as before."""
        from infinisst_tpu.core import bgcompile

        m = self.opts.latency_multiplier
        key = (m, n_units, False, True)
        if (self._fallback_warm is not None or key in self._fallback_compiled
                or key in self._gen_fns):
            return
        aval = lambda x: jax.ShapeDtypeStruct(  # noqa: E731
            jnp.shape(x), jnp.result_type(x)
        )
        lead = jax.tree.map(aval, (
            self.params, self.enc_state, self.dec_state, self.window,
            self.hist, self.hist_len, self.pend_tokens, self.pend_n,
        ))
        tail = (
            jax.ShapeDtypeStruct((n_units * self.unit_samples,), jnp.int16),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
        kw = {}
        if self.opts.do_sample:
            if self._sample_base_key is None:
                self._sample_base_key = jax.random.PRNGKey(
                    self.opts.sample_seed
                )
            kw["rng"] = aval(self._sample_base_key)

        def warm():
            try:
                fn, prompt = self._generate_chunk_fn(
                    n_units, False, fallback=True
                )
                compiled = fn.lower(*lead, *tail, **kw).compile()
                self._fallback_compiled[key] = (compiled, prompt)
            except Exception as e:  # pragma: no cover — warm is best-effort
                print(
                    f"[spec-guard] background fallback warm failed "
                    f"({e!r}); a trip will compile synchronously",
                    file=sys.stderr, flush=True,
                )

        self._fallback_warm = bgcompile.spawn(warm, "spec-fallback-warm")

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
            print(f"generate: {perf_counter() - t0:.4f} seconds")

        if opts.dpo_sampling:
            # ref: agents/infinisst.py:369-381
            states.translations_list.append(
                f"'{translation}'" if translation else "''"
            )
            if states.source_finished:
                try:
                    with open(opts.output_file, "a", encoding="utf-8") as f:
                        f.write(
                            "[" + ", ".join(states.translations_list) + "]\n"
                        )
                    states.translations_list = []
                except OSError as e:
                    print(f"Error writing translations to file: {e}")

        states.segment_idx += 1
        if translation != "" or states.source_finished:
            return WriteAction(content=translation, finished=states.source_finished)
        return ReadAction()

    def _process_chunk(self, states: AgentStates, seg: np.ndarray, n_units: int) -> str:
        opts = self.opts
        m = opts.latency_multiplier

        first = self.first_chunk
        if first:
            self.system_prompt_size = self.builder.system_prompt_size(m)
        fn, prompt = self._generate_chunk_fn(n_units, first)

        # int16 upload halves link bytes; sources are 16-bit PCM so this is
        # lossless for real audio
        chunk_i16 = np.clip(seg * 32768.0, -32768, 32767).astype(np.int16)
        import os as _os

        _dbg = _os.environ.get("INFINISST_CHUNK_TIMING")
        if _dbg:
            _t0 = perf_counter()
            dev_chunk = jax.block_until_ready(jnp.asarray(chunk_i16))
            _t1 = perf_counter()
        else:
            dev_chunk = jnp.asarray(chunk_i16)
        # apply the previous chunk's pending cache trim inside this step;
        # identity (keep = current physical length, sys = 0) otherwise
        if self._pending_evict is not None:
            ev_keep, ev_sys = self._pending_evict
            self._pending_evict = None
        else:
            ev_keep = self.llm_cache_len - self.pend_n_host
            ev_sys = 0
        extra = {}
        if opts.do_sample:
            # fresh randomness per chunk, reproducible per (seed, chunk #);
            # the base key is built once (each extra device execution costs
            # a fixed dispatch latency on remote backends)
            if self._sample_base_key is None:
                self._sample_base_key = jax.random.PRNGKey(opts.sample_seed)
            extra["rng"] = jax.random.fold_in(
                self._sample_base_key, self._chunk_counter
            )
        self._chunk_counter += 1
        (
            packed,
            self.enc_state,
            self.dec_state,
            self.window,
            self.hist,
            self.hist_len,
            self.pend_tokens,
            self.pend_n,
        ) = fn(
            self.params,
            self.enc_state,
            self.dec_state,
            self.window,
            self.hist,
            self.hist_len,
            self.pend_tokens,
            self.pend_n,
            dev_chunk,
            jnp.asarray([ev_keep], jnp.int32),
            jnp.asarray(ev_sys, jnp.int32),
            **extra,
        )
        if _dbg:
            _t2 = perf_counter()
        # the ONLY host sync per chunk (jax.device_get, NOT np.asarray: the
        # latter can hit a pathologically slow path on remote backends)
        packed = jax.device_get(packed)
        if _dbg:
            _t3 = perf_counter()
            print(
                f"  [chunk-timing] upload {(_t1-_t0)*1e3:.1f}ms "
                f"dispatch {(_t2-_t1)*1e3:.1f}ms "
                f"exec+fetch {(_t3-_t2)*1e3:.1f}ms",
                flush=True,
            )
        n_emit = int(packed[2])
        out_ids = packed[3 : 3 + n_emit].tolist()
        # the guard's fallback runs the TRUE PLAIN graph for every mode
        # (no spec fields in packed); this flag reflects the graph that
        # produced THIS chunk — _spec_fallback cannot have changed since
        # the step was selected, the trip happens below
        spec_graph = opts.speculative and not self._spec_fallback
        if spec_graph:
            # greedy/sampling speculation committed the tokens' K/V
            # in-cache during verification; spec_beam defers like plain
            # beam (the winner's tokens replay into the next prefill)
            self.pend_n_host = n_emit if opts.spec_beam else 0
            r, dr, ac = (int(x) for x in packed[-3:])
            self.spec_rounds += r
            self.spec_drafted += dr
            self.spec_accepted += ac
            self.spec_emitted += n_emit  # what the user actually saw
            if (
                self._spec_breakeven is not None
                and not self._spec_fallback
                and r > 0
            ):
                # tokens per verify round = accepted prefix + 1 anchor
                tpr = (ac + r) / r
                dc = opts.spec_guard_decay
                self._spec_tpr_ema = (
                    tpr if self._spec_tpr_ema is None
                    else dc * self._spec_tpr_ema + (1.0 - dc) * tpr
                )
                if (
                    self._spec_tpr_ema
                    < self._spec_breakeven * opts.spec_guard_margin
                ):
                    self._spec_below += 1
                    if opts.spec_warm_fallback:
                        # start compiling the plain fallback now; the
                        # patience window is the compile headroom
                        self._start_fallback_warm(m)
                else:
                    self._spec_below = 0
                if self._spec_below >= opts.spec_guard_patience:
                    self._spec_fallback = True
                    print(
                        f"[spec-guard] tokens/round EMA "
                        f"{self._spec_tpr_ema:.2f} < break-even "
                        f"{self._spec_breakeven:.2f} for "
                        f"{self._spec_below} chunks: dropping this "
                        "stream to plain decode",
                        file=sys.stderr, flush=True,
                    )
        else:
            self.pend_n_host = n_emit

        self.first_chunk = False
        states.target_ids.extend(out_ids)

        # --- cache bookkeeping (host mirror, LOGICAL = physical + pending;
        # ref :337-361)
        self.llm_cache_len += prompt.ids.shape[0] + n_emit
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
            # deferred: the trim is applied inside the NEXT chunk's step
            # (same device-visible cache at the next prefill; saves one
            # dispatch RTT per chunk).  The mirror counts logical tokens
            # (incl. this chunk's pending, not yet physically in the
            # cache); eviction keeps the physical tail.
            self._pending_evict = (new_len - self.pend_n_host, sys_len)
            self.evictions += 1
            self.llm_cache_len = new_len + sys_len

        text = self.tokenizer.decode(out_ids, skip_special_tokens=True).strip()
        return text.replace("�", "")
