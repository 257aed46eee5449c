"""Batched multi-client streaming engine.

The reference serves one stream per GPU (batch 1, SURVEY.md §2
"inference parallelism: none"; its separate serving demo used flashinfer
paged attention and is not in the release branch).  Here multi-client
serving is native: a fixed pool of stream slots shares one set of batched
jitted step functions —

- per tick, every slot with a full pending chunk is encoded+prefilled in
  one batched call (slots are padded with dummy rows up to the pool size,
  so the compiled-shape set stays {pool_size} x {first/later});
- decode is batched greedy (beam=1) or batched BEAM SEARCH (beam>1): the
  single-stream shared-prefix trick generalised to per-slot prefixes
  (decode/beam.batched_beam_search) — per-token matmuls run at
  pool*beam rows so the weight stream is shared across slots and beams,
  and the winning tokens are committed with one batched replay (the
  reference's quality numbers are beam-4, scripts/infer/infinisst.sh:42);
- per-slot KV validity/eviction uses the same left-aligned cache + gather
  machinery as the single-stream agent.

Latency multipliers are PER-SLOT (``multipliers=(1,2,4)`` declares the
allowed set): every per-row quantity the multiplier touches — chunk
cadence, encoder block size, audio window shift, patch count, generation
cap — is a traced (B,) input to ONE compiled step at the m_max-padded
geometry.  A slot at m ticks every m x 960 ms and sits other ticks out
with a zero row shift (its window/ring/cache pass through untouched),
so mixed-m clients share the weight stream of a single pool, and
``update_multiplier`` switches a live slot without recompiling (the
pooled equivalent of agents/infinisst.py:152-157).  Language pair is
per-slot (the system prompt differs per slot, which the batched prefill
handles with padded prompts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from infinisst_tpu.core.config import (
    CONV_LEFT_CONTEXT,
    SAMPLES_PER_FRAME,
    ModelConfig,
    StreamConfig,
)
from infinisst_tpu.data.template import PromptBuilder
from infinisst_tpu.decode import logits as lp
from infinisst_tpu.models import llama as llama_mod
from infinisst_tpu.models import speech_llm
from infinisst_tpu.streaming.state import (
    init_decoder_state,
    init_encoder_state,
)


@dataclass
class StreamSlot:
    active: bool = False
    client_id: Optional[str] = None
    lang_pair: tuple = ("English", "German")
    m: int = 1  # latency multiplier (chunk cadence = m x 960 ms)
    pending: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float32)
    )
    window: Optional[np.ndarray] = None
    first_chunk: bool = True
    finished_input: bool = False
    done: bool = False
    target_ids: List[int] = field(default_factory=list)
    cache_len: int = 0
    cache_checkpoints: List[int] = field(default_factory=list)
    system_prompt_size: int = 0


class ServingEngine:
    def __init__(
        self,
        params,
        cfg: ModelConfig,
        stream_cfg: StreamConfig,
        builders: Dict[tuple, PromptBuilder],  # (src,tgt) -> builder
        pool_size: int = 8,
        multiplier: int = 1,
        max_new_tokens: Optional[int] = None,
        dtype=jnp.bfloat16,
        beam: int = 1,
        suppress_tokens=None,  # ids to ban (agents' --suppress-non-language)
        multipliers: Optional[tuple] = None,  # allowed per-slot multipliers
        speculative: bool = False,  # layer-skip spec decode (beam=1 only)
        spec_draft_layers: int = 8,
        spec_k: int = 4,
        spec_accept_all: bool = False,  # bench-only machinery ceiling
        spec_head_vocab: int = 0,  # shortlist draft head width (0 = full)
        spec_head_ids=None,  # corpus-ranked shortlist ids (None = prefix)
        spec_adapter: Optional[dict] = None,  # distilled early-exit
        # adapter (train/draft.py load_adapter) — draft-only, exactness
        # untouched; raises acceptance at small spec_draft_layers
        spec_lowrank_rank: int = 0,  # low-rank draft head via SVD at init
        spec_lowrank_head: Optional[dict] = None,  # prebuilt {'a','b'}
        do_sample: bool = False,  # pooled speculative SAMPLING: exact in
        # distribution per row (decode/speculative.py rejection scheme);
        # requires speculative=True — pooled plain sampling would pay one
        # full weight stream per token, which is what speculation removes
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        epsilon_cutoff: float = 0.0,
        sample_seed: int = 0,
        # acceptance guard (pool-wide): tracks an EMA of tokens per verify
        # round across ticks and, below the weight-stream break-even
        # (decode/speculative.breakeven_tokens_per_round) for
        # spec_guard_patience consecutive ticks, swaps the pool to the
        # plain-cost step (greedy: the TRUE plain pool, token-identical;
        # sampling: the d=L self-draft pool, exact in distribution).
        # Auto-disabled under spec_accept_all.
        spec_guard: bool = True,
        spec_guard_decay: float = 0.7,
        spec_guard_patience: int = 3,
        spec_guard_margin: float = 1.0,
        # AOT-compile the fallback step in a background thread at the
        # first below-break-even tick, so a trip swaps graphs without
        # stalling the pool on a synchronous compile
        spec_warm_fallback: bool = True,
    ):
        if do_sample and not speculative:
            raise ValueError(
                "pooled sampling is implemented as speculative sampling: "
                "pass speculative=True (the rejection scheme makes it "
                "exact in distribution at any draft quality)"
            )
        if do_sample and spec_accept_all:
            raise ValueError(
                "--spec-accept-all is a greedy bench mode; it has no "
                "sampling counterpart"
            )
        if speculative and (spec_lowrank_rank or spec_lowrank_head):
            if spec_head_vocab:
                raise ValueError(
                    "spec_lowrank_* and spec_head_vocab are mutually "
                    "exclusive draft-head choices"
                )
            if spec_lowrank_rank and spec_lowrank_head is not None:
                raise ValueError(
                    "pass spec_lowrank_rank (build by SVD at init) OR "
                    "spec_lowrank_head (prebuilt factors), not both"
                )
            params = dict(params)
            if spec_lowrank_head is not None:
                w = spec_lowrank_head
                D = cfg.llama.hidden_size
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
                        lambda a: jnp.asarray(a, dtype), w
                    )
                }
            else:
                from infinisst_tpu.decode.speculative import (
                    make_lowrank_draft_head,
                )

                params["spec_draft_head"] = make_lowrank_draft_head(
                    params["llama"]["lm_head"], spec_lowrank_rank,
                    dtype=dtype,
                )
        if speculative and spec_head_vocab:
            from infinisst_tpu.decode.speculative import make_draft_head

            if not 0 < spec_head_vocab < cfg.llama.vocab_size:
                raise ValueError(
                    f"spec_head_vocab={spec_head_vocab} must be in "
                    f"(0, vocab_size={cfg.llama.vocab_size})"
                )
            params = dict(params)
            # sliced ONCE here; rides the params pytree into the jitted
            # tick so it is an input, not a baked graph constant
            params["spec_draft_head"] = make_draft_head(
                params["llama"]["lm_head"], spec_head_vocab,
                ids=spec_head_ids,
            )
        if speculative and spec_adapter is not None:
            D = cfg.llama.hidden_size
            if spec_adapter["ln"].shape != (D,):
                raise ValueError(
                    f"spec_adapter hidden size {spec_adapter['ln'].shape} "
                    f"does not match the model ({D},)"
                )
            params = dict(params)
            params["spec_adapter"] = jax.tree.map(
                lambda a: jnp.asarray(a, dtype), spec_adapter
            )
        self.params = params
        self.cfg = cfg
        self.stream = stream_cfg
        self.builders = builders
        self.pool = pool_size
        self.m = multiplier  # default multiplier for new slots
        # the default is always allowed — a client that opens without
        # requesting a multiplier gets self.m, which must be servable
        self.multipliers = tuple(
            sorted(set(multipliers or ()) | {multiplier})
        )
        m_max = max(self.multipliers)
        self.m_max = m_max
        self.max_new = max_new_tokens or stream_cfg.max_new_tokens(m_max)
        self.dtype = dtype
        self.beam = beam
        if speculative and beam != 1:
            raise ValueError(
                "speculative serving is greedy-exact; it requires beam=1"
            )
        self.speculative = speculative
        self.spec_draft_layers = spec_draft_layers
        self.spec_k = spec_k
        self.spec_accept_all = spec_accept_all
        self.spec_stats = {"rounds": 0, "drafted": 0, "accepted": 0,
                           "emitted": 0}
        # acceptance guard state (pool-wide)
        self.spec_guard = spec_guard
        self.spec_guard_decay = spec_guard_decay
        self.spec_guard_patience = spec_guard_patience
        self.spec_guard_margin = spec_guard_margin
        self._spec_breakeven = None
        self._spec_tpr_ema = None
        self._spec_below = 0
        self._spec_fallback = False
        self._step_fn_fallback = None  # built lazily on first trip
        self.spec_warm_fallback = spec_warm_fallback
        self._fallback_warm = None  # background AOT warm thread
        self._step_avals = None  # tick arg ShapeDtypeStructs (for lower)
        if speculative and spec_guard and not spec_accept_all:
            from infinisst_tpu.decode.speculative import (
                breakeven_tokens_per_round,
            )

            self._spec_breakeven = breakeven_tokens_per_round(
                params["llama"],
                cfg.llama.num_layers,
                spec_draft_layers,
                spec_k,
                draft_head=params.get("spec_draft_head"),
                exit_adapter=params.get("spec_adapter"),
            )
        self.do_sample = do_sample
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.epsilon_cutoff = epsilon_cutoff
        # per-tick decode randomness: fold_in(base, tick#) — reproducible
        # for a fixed arrival schedule, fresh across ticks
        self._sample_key = jax.random.PRNGKey(sample_seed)
        self._tick_counter = 0

        # padded per-tick geometry (rows at m < m_max carry fewer real
        # frames; a row sitting a tick out carries zero)
        self.chunk_samples = stream_cfg.chunk_samples(m_max)
        self.chunk_frames = stream_cfg.chunk_frames(m_max)
        self.window_samples = CONV_LEFT_CONTEXT + 2 * self.chunk_samples
        V = cfg.llama.vocab_size
        sup = np.zeros((V,), bool)
        if suppress_tokens is not None:
            sup[np.asarray(suppress_tokens, np.int64)] = True
        self._suppress = jnp.asarray(sup) if sup.any() else None

        w, ll = cfg.w2v2, cfg.llama
        # device-resident rolling windows (uploading full f32 windows per
        # tick dominates on high-latency links; only int16 chunks go up)
        self.windows = jnp.zeros((pool_size, self.window_samples), jnp.float32)
        self.valid_len_host = np.zeros((pool_size,), np.int64)
        self.enc_state = init_encoder_state(
            w.encoder_layers, pool_size, stream_cfg.max_cache_frames,
            w.encoder_attention_heads, w.head_dim, dtype,
        )
        self.dec_state = init_decoder_state(
            ll.num_layers, pool_size, stream_cfg.llm_cache_capacity,
            ll.num_kv_heads, ll.head_dim, dtype,
        )
        self.slots = [StreamSlot() for _ in range(pool_size)]
        # cumulative count of per-slot cache trims (soak observability)
        self.evictions = 0
        # deferred batched trim: applied as traced operands of the NEXT
        # tick's compiled step (same design as the agent's in-step
        # eviction, agents/infinisst.py — a standalone _evict_fn dispatch
        # per eviction-active tick costs the link's fixed RTT, which in
        # steady state is EVERY tick)
        self._pending_evict = None
        # slots whose chunk prefilled in the most recent tick (telemetry;
        # cache_len deltas can't tell — a trim can net it to zero)
        self.last_ticked: tuple = ()

        # prompt layouts are identical across languages except for the
        # system text; patch offsets depend only on (first, m)
        # fixed prompt width: the longest first-chunk prompt across
        # languages AND allowed multipliers, rounded up — one compiled
        # step shape for the pool
        smax = max(
            len(b.chunk_prompt(mi, first=True).ids)
            for b in builders.values()
            for mi in set(self.multipliers + (multiplier,))
        )
        self._S = int(np.ceil(smax / 16) * 16)
        self._step_fn = self._build_step()
        self._evict_fn = jax.jit(self._evict_impl, donate_argnums=(0,))
        # pre-compile eviction (identity on the fresh all-zero state) so the
        # first mid-stream eviction doesn't stall a tick on a jit compile
        self.dec_state = self._evict_fn(
            self.dec_state,
            jnp.zeros((pool_size,), jnp.int32),
            jnp.zeros((pool_size,), jnp.int32),
        )

    @property
    def spec_fallback_active(self) -> bool:
        """True once the acceptance guard swapped the pool to the
        plain-cost d=L step (bench/telemetry surface)."""
        return self._spec_fallback

    # -- slot management -----------------------------------------------------
    def open_stream(self, client_id: str, lang_pair=("English", "German"),
                    multiplier: Optional[int] = None):
        m = multiplier or self.m
        if m not in self.multipliers:
            raise ValueError(
                f"multiplier {m} not in the engine's allowed set "
                f"{self.multipliers} (pass multipliers=... at construction)"
            )
        for i, s in enumerate(self.slots):
            if not s.active:
                self.slots[i] = StreamSlot(
                    active=True,
                    client_id=client_id,
                    lang_pair=lang_pair,
                    m=m,
                )
                self._reset_slot_state(i)
                return i
        raise RuntimeError("no free slots")

    def update_multiplier(self, slot: int, m: int):
        """Switch a live slot's latency multiplier mid-stream (the pooled
        equivalent of agents/infinisst.py:152-157): takes effect from the
        slot's next chunk — cadence, patch count, and generation cap are
        per-row traced inputs, so no recompilation."""
        if m not in self.multipliers:
            raise ValueError((m, self.multipliers))
        self.slots[slot].m = m

    def close_stream(self, slot: int):
        self.slots[slot] = StreamSlot()
        self._reset_slot_state(slot)

    def _reset_slot_state(self, i: int):
        if self._pending_evict is not None:
            # a trim scheduled for this row is stale once the row is
            # zeroed; keep=0/sys=0 makes the deferred gather the reset's
            # identity (valid_len stays 0)
            pk, ps = self._pending_evict
            pk[i] = 0
            ps[i] = 0
        self.windows = self.windows.at[i].set(0.0)
        self.valid_len_host[i] = 0
        z = lambda a: a.at[:, i].set(0)  # noqa: E731
        self.enc_state = self.enc_state._replace(
            k=z(self.enc_state.k),
            v=z(self.enc_state.v),
            n_frames=self.enc_state.n_frames.at[i].set(0),
        )
        self.dec_state = self.dec_state._replace(
            k=z(self.dec_state.k),
            v=z(self.dec_state.v),
            valid_len=self.dec_state.valid_len.at[i].set(0),
        )

    def push_audio(self, slot: int, samples: np.ndarray, finished=False):
        s = self.slots[slot]
        s.pending = np.concatenate([s.pending, samples.astype(np.float32)])
        s.finished_input = s.finished_input or finished

    # -- batched step ---------------------------------------------------------
    def _build_step(self, fallback: bool = False):
        """``fallback=True`` builds the acceptance guard's plain-cost
        variant.  GREEDY pools drop to the TRUE plain batched-greedy pool
        (token-identical — speculation is exact; a d=L self-draft was
        measured first and rejected: batched-verify float accumulation
        forks near-tie argmaxes, leaving its cost ~1.5x plain on the
        agent, docs/hw_rows_r4.jsonl ra0.75 row).  SAMPLING pools have no
        plain batched variant, so they keep the d=L self-draft (draft
        steps ARE plain decode steps; tie forks only cost extra verify
        rounds, bounded well below the raw bad-draft overhead)."""
        cfg = self.cfg
        stream = self.stream
        chunk_frames = self.chunk_frames
        max_new = self.max_new
        eos = cfg.tokens.eos
        beam_n = self.beam
        greedy_fallback = fallback and not self.do_sample
        spec_d = (
            cfg.llama.num_layers if fallback else self.spec_draft_layers
        )

        window_samples = self.window_samples

        def step(params, enc, dec, windows, chunks_i16, ids, valid_mask,
                 patch_starts, row_active, hist, hist_len, row_frames,
                 row_patches, row_max_new, ev_keep, ev_sys, rng=None):
            # apply the PREVIOUS tick's deferred per-slot cache trim as
            # traced operands (identity rows: keep = current valid_len,
            # sys = 0) — rides this step's dispatch instead of costing a
            # standalone round-trip per eviction-active tick
            dec = llama_mod.evict_cache(dec, ev_keep, ev_sys)
            # roll each device window by ITS OWN chunk size: row i's new
            # samples (row_frames[i]*320, left-aligned in chunks_i16[i])
            # slide in so real audio stays right-aligned; a row with
            # row_frames=0 (sitting this tick out, or at a slower cadence)
            # keeps its window byte-identical.
            new = chunks_i16.astype(jnp.float32) / 32768.0
            full = jnp.concatenate([windows, new], axis=1)
            shift = (row_frames * SAMPLES_PER_FRAME)[:, None]
            idx = shift + jnp.arange(window_samples)[None, :]
            windows = jnp.take_along_axis(full, idx, axis=1)
            # encode all rows (padded/inactive tails are masked per row)
            speech, enc2 = speech_llm.encode_chunk(
                params, cfg, enc, windows, chunk_frames,
                stream.max_cache_frames, row_frames=row_frames,
            )
            emb = llama_mod.embed(params["llama"], ids)
            # splice per-row patch offsets and per-row patch COUNTS
            # (12 * m_slot real speech tokens, left-aligned in speech)
            B, S, D = emb.shape
            P = speech.shape[1]
            pos = jnp.arange(S)[None, :]
            in_patch = (pos >= patch_starts[:, None]) & (
                pos < patch_starts[:, None] + row_patches[:, None]
            )
            rank = jnp.clip(pos - patch_starts[:, None], 0, P - 1)
            sp = jnp.take_along_axis(speech, rank[:, :, None], axis=1)
            emb = jnp.where(in_patch[:, :, None], sp.astype(emb.dtype), emb)

            logits, dec2 = llama_mod.decode_step(
                params["llama"], cfg.llama, dec, emb, valid_mask=valid_mask
            )
            prompt_lens = valid_mask.sum(-1)
            last = jnp.take_along_axis(
                logits, (prompt_lens - 1)[:, None, None], axis=1
            )[:, 0]  # (B, V)

            if self.speculative and self.do_sample:
                # pooled speculative SAMPLING: one draft stream + one
                # verify stream per round shared across all slots; each
                # row's emitted law equals per-row ancestral sampling
                # from the processed target distribution
                from infinisst_tpu.decode.speculative import (
                    SpecSampleSpec,
                    batched_speculative_sample,
                )

                sp = SpecSampleSpec(
                    max_new_tokens=max_new,
                    eos_id=eos,
                    pad_id=cfg.tokens.pad,
                    draft_layers=spec_d,
                    draft_k=self.spec_k,
                    temperature=self.temperature,
                    top_k=self.top_k,
                    top_p=self.top_p,
                    epsilon_cutoff=self.epsilon_cutoff,
                    no_repeat_ngram_size=stream.no_repeat_ngram_size,
                    repetition_penalty=stream.repetition_penalty,
                )
                toks, n_tok, _hit, dec3, rounds, drafted, accepted = (
                    batched_speculative_sample(
                        params["llama"], cfg.llama, dec2, last, ids,
                        prompt_lens.astype(jnp.int32), hist, hist_len,
                        sp, rng, row_active, row_max_new=row_max_new,
                        encoder_ngram_size=stream.no_repeat_ngram_size,
                        suppress_mask=self._suppress,
                        draft_head=(
                            None if fallback
                            else params.get("spec_draft_head")
                        ),
                        exit_adapter=(
                            None if fallback
                            else params.get("spec_adapter")
                        ),
                    )
                )
                stats = jnp.stack(
                    [rounds, drafted.sum(), accepted.sum(), n_tok.sum()]
                )
                return enc2, dec3, windows, toks, n_tok, stats

            if self.speculative and not greedy_fallback:
                # pooled layer-skip speculation: one draft stream + one
                # verify stream per round SHARED across all slots and all
                # k+1 verified positions; emitted tokens are exactly the
                # batched-greedy output (decode/speculative.py)
                from infinisst_tpu.decode.speculative import (
                    SpecSpec,
                    batched_speculative_greedy,
                )

                sp = SpecSpec(
                    max_new_tokens=max_new,
                    eos_id=eos,
                    pad_id=cfg.tokens.pad,
                    draft_layers=spec_d,
                    draft_k=self.spec_k,
                    no_repeat_ngram_size=stream.no_repeat_ngram_size,
                    repetition_penalty=stream.repetition_penalty,
                    accept_all=self.spec_accept_all,
                )
                toks, n_tok, _hit, dec3, rounds, drafted, accepted = (
                    batched_speculative_greedy(
                        params["llama"], cfg.llama, dec2, last, ids,
                        prompt_lens.astype(jnp.int32), hist, hist_len, sp,
                        row_active, row_max_new=row_max_new,
                        encoder_ngram_size=stream.no_repeat_ngram_size,
                        suppress_mask=self._suppress,
                        draft_head=(
                            None if fallback
                            else params.get("spec_draft_head")
                        ),
                        exit_adapter=(
                            None if fallback
                            else params.get("spec_adapter")
                        ),
                    )
                )
                stats = jnp.stack(
                    [rounds, drafted.sum(), accepted.sum(), n_tok.sum()]
                )
                return enc2, dec3, windows, toks, n_tok, stats

            if beam_n > 1:
                # batched beam search over per-slot prefixes + in-jit
                # commit of the winning tokens (one batched replay)
                from infinisst_tpu.decode import beam as beam_mod

                spec = beam_mod.BeamSpec(
                    beam=beam_n,
                    max_new_tokens=max_new,
                    eos_id=eos,
                    pad_id=cfg.tokens.pad,
                    no_repeat_ngram_size=stream.no_repeat_ngram_size,
                    repetition_penalty=stream.repetition_penalty,
                )
                res = beam_mod.batched_beam_search(
                    params["llama"], cfg.llama, dec2, last, ids,
                    prompt_lens.astype(jnp.int32), hist, hist_len, spec,
                    encoder_ngram_size=stream.no_repeat_ngram_size,
                    suppress_mask=self._suppress,
                    max_steps=jnp.where(row_active, row_max_new, 1).astype(
                        jnp.int32
                    ),
                    return_kv=True,
                )
                n_emit = jnp.where(
                    res.hit_eos, res.n_tokens,
                    jnp.maximum(res.n_tokens - 1, 0),
                ) * row_active.astype(jnp.int32)
                toks = jnp.where(
                    jnp.arange(max_new)[None] < n_emit[:, None],
                    res.tokens, cfg.tokens.pad,
                )
                # commit by copying the winner's K/V (computed inside the
                # beam loop) into the cache — no replay forward, which was
                # a full extra weight stream per tick.  Slots beyond
                # n_emit land past valid_len (invisible; overwritten by
                # the next append).
                kv_k = jnp.moveaxis(res.kv_k, 0, 1)  # (L, B, G, KV, Dh)
                kv_v = jnp.moveaxis(res.kv_v, 0, 1)

                def append(buf, new):
                    def per_row(buf_b, new_b, start):
                        return jax.lax.dynamic_update_slice(
                            buf_b, new_b.astype(buf_b.dtype),
                            (0, start, 0, 0),
                        )

                    return jax.vmap(per_row, in_axes=(1, 1, 0), out_axes=1)(
                        buf, new, dec2.valid_len
                    )

                dec3 = dec2._replace(
                    k=append(dec2.k, kv_k),
                    v=append(dec2.v, kv_v),
                    valid_len=dec2.valid_len + n_emit,
                )
                return enc2, dec3, windows, toks, n_emit

            # batched greedy decode with per-row eos stop + ngram guards
            Tbuf = ids.shape[1] + max_new

            def body(carry, _):
                dec_c, cur_logits, toks, n_tok, donef, seqbuf, seqlen = carry
                scores = jax.nn.log_softmax(
                    cur_logits.astype(jnp.float32), -1
                )
                scores = lp.repetition_penalty(
                    scores, seqbuf,
                    jnp.arange(Tbuf)[None] < seqlen[:, None],
                    stream.repetition_penalty,
                )
                scores = lp.no_repeat_ngram(
                    scores, seqbuf, seqlen, stream.no_repeat_ngram_size
                )
                scores = lp.encoder_no_repeat_ngram(
                    scores, hist, hist_len, seqbuf, seqlen,
                    stream.no_repeat_ngram_size,
                )
                if self._suppress is not None:
                    scores = lp.suppress_tokens(scores, self._suppress)
                nxt = jnp.argmax(scores, -1).astype(jnp.int32)
                is_eos = nxt == eos
                emit = (
                    (~donef) & (~is_eos) & row_active
                    & (n_tok < row_max_new)  # per-row generation cap (10*m)
                )
                toks = jnp.where(
                    emit[:, None],
                    toks.at[jnp.arange(toks.shape[0]), n_tok].set(nxt),
                    toks,
                )
                seqbuf = jnp.where(
                    emit[:, None],
                    jax.vmap(lambda b, l, t: b.at[l].set(t))(seqbuf, seqlen, nxt),
                    seqbuf,
                )
                seqlen = seqlen + emit
                n_tok = n_tok + emit
                donef = donef | is_eos | (~row_active)
                x = llama_mod.embed(params["llama"], nxt[:, None])
                lg, dec_c = llama_mod.decode_step(
                    params["llama"], cfg.llama, dec_c, x,
                    valid_mask=emit[:, None].astype(jnp.int32),
                )
                return (dec_c, lg[:, 0], toks, n_tok, donef, seqbuf, seqlen), None

            B = ids.shape[0]
            toks0 = jnp.full((B, max_new), cfg.tokens.pad, jnp.int32)
            seqbuf0 = jnp.concatenate(
                [ids, jnp.full((B, max_new), cfg.tokens.pad, ids.dtype)], 1
            )
            init = (
                dec2, last, toks0, jnp.zeros((B,), jnp.int32),
                jnp.zeros((B,), bool), seqbuf0, prompt_lens.astype(jnp.int32),
            )
            (dec3, _, toks, n_tok, _, _, _), _ = jax.lax.scan(
                body, init, None, length=max_new
            )
            return enc2, dec3, windows, toks, n_tok

        return jax.jit(step, donate_argnums=(1, 2, 3))

    def _evict_impl(self, dec, keep_len, sys_len):
        return llama_mod.evict_cache(dec, keep_len, sys_len)

    def _start_fallback_warm(self):
        """AOT-compile the guard's plain-cost step in a daemon thread,
        started at the FIRST below-break-even tick — by the time the
        guard trips (``spec_guard_patience`` ticks later) the swap costs
        an executable lookup, not a synchronous compile that would stall
        every stream in the pool (a fresh 8B pool graph takes minutes on
        a cold compile cache).  Lowers from the captured tick
        ShapeDtypeStructs only (live buffers are donated by the running
        step and must not be touched); best-effort — on failure the trip
        compiles synchronously as before."""
        if (self._fallback_warm is not None
                or self._step_fn_fallback is not None
                or self._step_avals is None):
            return
        from infinisst_tpu.core import bgcompile

        avals = self._step_avals

        def warm():
            try:
                fn = self._build_step(fallback=True)
                self._step_fn_fallback = fn.lower(*avals).compile()
            except Exception as e:  # pragma: no cover — warm is best-effort
                import sys as _sys

                print(
                    f"[spec-guard] background pool-fallback warm failed "
                    f"({e!r}); a trip will compile synchronously",
                    file=_sys.stderr, flush=True,
                )

        self._fallback_warm = bgcompile.spawn(warm, "pool-fallback-warm")

    def tick(self) -> Dict[int, str]:
        """Process one chunk for every slot with enough pending audio.
        Returns {slot: text} for slots that produced output."""
        ready = []
        for i, s in enumerate(self.slots):
            if not s.active or s.done:
                continue
            cs = self.stream.chunk_samples(s.m)  # per-slot cadence
            if len(s.pending) >= cs or (
                s.finished_input and len(s.pending) > 0
            ):
                ready.append(i)
        if not ready:
            self.last_ticked = ()
            return {}

        B = self.pool
        chunks = np.zeros((B, self.chunk_samples), np.int16)
        patch_starts = np.zeros((B,), np.int32)
        row_active = np.zeros((B,), bool)
        row_frames = np.zeros((B,), np.int32)
        row_patches = np.zeros((B,), np.int32)
        row_max_new = np.ones((B,), np.int32)
        hist = np.full(
            (B, self.stream.no_repeat_ngram_lookback),
            self.cfg.tokens.pad, np.int32,
        )
        hist_len = np.zeros((B,), np.int32)

        prompts = []
        for i in ready:
            s = self.slots[i]
            cs = self.stream.chunk_samples(s.m)
            seg = s.pending[:cs]
            if len(seg) < cs:
                seg = np.concatenate(
                    [seg, np.zeros(cs - len(seg), np.float32)]
                )
            s.pending = s.pending[cs:]
            # real samples LEFT-aligned in the padded row; the step's
            # per-row window shift right-aligns them into the conv window
            chunks[i, :cs] = np.clip(
                seg * 32768.0, -32768, 32767
            ).astype(np.int16)
            row_frames[i] = self.stream.chunk_frames(s.m)
            row_patches[i] = self.stream.chunk_speech_tokens(s.m)
            # clamp to the engine-wide cap: the spec decoder's row_max_new
            # contract is <= G (= self.max_new), and an engine constructed
            # with max_new_tokens below the stream cap must bind every path
            # (beam/greedy loops are G-bounded anyway; the spec path's
            # staging arithmetic relies on the contract)
            row_max_new[i] = min(self.stream.max_new_tokens(s.m),
                                 self.max_new)
            builder = self.builders[s.lang_pair]
            pr = builder.chunk_prompt(s.m, first=s.first_chunk)
            if s.first_chunk:
                s.system_prompt_size = builder.system_prompt_size(s.m)
            prompts.append((i, pr))
            row_active[i] = True
            tail = s.target_ids[-self.stream.no_repeat_ngram_lookback :]
            hist[i, : len(tail)] = tail
            hist_len[i] = len(tail)

        S = self._S
        ids = np.full((B, S), self.cfg.tokens.pad, np.int32)
        valid = np.zeros((B, S), np.int32)
        for i, pr in prompts:
            ids[i, : len(pr.ids)] = pr.ids
            valid[i, : len(pr.ids)] = 1
            patch_starts[i] = pr.patch_start

        extra = ()
        if self.do_sample:
            # fresh per-tick key, reproducible per (seed, tick index)
            extra = (jax.random.fold_in(
                self._sample_key, self._tick_counter
            ),)
        self._tick_counter += 1
        if self._spec_fallback and self._step_fn_fallback is None:
            # prefer the background-warmed executable; if its compile is
            # still in flight, wait for it (never slower than starting a
            # synchronous compile here)
            if self._fallback_warm is not None:
                self._fallback_warm.join()
            if self._step_fn_fallback is None:
                self._step_fn_fallback = self._build_step(fallback=True)
        step_fn = (
            self._step_fn_fallback if self._spec_fallback else self._step_fn
        )
        if self._pending_evict is not None:
            ev_keep, ev_sys = self._pending_evict
            self._pending_evict = None
        else:
            # identity: keep = current device validity, nothing pinned
            ev_keep = self.valid_len_host.copy()
            ev_sys = np.zeros_like(ev_keep)
        self.last_ticked = tuple(i for i, _ in prompts)
        call_args = (
            self.params, self.enc_state, self.dec_state, self.windows,
            jnp.asarray(chunks), jnp.asarray(ids), jnp.asarray(valid),
            jnp.asarray(patch_starts), jnp.asarray(row_active),
            jnp.asarray(hist), jnp.asarray(hist_len),
            jnp.asarray(row_frames), jnp.asarray(row_patches),
            jnp.asarray(row_max_new),
            jnp.asarray(ev_keep, jnp.int32), jnp.asarray(ev_sys, jnp.int32),
            *extra,
        )
        if self._spec_breakeven is not None and self._step_avals is None:
            # tick shapes are constant: capture them once so the guard's
            # background warm can AOT-lower without touching live
            # (donated) buffers
            self._step_avals = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    jnp.shape(x), jnp.result_type(x)
                ),
                call_args,
            )
        out = step_fn(*call_args)
        greedy_fb = self._spec_fallback and not self.do_sample
        if self.speculative and not greedy_fb:
            enc2, dec2, self.windows, toks, n_tok, stats = out
            toks, n_tok, stats = jax.device_get((toks, n_tok, stats))
            if self._spec_fallback:
                # the sampling d=L fallback's machinery stats describe
                # the self-draft, not the real draft — only emitted counts
                self.spec_stats["emitted"] += int(stats[3])
            else:
                for key_, v in zip(
                    ("rounds", "drafted", "accepted", "emitted"), stats
                ):
                    self.spec_stats[key_] += int(v)
                r, ac = int(stats[0]), int(stats[2])
                if self._spec_breakeven is not None and r > 0:
                    tpr = (ac + r) / r
                    dc = self.spec_guard_decay
                    self._spec_tpr_ema = (
                        tpr if self._spec_tpr_ema is None
                        else dc * self._spec_tpr_ema + (1.0 - dc) * tpr
                    )
                    if (
                        self._spec_tpr_ema
                        < self._spec_breakeven * self.spec_guard_margin
                    ):
                        self._spec_below += 1
                        if self.spec_warm_fallback:
                            # start compiling the plain-cost step now; the
                            # patience window is the compile headroom
                            self._start_fallback_warm()
                    else:
                        self._spec_below = 0
                    if self._spec_below >= self.spec_guard_patience:
                        self._spec_fallback = True
                        import sys as _sys

                        print(
                            f"[spec-guard] pool tokens/round EMA "
                            f"{self._spec_tpr_ema:.2f} < break-even "
                            f"{self._spec_breakeven:.2f} for "
                            f"{self._spec_below} ticks: swapping the pool "
                            "to the plain-cost step",
                            file=_sys.stderr, flush=True,
                        )
        else:
            enc2, dec2, self.windows, toks, n_tok = out
            toks, n_tok = jax.device_get((toks, n_tok))
        self.enc_state, self.dec_state = enc2, dec2

        out: Dict[int, str] = {}
        for i, pr in prompts:
            s = self.slots[i]
            n = int(n_tok[i])
            new_ids = toks[i, :n].tolist()
            s.target_ids.extend(new_ids)
            s.cache_len += len(pr.ids) + n
            self.valid_len_host[i] += len(pr.ids) + n
            s.cache_checkpoints.append(s.cache_len)
            s.first_chunk = False
            if s.finished_input and len(s.pending) == 0:
                s.done = True
            builder = self.builders[s.lang_pair]
            text = builder.tokenizer.decode(
                new_ids, skip_special_tokens=True
            ).strip().replace("�", "")
            if text or s.done:
                out[i] = text
        self._evict_overflowing()
        return out

    def _evict_overflowing(self):
        """Trim every overflowing slot's cache with ONE batched gather.

        In steady state all slots overflow every tick (cache cap
        max_llm_cache_tokens, ~30-50 new tokens/chunk); dispatching one
        whole-pool gather per slot cost pool x ~2.7 GB of HBM traffic per
        tick at 8B/pool-8 — batching the keep lengths makes it one gather
        regardless of how many slots trim (ref semantics per slot:
        agents/infinisst.py:340-361)."""
        keep_len = self.valid_len_host.copy()
        sys_lens = np.zeros_like(keep_len)
        any_evict = False
        for i, s in enumerate(self.slots):
            if not s.active or s.cache_len <= self.stream.max_llm_cache_tokens:
                continue
            new_len = s.cache_len
            for j, ckpt in enumerate(s.cache_checkpoints):
                new_len = s.cache_len - ckpt
                if new_len <= self.stream.max_llm_cache_tokens:
                    s.cache_checkpoints = s.cache_checkpoints[j + 1 :]
                    trimmed = ckpt
                    if self.stream.always_cache_system_prompt:
                        trimmed -= s.system_prompt_size
                    s.cache_checkpoints = [
                        c - trimmed for c in s.cache_checkpoints
                    ]
                    break
            sys_len = (
                s.system_prompt_size
                if self.stream.always_cache_system_prompt
                else 0
            )
            keep_len[i] = new_len
            sys_lens[i] = sys_len
            s.cache_len = new_len + sys_len
            self.valid_len_host[i] = s.cache_len
            any_evict = True
            self.evictions += 1
        if not any_evict:
            return
        # evict_cache keeps [0:sys] + tail(keep); untouched rows pass
        # sys=0 and keep=valid_len (identity).  DEFERRED: the trim is
        # applied inside the NEXT tick's compiled step (the host mirrors
        # above already show the logical post-trim lengths) — a
        # standalone dispatch here costs the link's fixed RTT on every
        # eviction-active tick, which in steady state is every tick
        # (measured: pool-8 8B 120-tick soak 155 -> ~190 tok/s/chip).
        self._pending_evict = (
            keep_len.astype(np.int32),
            sys_lens.astype(np.int32),
        )

    def flush_pending_evict(self):
        """Apply a deferred cache trim NOW (one standalone dispatch) so
        external readers of ``dec_state`` observe the post-trim cache;
        no-op when nothing is pending.  The tick path never needs this —
        it exists for tests/inspection, mirroring the agent's API."""
        if self._pending_evict is None:
            return
        ev_keep, ev_sys = self._pending_evict
        self._pending_evict = None
        self.dec_state = self._evict_fn(
            self.dec_state,
            jnp.asarray(ev_keep, jnp.int32),
            jnp.asarray(ev_sys, jnp.int32),
        )
