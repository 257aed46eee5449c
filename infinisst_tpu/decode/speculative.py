"""Self-speculative greedy decoding: layer-skip draft + k-token verify.

Single-stream decode is bound by streaming the decoder weights from HBM
once per generated token (ARCHITECTURE.md §Performance: the beam step sits
at ~85% of the weight-stream floor).  The only way below that floor is to
amortise one weight stream over SEVERAL tokens: draft k candidate tokens
cheaply, then verify them all in ONE full forward (k+1 positions share the
stream), accepting the longest prefix the full model agrees with.  Exact
greedy semantics: emitted tokens are identical to sequential
processed-greedy decoding, independent of draft quality — the draft only
controls speed.

The draft here is the target model's own FIRST ``draft_layers`` layers +
final norm + lm_head (layer-skip / self-speculative decoding, e.g.
Elhoushi et al. 2024 "LayerSkip"; PAPERS.md): it needs no second model, no
extra HBM-resident weights, and its KV cache for those layers is a prefix
slice of the main cache (the first d layers of the target compute exactly
the same K/V).  Draft quality with UNTRAINED early-exit heads varies by
checkpoint; the acceptance rate is surfaced in SpecResult so benchmarks
and agents can report it honestly.

Used by the InfiniSST agent's --speculative greedy mode (off by default;
the reference has no speculative path — this is a TPU-native extension,
ref decode loop being replaced: transformers greedy_search semantics as in
agents/infinisst.py:320-368).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from infinisst_tpu.core.config import LlamaConfig
from infinisst_tpu.decode import logits as lp
from infinisst_tpu.models import llama as llama_mod
from infinisst_tpu.streaming.state import DecoderState


class SpecSpec(NamedTuple):
    max_new_tokens: int
    eos_id: int
    pad_id: int
    draft_layers: int  # d: draft = first d target layers + lm_head
    draft_k: int  # tokens drafted (and verified) per round
    no_repeat_ngram_size: int = 0
    repetition_penalty: float = 1.0
    accept_all: bool = False  # bench-only: force-accept every draft token
    # (measures the k-tokens-per-stream machinery ceiling; output is then
    # the DRAFT's sequence, not greedy-exact — never use in production)


class SpecResult(NamedTuple):
    tokens: jnp.ndarray  # (G,) emitted tokens (pad-filled)
    n_tokens: jnp.ndarray  # scalar int32 (EOS excluded)
    hit_eos: jnp.ndarray  # scalar bool
    rounds: jnp.ndarray  # scalar int32: verify forwards (weight streams)
    drafted: jnp.ndarray  # scalar int32: draft tokens proposed
    accepted: jnp.ndarray  # scalar int32: draft tokens accepted
    dec: DecoderState  # cache WITH the emitted tokens committed


def speculative_greedy(
    params,
    cfg: LlamaConfig,
    prefix: DecoderState,  # batch 1 — cache after chunk prefill
    first_logits: jnp.ndarray,  # (V,) logits at the last prefill position
    prompt_buf: jnp.ndarray,  # (Tp,) this call's prompt ids (static len)
    prompt_len: jnp.ndarray,  # scalar int32 <= Tp
    history: jnp.ndarray,  # (Lh,) cross-chunk target ids
    history_len: jnp.ndarray,  # scalar int32
    spec: SpecSpec,
    encoder_ngram_size: int = 0,
    suppress_mask: Optional[jnp.ndarray] = None,
) -> SpecResult:
    """Greedy decode with layer-skip speculation.  Static shapes.

    Per round: 1 fused draft scan (k cheap steps over the first d layers)
    + 1 full verify forward over k+1 tokens.  Every round emits at least
    one token (the round's first token is the full model's own argmax from
    the previous round's logits, so it is always correct), plus however
    many draft tokens the full model confirms, plus nothing on EOS.
    Accepted tokens' K/V land in the cache during verification — callers
    get the commit for free (no replay), unlike the beam path's deferred
    commit."""
    G = spec.max_new_tokens
    k = spec.draft_k
    d = spec.draft_layers
    V = first_logits.shape[-1]
    Tp = prompt_buf.shape[0]
    # +k slack: near the G cap a round still stages k+1 candidates in the
    # buffer before the cap truncates the commit — without the slack the
    # staging write would clamp and corrupt earlier context
    Tbuf = Tp + G + k

    cfg_d = dataclasses.replace(cfg, num_layers=d)
    params_d = {
        "embed": params["embed"],
        "layers": jax.tree.map(lambda a: a[:d], params["layers"]),
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
    }

    def process_argmax(logits_flat, seq_buf, seq_len):
        """log_softmax -> repetition/ngram/suppress -> argmax, exactly the
        beam/greedy processor order (decode/beam.py:149-170)."""
        scores = jax.nn.log_softmax(
            logits_flat.astype(jnp.float32), axis=-1
        )[None]
        scores = lp.repetition_penalty(
            scores,
            seq_buf[None],
            (jnp.arange(Tbuf) < seq_len)[None],
            spec.repetition_penalty,
        )
        scores = lp.no_repeat_ngram(
            scores, seq_buf[None], seq_len[None], spec.no_repeat_ngram_size
        )
        if encoder_ngram_size > 0:
            scores = lp.encoder_no_repeat_ngram(
                scores, history[None], history_len[None],
                seq_buf[None], seq_len[None], encoder_ngram_size,
            )
        if suppress_mask is not None:
            scores = lp.suppress_tokens(scores, suppress_mask)
        return jnp.argmax(scores[0], axis=-1).astype(jnp.int32)

    seq_buf0 = jnp.concatenate(
        [prompt_buf.astype(jnp.int32),
         jnp.full((G + k,), spec.pad_id, jnp.int32)]
    )

    def round_fn(state):
        (dec, last_logits, seq_buf, seq_len, tokens, n_out, done, hit_eos,
         rounds, drafted, accepted) = state

        # the round's anchor token: the full model's own next choice
        t1 = process_argmax(last_logits, seq_buf, seq_len)

        # ---- draft phase: k cheap steps over the first d layers.  The
        # draft's cache is a slice of the main cache (identical layers)
        # plus its own in-round appends.
        sbuf1 = seq_buf.at[seq_len].set(t1)
        ddec = DecoderState(
            k=dec.k[:d], v=dec.v[:d], valid_len=dec.valid_len
        )

        def draft_step(carry, _):
            ddec, tok, sbuf, slen = carry
            lg, ddec = llama_mod.decode_step(
                params_d, cfg_d, ddec,
                llama_mod.embed(params_d, tok[None, None]),
            )
            nxt = process_argmax(
                lg[0, -1, :V], sbuf, slen + 1
            )
            sbuf = sbuf.at[slen + 1].set(nxt)
            return (ddec, nxt, sbuf, slen + 1), nxt

        (_, _, _, _), drafts = jax.lax.scan(
            draft_step, (ddec, t1, sbuf1, seq_len), None, length=k
        )

        # ---- verify: ONE full forward over [t1, d2..d_{k+1}]
        toks_v = jnp.concatenate([t1[None], drafts])  # (k+1,)
        sbuf_v = jax.lax.dynamic_update_slice(seq_buf, toks_v, (seq_len,))
        lg_v, dec_v = llama_mod.decode_step(
            params, cfg, dec, llama_mod.embed(params, toks_v[None])
        )
        true_next = jax.vmap(
            lambda lgj, slj: process_argmax(lgj, sbuf_v, slj)
        )(lg_v[0, :, :V], seq_len + 1 + jnp.arange(k + 1))

        if spec.accept_all:
            a = jnp.asarray(k, jnp.int32)
        else:
            match = true_next[:-1] == toks_v[1:]  # (k,)
            a = jnp.where(
                jnp.all(match), k, jnp.argmin(match)
            ).astype(jnp.int32)

        # ---- emission: toks_v[0..a], truncated at EOS and the G cap
        idx = jnp.arange(k + 1)
        eos_in = (toks_v == spec.eos_id) & (idx <= a)
        first_eos = jnp.where(
            jnp.any(eos_in), jnp.argmax(eos_in), k + 1
        ).astype(jnp.int32)
        room = (G - n_out).astype(jnp.int32)
        n_r = jnp.minimum(jnp.minimum(a + 1, first_eos), room)
        hit = jnp.any(eos_in) & (first_eos <= jnp.minimum(a, room))

        # masked scatter (dynamic_update_slice would CLAMP its start near
        # the end of the buffer and overwrite earlier emissions)
        relt = jnp.arange(G) - n_out
        tokens = jnp.where(
            (relt >= 0) & (relt < n_r),
            toks_v[jnp.clip(relt, 0, k)], tokens,
        )
        rels = jnp.arange(Tbuf) - seq_len
        seq_buf = jnp.where(
            (rels >= 0) & (rels < n_r),
            toks_v[jnp.clip(rels, 0, k)], seq_buf,
        )
        seq_buf = jnp.where(
            jnp.arange(Tbuf) < seq_len + n_r, seq_buf, spec.pad_id
        )

        # commit exactly the emitted tokens' K/V (they were just computed
        # in the verify forward); the rest stays past valid_len
        dec = dec_v._replace(valid_len=dec.valid_len + n_r)

        # carried dtype must stay f32 across while_loop iterations
        next_logits = lg_v[0, jnp.maximum(n_r - 1, 0), :V].astype(jnp.float32)
        n_out = n_out + n_r
        done = hit | (n_out >= G)
        return (
            dec, next_logits, seq_buf, seq_len + n_r, tokens, n_out, done,
            hit_eos | hit, rounds + 1, drafted + k,
            accepted + jnp.maximum(n_r - 1, 0),
        )

    z = jnp.zeros((), jnp.int32)
    state0 = (
        prefix, first_logits.astype(jnp.float32), seq_buf0,
        prompt_len.astype(jnp.int32),
        jnp.full((G,), spec.pad_id, jnp.int32), z,
        jnp.asarray(False), jnp.asarray(False), z, z, z,
    )
    state = jax.lax.while_loop(
        lambda s: (~s[6]) & (s[5] < G), round_fn, state0
    )
    (dec, _, _, _, tokens, n_out, _, hit_eos, rounds, drafted,
     accepted) = state
    return SpecResult(
        tokens=tokens, n_tokens=n_out, hit_eos=hit_eos, rounds=rounds,
        drafted=drafted, accepted=accepted, dec=dec,
    )


def batched_speculative_greedy(
    params,
    cfg: LlamaConfig,
    dec0: DecoderState,  # batch B — per-slot caches after chunk prefill
    first_logits: jnp.ndarray,  # (B, V) logits at each row's last position
    ids: jnp.ndarray,  # (B, Tp) per-row prompt ids (padded)
    prompt_lens: jnp.ndarray,  # (B,) int32
    history: jnp.ndarray,  # (B, Lh) per-row cross-chunk target ids
    history_len: jnp.ndarray,  # (B,) int32
    spec: SpecSpec,
    row_active: jnp.ndarray,  # (B,) bool — inactive rows emit nothing
    row_max_new: Optional[jnp.ndarray] = None,  # (B,) per-row caps <= G
    encoder_ngram_size: int = 0,
    suppress_mask: Optional[jnp.ndarray] = None,
):
    """Pooled layer-skip speculation: every slot drafts and verifies in
    lockstep, so the pool shares ONE draft stream and ONE verify stream
    per round across all slots AND all verified positions.  Emitted
    tokens per row are exactly the engine's sequential batched-greedy
    output (EOS not emitted, per-row cap); accepted tokens' K/V commit
    during verification.  Returns (tokens (B, G), n_tokens (B,), dec,
    rounds, drafted, accepted)."""
    G = spec.max_new_tokens
    k = spec.draft_k
    d = spec.draft_layers
    B, V = first_logits.shape
    Tp = ids.shape[1]
    Tbuf = Tp + G + k
    if row_max_new is None:
        row_max_new = jnp.full((B,), G, jnp.int32)

    cfg_d = dataclasses.replace(cfg, num_layers=d)
    params_d = {
        "embed": params["embed"],
        "layers": jax.tree.map(lambda a: a[:d], params["layers"]),
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
    }

    def process_argmax(logits, seq_buf, seq_len):
        """(B, V) batched processors, engine greedy order
        (serve/engine.py step body)."""
        scores = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        scores = lp.repetition_penalty(
            scores, seq_buf,
            jnp.arange(Tbuf)[None] < seq_len[:, None],
            spec.repetition_penalty,
        )
        scores = lp.no_repeat_ngram(
            scores, seq_buf, seq_len, spec.no_repeat_ngram_size
        )
        if encoder_ngram_size > 0:
            scores = lp.encoder_no_repeat_ngram(
                scores, history, history_len, seq_buf, seq_len,
                encoder_ngram_size,
            )
        if suppress_mask is not None:
            scores = lp.suppress_tokens(scores, suppress_mask)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    seq_buf0 = jnp.concatenate(
        [ids.astype(jnp.int32),
         jnp.full((B, G + k), spec.pad_id, jnp.int32)], axis=1,
    )
    act0 = row_active.astype(bool)

    def round_fn(state):
        (dec, last_logits, seq_buf, seq_len, tokens, n_out, done,
         rounds, drafted, accepted) = state

        t1 = process_argmax(last_logits, seq_buf, seq_len)  # (B,)

        sbuf1 = jax.vmap(lambda b, l, t: b.at[l].set(t))(seq_buf, seq_len, t1)
        ddec = DecoderState(k=dec.k[:d], v=dec.v[:d], valid_len=dec.valid_len)

        def draft_step(carry, _):
            ddec, tok, sbuf, slen = carry
            lg, ddec = llama_mod.decode_step(
                params_d, cfg_d, ddec,
                llama_mod.embed(params_d, tok[:, None]),
            )
            nxt = process_argmax(lg[:, -1, :V], sbuf, slen + 1)
            sbuf = jax.vmap(lambda b, l, t: b.at[l + 1].set(t))(
                sbuf, slen, nxt
            )
            return (ddec, nxt, sbuf, slen + 1), nxt

        (_, _, _, _), drafts = jax.lax.scan(
            draft_step, (ddec, t1, sbuf1, seq_len), None, length=k
        )  # drafts (k, B)

        toks_v = jnp.concatenate([t1[None], drafts]).T  # (B, k+1)
        sbuf_v = jax.vmap(
            lambda b, t, l: jax.lax.dynamic_update_slice(b, t, (l,))
        )(seq_buf, toks_v, seq_len)

        live = (~done) & act0
        vmask = jnp.broadcast_to(
            live[:, None], (B, k + 1)
        ).astype(jnp.int32)
        lg_v, dec_v = llama_mod.decode_step(
            params, cfg, dec,
            llama_mod.embed(params, toks_v), valid_mask=vmask,
        )  # (B, k+1, V)

        tn = []
        for j in range(k + 1):
            tn.append(
                process_argmax(lg_v[:, j, :V], sbuf_v, seq_len + j + 1)
            )
        true_next = jnp.stack(tn, axis=1)  # (B, k+1)

        if spec.accept_all:
            a = jnp.full((B,), k, jnp.int32)
        else:
            match = true_next[:, :-1] == toks_v[:, 1:]  # (B, k)
            a = jnp.where(
                jnp.all(match, axis=1), k, jnp.argmin(match, axis=1)
            ).astype(jnp.int32)

        idx = jnp.arange(k + 1)[None]
        eos_in = (toks_v == spec.eos_id) & (idx <= a[:, None])
        first_eos = jnp.where(
            jnp.any(eos_in, axis=1), jnp.argmax(eos_in, axis=1), k + 1
        ).astype(jnp.int32)
        room = (row_max_new - n_out).astype(jnp.int32)
        n_r = jnp.minimum(jnp.minimum(a + 1, first_eos), room)
        n_r = jnp.where(live, n_r, 0)
        hit = jnp.any(eos_in, axis=1) & (
            first_eos <= jnp.minimum(a, room)
        ) & live

        relt = jnp.arange(G)[None] - n_out[:, None]  # (B, G)
        put = jnp.take_along_axis(
            toks_v, jnp.clip(relt, 0, k), axis=1
        )
        tokens = jnp.where((relt >= 0) & (relt < n_r[:, None]), put, tokens)
        rels = jnp.arange(Tbuf)[None] - seq_len[:, None]
        puts = jnp.take_along_axis(toks_v, jnp.clip(rels, 0, k), axis=1)
        seq_buf = jnp.where(
            (rels >= 0) & (rels < n_r[:, None]), puts, seq_buf
        )

        dec = dec_v._replace(valid_len=dec.valid_len + n_r)
        next_logits = jnp.take_along_axis(
            lg_v[:, :, :V], jnp.maximum(n_r - 1, 0)[:, None, None], axis=1
        )[:, 0].astype(jnp.float32)
        next_logits = jnp.where(
            live[:, None], next_logits, last_logits
        )
        n_out = n_out + n_r
        done = done | hit | (n_out >= row_max_new)
        return (
            dec, next_logits, seq_buf, seq_len + n_r, tokens, n_out, done,
            rounds + 1, drafted + jnp.where(live, k, 0),
            accepted + jnp.maximum(n_r - 1, 0),
        )

    zb = jnp.zeros((B,), jnp.int32)
    state0 = (
        dec0, first_logits.astype(jnp.float32), seq_buf0,
        prompt_lens.astype(jnp.int32),
        jnp.full((B, G), spec.pad_id, jnp.int32), zb,
        ~act0,  # inactive rows start done
        jnp.zeros((), jnp.int32), zb, zb,
    )
    state = jax.lax.while_loop(
        lambda s: jnp.any(~s[6]), round_fn, state0
    )
    (dec, _, _, _, tokens, n_out, _, rounds, drafted, accepted) = state
    return tokens, n_out, dec, rounds, drafted, accepted
