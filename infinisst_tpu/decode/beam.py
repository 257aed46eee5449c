"""Beam search / greedy / sampling decode as a single jitted loop.

Replaces the reference's patched HF generate + BeamSearchScorer
(model/patches/patch_hf.py): the loop is a ``lax.while_loop`` with a static
step bound (max_new_tokens = 10*m, ref: agents/infinisst.py:125-128), beam
KV reordering is a gather over a small per-beam generation buffer (the chunk
prefix cache is shared across beams — see llama.beam_token_step), and the
"continue from the winning beam's KV" semantic (patch_hf.py:924-935) is
realised by replaying the winning tokens into the persistent cache
(speech_llm.commit_tokens) instead of snapshotting per-hypothesis caches.

HF semantics replicated:
- processors run on log-softmax scores in HF order (repetition penalty,
  no-repeat-ngram, encoder-no-repeat-ngram, suppress);
- beam selection takes top 2*beam candidates so EOS hypotheses do not
  consume live beam slots (BeamSearchScorer.process, patch_hf.py:43-157);
- finished hypotheses are scored sum_logprobs / length**length_penalty
  (BeamHypotheses.add);
- early termination when the worst finished hypothesis cannot be improved.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from infinisst_tpu.core.config import LlamaConfig
from infinisst_tpu.decode import logits as lp
from infinisst_tpu.models import llama as llama_mod
from infinisst_tpu.streaming.state import DecoderState

NEG_INF = -1e9


class BeamSpec(NamedTuple):
    beam: int
    max_new_tokens: int
    eos_id: int
    pad_id: int
    no_repeat_ngram_size: int = 0
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    vocab_size: int = 0


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # (max_new,) winning generated tokens (pad-filled)
    n_tokens: jnp.ndarray  # scalar int32: generated length (EOS excluded)
    score: jnp.ndarray  # scalar f32
    steps: jnp.ndarray  # scalar int32: loop steps executed
    hit_eos: jnp.ndarray  # scalar bool: winner ended with EOS
    attn_idx: jnp.ndarray  # (max_new,) per-token attn argmax (attn_probe)
    kv_k: Optional[jnp.ndarray] = None  # (L, G, KV, Dh) winner keys (return_kv)
    kv_v: Optional[jnp.ndarray] = None  # (L, G, KV, Dh) winner values


def select_candidates(step_scores, beam_scores):
    """Exact top-2B candidates over (B, V) processed log-probs.

    Unrolled argmax+mask instead of lax.top_k: for k=2B<=8 over ~0.5M
    entries the full sort dominated the per-step cost on TPU (profiler:
    ~0.6 ms/step).  Shared by beam_search and the speculative beam
    decoder (decode/spec_beam.py) so the selection semantics cannot
    drift.  Returns (total (B, V), top_vals (2B,), cand_beam, cand_tok).
    """
    B, V = step_scores.shape
    total = step_scores + beam_scores[:, None]
    flat = total.reshape(-1)
    vals, idxs = [], []
    for _ in range(2 * B):
        i = jnp.argmax(flat)
        vals.append(flat[i])
        idxs.append(i)
        flat = flat.at[i].set(NEG_INF)
    top_vals = jnp.stack(vals)
    top_idx = jnp.stack(idxs).astype(jnp.int32)
    return total, top_vals, top_idx // V, top_idx % V


def finalize_winner(spec, t, beam_scores, fin_scores):
    """HF finalize: compare the best live beam (length-normalised by
    generated length) against the best finished hypothesis.  Shared by
    beam_search and decode/spec_beam.py.  Returns
    (best_live, best_fin, use_fin, live_score)."""
    live_score = beam_scores / jnp.maximum(t, 1).astype(
        jnp.float32
    ) ** spec.length_penalty
    best_live = jnp.argmax(live_score)
    have_fin = jnp.sum(fin_scores > NEG_INF / 2) > 0
    best_fin = jnp.argmax(fin_scores)
    use_fin = have_fin & (fin_scores[best_fin] >= live_score[best_live])
    return best_live, best_fin, use_fin, live_score


def beam_search(
    params,
    cfg: LlamaConfig,
    prefix: DecoderState,  # batch 1 — cache after chunk prefill
    first_logits: jnp.ndarray,  # (V,) logits at the last prefill position
    prompt_buf: jnp.ndarray,  # (Tp,) this call's prompt ids (static len)
    prompt_len: jnp.ndarray,  # scalar int32 <= Tp
    history: jnp.ndarray,  # (Lh,) cross-chunk target ids (lookback window)
    history_len: jnp.ndarray,  # scalar int32
    spec: BeamSpec,
    encoder_ngram_size: int = 0,
    suppress_mask: Optional[jnp.ndarray] = None,  # (V,) bool
    max_steps: Optional[jnp.ndarray] = None,  # traced cap <= max_new_tokens
    attn_probe: Optional[tuple] = None,  # (layer, span_start, span_end)
    first_attn_idx: Optional[jnp.ndarray] = None,  # scalar: probe at prefill
    attn_stop_idx: Optional[jnp.ndarray] = None,  # scalar: early-stop zone
    skip_last_fwd: bool = True,
    return_kv: bool = False,
) -> BeamResult:
    """Run beam search for one chunk.  Static shapes throughout.

    ``max_steps`` caps generation length without recompiling (the AlignAtt
    agent's dynamic max_new_tokens, ref: agents/alignatt.py:109,128).
    ``attn_probe`` records, per generated token, the argmax attention index
    over [span_start, span_end) at the given layer (averaged over heads) —
    the AlignAtt policy signal (ref: agents/alignatt.py:150-167).  The
    winning beam's trace is returned in BeamResult.attn_idx.

    ``attn_stop_idx`` (requires ``attn_probe``) terminates the loop once
    EVERY live beam has produced at least one token whose probed attention
    index is >= attn_stop_idx — the AlignAtt stop zone.  The emission rule
    discards everything from the first in-zone token on, so the discarded
    tail is never generated (the reference generates to the length cap and
    truncates post-hoc, agents/alignatt.py:150-167; the in-jit probe makes
    the early exit free).  Caveat: the winning hypothesis is then selected
    among the shorter, early-stopped beams, which can differ from the
    reference's full-length selection — keep it off for exact parity.

    ``return_kv`` additionally returns the winner's generated-token K/V
    (unrotated, cache layout) in BeamResult.kv_k/kv_v: the beam loop
    already computed K/V for every generated token, so callers can COMMIT
    the winning tokens by copying these into the persistent cache instead
    of replaying them through the model (saves one full weight stream —
    the "continue from the winning beam's KV" semantic, patch_hf.py:
    924-935, realised without recompute).  Exactly the first n_emit slots
    are valid, where n_emit = n_tokens if hit_eos else n_tokens - 1: the
    EOS token and a cap-dropped final token are never forwarded, so their
    K/V (correctly) do not exist.  Finished-hypothesis K/V are snapshotted
    into a per-slot buffer when the hypothesis is added (~1.3 MB/slot at
    8B/G=10 — far below the reference's whole-cache DynamicCache
    snapshots)."""
    B = spec.beam
    G = spec.max_new_tokens
    V = first_logits.shape[-1]
    KV, Dh, L = cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    Tp = prompt_buf.shape[0]
    Tbuf = Tp + G  # per-beam sequence buffer (for ngram/repetition)

    # per-beam state
    seq_buf0 = jnp.tile(
        jnp.concatenate([prompt_buf, jnp.full((G,), spec.pad_id, prompt_buf.dtype)])[
            None
        ],
        (B, 1),
    )
    seq_len0 = jnp.full((B,), 0, jnp.int32) + prompt_len  # valid in seq_buf
    gen_tokens0 = jnp.full((B, G), spec.pad_id, jnp.int32)
    beam_scores0 = jnp.full((B,), NEG_INF, jnp.float32).at[0].set(0.0)

    gen_k0 = jnp.zeros((L, B, G, KV, Dh), prefix.k.dtype)
    gen_v0 = jnp.zeros_like(gen_k0)

    # finished-hypothesis buffer (B slots)
    fin_tokens0 = jnp.full((B, G), spec.pad_id, jnp.int32)
    fin_len0 = jnp.zeros((B,), jnp.int32)
    fin_scores0 = jnp.full((B,), NEG_INF, jnp.float32)
    # per-hypothesis K/V snapshots (zero-size L axis when return_kv is off,
    # so the single code path costs nothing when disabled)
    Lk = L if return_kv else 0
    fin_k0 = jnp.zeros((B, Lk, G, KV, Dh), prefix.k.dtype)
    fin_v0 = jnp.zeros_like(fin_k0)

    attn_hist0 = jnp.full((B, G), -1, jnp.int32)
    fin_attn0 = jnp.full((B, G), -1, jnp.int32)
    if max_steps is None:
        max_steps = jnp.asarray(G, jnp.int32)
    if first_attn_idx is None:
        first_attn_idx = jnp.asarray(-1, jnp.int32)

    def process_scores(scores, seq_buf, seq_len, hist, hist_len):
        scores = lp.repetition_penalty(
            scores,
            seq_buf,
            jnp.arange(Tbuf)[None, :] < seq_len[:, None],
            spec.repetition_penalty,
        )
        scores = lp.no_repeat_ngram(
            scores, seq_buf, seq_len, spec.no_repeat_ngram_size
        )
        if encoder_ngram_size > 0:
            scores = lp.encoder_no_repeat_ngram(
                scores,
                jnp.tile(hist[None], (B, 1)),
                jnp.tile(hist_len[None], (B,)),
                seq_buf,
                seq_len,
                encoder_ngram_size,
            )
        if suppress_mask is not None:
            scores = lp.suppress_tokens(scores, suppress_mask)
        return scores

    def select(step_scores, beam_scores):
        """Exact top-2B candidates (shared impl: select_candidates)."""
        _, top_vals, cand_beam, cand_tok = select_candidates(
            step_scores, beam_scores
        )
        return top_vals, cand_beam, cand_tok

    def step_fn(state):
        (
            t,
            done,
            logits_cur,
            attn_cur,
            beam_scores,
            seq_buf,
            seq_len,
            gen_tokens,
            attn_hist,
            gen_k,
            gen_v,
            fin_tokens,
            fin_len,
            fin_scores,
            fin_attn,
            fin_k,
            fin_v,
        ) = state

        scores = jax.nn.log_softmax(logits_cur.astype(jnp.float32), axis=-1)
        scores = process_scores(scores, seq_buf, seq_len, history, history_len)
        cand_vals, cand_beam, cand_tok = select(scores, beam_scores)

        is_eos = cand_tok == spec.eos_id
        # --- finished hypotheses: EOS candidates among the top-B ranks only
        # (BeamSearchScorer.process semantics: beam_idx < num_beams)
        rank = jnp.arange(2 * B)
        eos_ok = is_eos & (rank < B)
        # candidate hypothesis score: the reference normalises by GENERATED
        # length only (patch_hf.py beam_hypotheses add via process/finalize:
        # generated_len = cur_len - decoder_prompt_len = t+1 for an EOS
        # hypothesis at step t) — NOT by prompt+generated.  With real
        # ~60-800 token prompts the prompt term would make length_penalty
        # behave like ~0 and silently change which hypothesis wins.
        hyp_len = (t + 1).astype(jnp.float32)
        hyp_score = cand_vals / jnp.maximum(hyp_len, 1.0) ** spec.length_penalty

        def add_hyp(i, carry):
            ft, fl, fs, fa, fk, fv = carry
            worst = jnp.argmin(fs)
            better = hyp_score[i] > fs[worst]
            use = eos_ok[i] & better
            # hypothesis tokens: the source beam's generated tokens so far
            toks = gen_tokens[cand_beam[i]]
            ft = jnp.where(use, ft.at[worst].set(toks), ft)
            fl = jnp.where(use, fl.at[worst].set(t), fl)
            fs = jnp.where(use, fs.at[worst].set(hyp_score[i]), fs)
            fa = jnp.where(use, fa.at[worst].set(attn_hist[cand_beam[i]]), fa)
            # snapshot the source beam's gen K/V (slots 0..t-1 are valid —
            # the EOS itself was never forwarded); gen_k is pre-reorder
            # here, which is what cand_beam indexes
            fk = jnp.where(
                use, fk.at[worst].set(gen_k[:Lk, cand_beam[i]]), fk
            )
            fv = jnp.where(
                use, fv.at[worst].set(gen_v[:Lk, cand_beam[i]]), fv
            )
            return ft, fl, fs, fa, fk, fv

        fin_tokens, fin_len, fin_scores, fin_attn, fin_k, fin_v = (
            lax.fori_loop(
                0, 2 * B, add_hyp,
                (fin_tokens, fin_len, fin_scores, fin_attn, fin_k, fin_v),
            )
        )

        # --- pick next live beams: first B non-EOS candidates
        live_rank = jnp.cumsum((~is_eos).astype(jnp.int32)) - 1  # rank among non-eos
        # for each new beam slot b, find candidate index with live_rank==b & ~eos
        cand_order = jnp.where(~is_eos, live_rank, 2 * B)
        slot_to_cand = jnp.argmax(
            cand_order[None, :] == jnp.arange(B)[:, None], axis=1
        )  # (B,)
        new_beam_scores = cand_vals[slot_to_cand]
        src_beam = cand_beam[slot_to_cand]
        new_tok = cand_tok[slot_to_cand]

        # reorder per-beam state
        seq_buf = seq_buf[src_beam]
        seq_len = seq_len[src_beam]
        gen_tokens = gen_tokens[src_beam]
        attn_hist = attn_hist[src_beam]
        gen_k = gen_k[:, src_beam]
        gen_v = gen_v[:, src_beam]

        # append token + the attention index that produced it
        gen_tokens = gen_tokens.at[:, t].set(new_tok)
        attn_hist = attn_hist.at[:, t].set(attn_cur[src_beam])
        seq_buf = jax.vmap(lambda b, l, tok: b.at[l].set(tok))(
            seq_buf, seq_len, new_tok
        )
        seq_len = seq_len + 1

        # --- termination checks (before running the next forward)
        t_next = t + 1
        worst_fin = jnp.min(fin_scores)
        n_fin = jnp.sum(fin_scores > NEG_INF / 2)
        # best possible future score of live beams (length grows; with
        # length_penalty>=0 use current length like HF early_stopping=False)
        best_possible = jnp.max(new_beam_scores) / (
            jnp.maximum(t_next + 1, 1).astype(jnp.float32)
            ** spec.length_penalty
        )
        done_now = (
            (t_next >= G)
            | (t_next >= max_steps)
            | ((n_fin >= B) & (worst_fin >= best_possible))
        )
        if attn_probe is not None and attn_stop_idx is not None:
            # AlignAtt early stop: every live beam has an in-zone token
            # (slots > t hold -1 and never match a non-negative stop idx)
            done_now = done_now | jnp.all(
                jnp.any(attn_hist >= attn_stop_idx, axis=1)
            )

        # --- forward the next token for all beams; skipped via cond on the
        # final iteration (its logits would be unused — saves one full
        # weight stream per chunk).  Under vmap (batched_beam_search) the
        # cond's batched predicate makes its batching rule instantiate the
        # closed-over WEIGHTS as per-lane batched operands (a 14 GB/weight
        # broadcast at 8B/pool-8), so the batched path runs the forward
        # unconditionally instead (skip_last_fwd=False).
        def fwd(args):
            gk, gv = args
            x = llama_mod.embed(params, new_tok[:, None])
            return llama_mod.beam_token_step(
                params, cfg, prefix, gk, gv, t, x, attn_probe=attn_probe
            )

        def skip(args):
            gk, gv = args
            return (
                logits_cur,
                gk,
                gv,
                jnp.full((B,), -1, jnp.int32),
            )

        if skip_last_fwd:
            logits_next, gen_k, gen_v, attn_next = lax.cond(
                done_now, skip, fwd, (gen_k, gen_v)
            )
        else:
            logits_next, gen_k, gen_v, attn_next = fwd((gen_k, gen_v))

        return (
            t_next,
            done_now,
            logits_next,
            attn_next,
            new_beam_scores,
            seq_buf,
            seq_len,
            gen_tokens,
            attn_hist,
            gen_k,
            gen_v,
            fin_tokens,
            fin_len,
            fin_scores,
            fin_attn,
            fin_k,
            fin_v,
        )

    def cond_fn(state):
        t, done = state[0], state[1]
        return (~done) & (t < G)

    init = (
        jnp.array(0, jnp.int32),
        jnp.array(False),
        jnp.tile(first_logits[None], (B, 1)),
        jnp.tile(first_attn_idx[None], (B,)) if attn_probe is not None
        else jnp.full((B,), -1, jnp.int32),
        beam_scores0,
        seq_buf0,
        seq_len0,
        gen_tokens0,
        attn_hist0,
        gen_k0,
        gen_v0,
        fin_tokens0,
        fin_len0,
        fin_scores0,
        fin_attn0,
        fin_k0,
        fin_v0,
    )
    final = lax.while_loop(cond_fn, step_fn, init)
    (
        t,
        _done,
        _logits,
        _attn,
        beam_scores,
        _seq_buf,
        _seq_len,
        gen_tokens,
        attn_hist,
        gen_k_f,
        gen_v_f,
        fin_tokens,
        fin_len,
        fin_scores,
        fin_attn,
        fin_k,
        fin_v,
    ) = final

    # finalize: if no finished hypothesis, take best live beam (HF finalize
    # force-adds open hypotheses).
    best_live, best_fin, use_fin, live_score = finalize_winner(
        spec, t, beam_scores, fin_scores
    )

    tokens = jnp.where(use_fin, fin_tokens[best_fin], gen_tokens[best_live])
    n_tokens = jnp.where(use_fin, fin_len[best_fin], t)
    score = jnp.where(use_fin, fin_scores[best_fin], live_score[best_live])
    attn_idx = jnp.where(use_fin, fin_attn[best_fin], attn_hist[best_live])
    if return_kv:
        kv_k = jnp.where(use_fin, fin_k[best_fin], gen_k_f[:, best_live])
        kv_v = jnp.where(use_fin, fin_v[best_fin], gen_v_f[:, best_live])
    else:
        kv_k = kv_v = None
    return BeamResult(
        tokens=tokens, n_tokens=n_tokens, score=score, steps=t,
        hit_eos=use_fin, attn_idx=attn_idx, kv_k=kv_k, kv_v=kv_v,
    )


def batched_beam_search(
    params,
    cfg: LlamaConfig,
    dec: DecoderState,  # batch B — per-slot prefix caches after prefill
    last_logits: jnp.ndarray,  # (B, V)
    prompt_bufs: jnp.ndarray,  # (B, Tp)
    prompt_lens: jnp.ndarray,  # (B,)
    hists: jnp.ndarray,  # (B, Lh)
    hist_lens: jnp.ndarray,  # (B,)
    spec: BeamSpec,
    encoder_ngram_size: int = 0,
    suppress_mask: Optional[jnp.ndarray] = None,
    max_steps: Optional[jnp.ndarray] = None,  # (B,) per-slot step caps
    return_kv: bool = False,
) -> BeamResult:
    """Beam search for a POOL of independent streams (pooled serving): the
    shared-prefix trick generalised to per-slot prefixes via vmap — each
    slot keeps its un-replicated prefix cache and a (beam, G) generation
    buffer; the per-token matmuls batch to B*beam rows, so the weight
    stream is shared across every slot AND every beam.  Inactive slots
    should pass max_steps=1 so they cannot keep the batched loop alive.
    Returns a BeamResult with a leading (B,) axis on every field."""

    def one(k, v, vlen, lg, pbuf, plen, hist, hlen, msteps):
        prefix = DecoderState(k=k[:, None], v=v[:, None], valid_len=vlen[None])
        return beam_search(
            params, cfg, prefix, lg, pbuf, plen, hist, hlen, spec,
            encoder_ngram_size=encoder_ngram_size,
            suppress_mask=suppress_mask,
            max_steps=msteps,
            skip_last_fwd=False,  # see note in beam_search: lax.cond under
            # vmap would broadcast the weights per lane
            return_kv=return_kv,
        )

    if max_steps is None:
        max_steps = jnp.full(
            (last_logits.shape[0],), spec.max_new_tokens, jnp.int32
        )
    return jax.vmap(one, in_axes=(1, 1, 0, 0, 0, 0, 0, 0, 0))(
        dec.k, dec.v, dec.valid_len, last_logits, prompt_bufs, prompt_lens,
        hists, hist_lens, max_steps,
    )


# ---------------------------------------------------------------------------
# Sampling decode (the do_sample path: DPO sampling dumps, ref:
# agents/infinisst.py:196, options top_p/top_k/epsilon_cutoff/temperature)


class SampleSpec(NamedTuple):
    max_new_tokens: int
    eos_id: int
    pad_id: int
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    epsilon_cutoff: float = 0.0
    no_repeat_ngram_size: int = 0
    repetition_penalty: float = 1.0


def sample_decode(
    params,
    cfg: LlamaConfig,
    prefix: DecoderState,  # batch 1
    first_logits: jnp.ndarray,  # (V,)
    prompt_buf: jnp.ndarray,  # (Tp,)
    prompt_len: jnp.ndarray,
    history: jnp.ndarray,  # (Lh,)
    history_len: jnp.ndarray,
    spec: SampleSpec,
    rng: jax.Array,
    encoder_ngram_size: int = 0,
    suppress_mask: Optional[jnp.ndarray] = None,
) -> BeamResult:
    """Single-sequence ancestral sampling with the HF filter stack
    (temperature -> top-k -> top-p -> epsilon), sharing the ngram /
    repetition processors and the shared-prefix token step with beam
    search."""
    G = spec.max_new_tokens
    KV, Dh, L = cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    Tp = prompt_buf.shape[0]
    Tbuf = Tp + G

    seq_buf0 = jnp.concatenate(
        [prompt_buf, jnp.full((G,), spec.pad_id, prompt_buf.dtype)]
    )[None]
    gen_k0 = jnp.zeros((L, 1, G, KV, Dh), prefix.k.dtype)

    def process(logits, seq_buf, seq_len):
        scores = jax.nn.log_softmax(
            lp.temperature_scale(logits.astype(jnp.float32), spec.temperature),
            -1,
        )[None]
        scores = lp.repetition_penalty(
            scores, seq_buf, jnp.arange(Tbuf)[None] < seq_len[:, None],
            spec.repetition_penalty,
        )
        scores = lp.no_repeat_ngram(
            scores, seq_buf, seq_len, spec.no_repeat_ngram_size
        )
        if encoder_ngram_size > 0:
            scores = lp.encoder_no_repeat_ngram(
                scores, history[None], history_len[None], seq_buf, seq_len,
                encoder_ngram_size,
            )
        if suppress_mask is not None:
            scores = lp.suppress_tokens(scores, suppress_mask)
        scores = lp.top_k_filter(scores, spec.top_k)
        scores = lp.top_p_filter(scores, spec.top_p)
        scores = lp.epsilon_filter(scores, spec.epsilon_cutoff)
        return scores[0]

    def step_fn(state):
        (t, done, logits_cur, key, seq_buf, seq_len, tokens, gk, gv,
         n_tok, hit_eos) = state
        scores = process(logits_cur, seq_buf, seq_len)
        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, scores).astype(jnp.int32)
        is_eos = nxt == spec.eos_id
        emit = (~done) & (~is_eos)
        tokens = jnp.where(emit, tokens.at[t].set(nxt), tokens)
        seq_buf = jnp.where(
            emit, seq_buf.at[0, seq_len[0]].set(nxt), seq_buf
        )
        seq_len = seq_len + emit.astype(jnp.int32)
        n_tok = n_tok + emit.astype(jnp.int32)
        hit_eos = hit_eos | is_eos
        done_now = done | is_eos | (t + 1 >= G)

        def fwd(args):
            gk, gv = args
            x = llama_mod.embed(params, nxt[None, None])
            lg, gk2, gv2, _ = llama_mod.beam_token_step(
                params, cfg, prefix, gk, gv, t, x
            )
            return lg[0], gk2, gv2

        def skip(args):
            gk, gv = args
            return logits_cur, gk, gv

        logits_next, gk, gv = lax.cond(done_now, skip, fwd, (gk, gv))
        return (t + 1, done_now, logits_next, key, seq_buf, seq_len,
                tokens, gk, gv, n_tok, hit_eos)

    init = (
        jnp.array(0, jnp.int32), jnp.array(False), first_logits, rng,
        seq_buf0, prompt_len[None].astype(jnp.int32),
        jnp.full((G,), spec.pad_id, jnp.int32), gen_k0,
        jnp.zeros_like(gen_k0), jnp.array(0, jnp.int32), jnp.array(False),
    )
    final = lax.while_loop(lambda s: (~s[1]) & (s[0] < G), step_fn, init)
    (t, _, _, _, _, _, tokens, _, _, n_tok, hit_eos) = final
    return BeamResult(
        tokens=tokens, n_tokens=n_tok, score=jnp.float32(0.0), steps=t,
        hit_eos=hit_eos, attn_idx=jnp.full((G,), -1, jnp.int32),
    )
