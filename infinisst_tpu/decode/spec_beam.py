"""Speculative BEAM search: layer-skip draft + one-stream tree verify.

Beam search already shares each weight stream across the B beams
(llama.beam_token_step's two-block attention), but still pays one full
stream per emitted beam STEP.  This decoder amortises one stream over
several steps: draft the beam-search evolution k levels ahead with the
target's own first d layers (the same layer-skip draft as
decode/speculative.py), verify the whole drafted TREE — every (beam,
level) node — in ONE full forward (llama.beam_tree_step), then replay
the beam transitions with TARGET scores, accepting levels while the
target's selection matches the draft's proposal.

Exactness: the emitted result equals decode/beam.beam_search for ANY
draft quality, up to float associativity — applied transitions are
computed from llama.beam_tree_step logits (three-block attention) where
plain beam uses beam_token_step (two-block), so a top-2B selection can
in principle flip on an exactly-tied candidate pair (the same caveat as
the greedy speculation's batched-vs-sequential verify; the equality
tests pin f32 tiny models, where the two forwards agree to ~1e-4 and no
flip has been observed).  Round structure mirrors the greedy
speculation:

  - transition T0 runs ONCE per round from the carried target logits
    (the anchor — always exact, and computed before drafting so the
    level-0 tree nodes are BY CONSTRUCTION the applied beams);
  - the draft proposes transitions T1..Tk from draft logits (its beam
    state is a throwaway copy — draft fin-hypothesis updates never touch
    real state);
  - the verify forward yields target logits and K/V at all (k+1)*B tree
    nodes; the replay recomputes T1..Tk from those logits, applying a
    transition only while every previous level matched the draft
    EXACTLY (same (source beam, token) selection in the same slot
    order) — so applied beams always correspond to verified tree nodes,
    whose K/V commit by copy (rotate-on-read keys are
    position-independent);
  - the first mismatching level's inputs become the next round's
    carried logits, so its (exact) transition costs nothing extra.

Hypothesis bookkeeping, length-normalised scoring, EOS handling, and
termination are recomputed from target scores inside every applied
transition — the transition math is the same as decode/beam.py's
step_fn (HF BeamSearchScorer semantics; ref model/patches/patch_hf.py
43-157, the decode loop being replaced: agents/infinisst.py:320-368).
The reference has no speculative path; this is a TPU-native extension.

Used by the InfiniSST agent's --speculative mode when beam > 1 (the
reference's QUALITY configuration, scripts/infer/infinisst.sh:42);
emission is deferred-commit like the plain beam path (the winning
tokens replay into the persistent cache next chunk), so no external KV
contract is needed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from infinisst_tpu.core.config import LlamaConfig
from infinisst_tpu.decode import logits as lp
from infinisst_tpu.decode.beam import (
    NEG_INF,
    BeamSpec,
    finalize_winner,
    select_candidates,
)
from infinisst_tpu.decode.speculative import (
    _draft_setup,
    _shortlist_reenter,
)
from infinisst_tpu.models import llama as llama_mod
from infinisst_tpu.streaming.state import DecoderState


class SpecBeamResult(NamedTuple):
    tokens: jnp.ndarray  # (G,) winning generated tokens (pad-filled)
    n_tokens: jnp.ndarray  # scalar int32 (EOS excluded)
    score: jnp.ndarray  # scalar f32
    steps: jnp.ndarray  # scalar int32: beam steps executed
    hit_eos: jnp.ndarray  # scalar bool
    rounds: jnp.ndarray  # scalar int32: verify forwards (weight streams)
    drafted: jnp.ndarray  # scalar int32: drafted levels proposed
    accepted: jnp.ndarray  # scalar int32: drafted levels accepted


def spec_beam_search(
    params,
    cfg: LlamaConfig,
    prefix: DecoderState,  # batch 1 — cache after chunk prefill
    first_logits: jnp.ndarray,  # (V,)
    prompt_buf: jnp.ndarray,  # (Tp,)
    prompt_len: jnp.ndarray,  # scalar int32
    history: jnp.ndarray,  # (Lh,)
    history_len: jnp.ndarray,  # scalar int32
    spec: BeamSpec,
    draft_layers: int,
    draft_k: int,
    encoder_ngram_size: int = 0,
    suppress_mask: Optional[jnp.ndarray] = None,
    max_steps: Optional[jnp.ndarray] = None,
    draft_head: Optional[dict] = None,
    exit_adapter: Optional[dict] = None,
    accept_all: bool = False,  # bench-only machinery ceiling: force the
    # drafted trajectory (output is then the draft's, NOT beam-exact)
) -> SpecBeamResult:
    B = spec.beam
    G = spec.max_new_tokens
    k = draft_k
    d = draft_layers
    V = first_logits.shape[-1]
    KV, Dh, L = cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    Tp = prompt_buf.shape[0]
    Gb = G + k  # slack: the draft stages up to k levels past the cap
    Tbuf = Tp + Gb

    params_d, cfg_d, head_ids, head_prefix = _draft_setup(
        params, cfg, d, draft_head, exit_adapter
    )
    prefix_d = DecoderState(
        k=prefix.k[:d], v=prefix.v[:d], valid_len=prefix.valid_len
    )
    if max_steps is None:
        max_steps = jnp.asarray(G, jnp.int32)

    def process_scores(scores, seq_buf, seq_len):
        scores = lp.repetition_penalty(
            scores, seq_buf,
            jnp.arange(Tbuf)[None, :] < seq_len[:, None],
            spec.repetition_penalty,
        )
        scores = lp.no_repeat_ngram(
            scores, seq_buf, seq_len, spec.no_repeat_ngram_size
        )
        if encoder_ngram_size > 0:
            scores = lp.encoder_no_repeat_ngram(
                scores,
                jnp.tile(history[None], (B, 1)),
                jnp.tile(history_len[None], (B,)),
                seq_buf, seq_len, encoder_ngram_size,
            )
        if suppress_mask is not None:
            scores = lp.suppress_tokens(scores, suppress_mask)
        return scores

    def transition(logits_cur, t_step, beam_scores, seq_buf, seq_len,
                   gen_tokens, fin_tokens, fin_len, fin_scores,
                   force=None):
        """One beam-search step from (B, V) logits: HF BeamSearchScorer
        semantics, transition math identical to decode/beam.py step_fn
        (minus the attn probe / K-V snapshots this decoder doesn't
        need).  ``force`` (bench-only accept_all) substitutes a given
        (src_beam, new_tok) selection; scores still come from
        ``logits_cur``."""
        scores = jax.nn.log_softmax(logits_cur.astype(jnp.float32), -1)
        scores = process_scores(scores, seq_buf, seq_len)
        total, cand_vals, cand_beam, cand_tok = select_candidates(
            scores, beam_scores
        )

        is_eos = cand_tok == spec.eos_id
        rank = jnp.arange(2 * B)
        eos_ok = is_eos & (rank < B)
        hyp_len = (t_step + 1).astype(jnp.float32)
        hyp_score = (
            cand_vals / jnp.maximum(hyp_len, 1.0) ** spec.length_penalty
        )

        def add_hyp(i, carry):
            ft, fl, fs = carry
            worst = jnp.argmin(fs)
            use = eos_ok[i] & (hyp_score[i] > fs[worst])
            toks = gen_tokens[cand_beam[i]]
            ft = jnp.where(use, ft.at[worst].set(toks), ft)
            fl = jnp.where(use, fl.at[worst].set(t_step), fl)
            fs = jnp.where(use, fs.at[worst].set(hyp_score[i]), fs)
            return ft, fl, fs

        fin_tokens, fin_len, fin_scores = lax.fori_loop(
            0, 2 * B, add_hyp, (fin_tokens, fin_len, fin_scores)
        )

        live_rank = jnp.cumsum((~is_eos).astype(jnp.int32)) - 1
        cand_order = jnp.where(~is_eos, live_rank, 2 * B)
        slot_to_cand = jnp.argmax(
            cand_order[None, :] == jnp.arange(B)[:, None], axis=1
        )
        src_beam = cand_beam[slot_to_cand]
        new_tok = cand_tok[slot_to_cand]
        if force is not None:
            src_beam, new_tok = force
        new_beam_scores = total[src_beam, new_tok]

        seq_buf = seq_buf[src_beam]
        seq_len = seq_len[src_beam]
        gen_tokens = gen_tokens[src_beam]
        gen_tokens = gen_tokens.at[:, t_step].set(new_tok)
        seq_buf = jax.vmap(lambda b, l, tok: b.at[l].set(tok))(
            seq_buf, seq_len, new_tok
        )
        seq_len = seq_len + 1

        t_next = t_step + 1
        worst_fin = jnp.min(fin_scores)
        n_fin = jnp.sum(fin_scores > NEG_INF / 2)
        best_possible = jnp.max(new_beam_scores) / (
            jnp.maximum(t_next + 1, 1).astype(jnp.float32)
            ** spec.length_penalty
        )
        done_now = (
            (t_next >= G)
            | (t_next >= max_steps)
            | ((n_fin >= B) & (worst_fin >= best_possible))
        )
        return (src_beam, new_tok, new_beam_scores, seq_buf, seq_len,
                gen_tokens, fin_tokens, fin_len, fin_scores, done_now)

    def round_fn(state):
        (t, done, logits_cur, beam_scores, seq_buf, seq_len, gen_tokens,
         gen_k, gen_v, fin_tokens, fin_len, fin_scores, rounds, drafted,
         accepted) = state

        # ---- T0 (the anchor): applied immediately from real state;
        # its selection defines the level-0 tree nodes, so applied beams
        # and tree nodes correspond BY CONSTRUCTION (no recompute race)
        (src0, tok0, bs1, sb1, sl1, gt1, ft1, fl1, fs1, done1) = (
            transition(logits_cur, t, beam_scores, seq_buf, seq_len,
                       gen_tokens, fin_tokens, fin_len, fin_scores)
        )

        def draft_and_verify(_):
            # ---- draft phase: propose T1..Tk from draft logits on a
            # throwaway copy of the (post-T0) beam state
            srcs = [src0]
            toks = [tok0]
            dbs, dsb, dsl, dgt = bs1, sb1, sl1, gt1
            dft, dfl, dfs = ft1, fl1, fs1
            dgk, dgv = gen_k[:d], gen_v[:d]
            cur_tok = tok0
            cur_src = src0
            for s in range(1, k + 1):
                dgk, dgv = dgk[:, cur_src], dgv[:, cur_src]
                raw, dgk, dgv, _ = llama_mod.beam_token_step(
                    params_d, cfg_d, prefix_d, dgk, dgv,
                    t + s - 1,
                    llama_mod.embed(params_d, cur_tok[:, None]),
                )
                dlg = _shortlist_reenter(raw, head_ids, head_prefix, V)
                (src_s, tok_s, dbs, dsb, dsl, dgt, dft, dfl, dfs,
                 _dn) = transition(
                    dlg, t + s, dbs, dsb, dsl, dgt, dft, dfl, dfs
                )
                srcs.append(src_s)
                toks.append(tok_s)
                cur_tok, cur_src = tok_s, src_s
            srcs_a = jnp.stack(srcs)  # (k+1, B)
            toks_a = jnp.stack(toks)

            # ---- tree structure (static unroll over the small k, B)
            # anc[s][sp] (B,): the level-sp ancestor SLOT of node (b, s)
            anc_tab = []
            for s in range(k + 1):
                chain = [None] * (s + 1)
                cur = jnp.arange(B)
                chain[s] = cur
                for sp in range(s, 0, -1):
                    cur = srcs_a[sp][cur]
                    chain[sp - 1] = cur
                anc_tab.append(chain)
            rows = []
            roots = []
            node_pos = []
            for s in range(k + 1):
                blocks = []
                for sp in range(k + 1):
                    if sp <= s:
                        blocks.append(
                            anc_tab[s][sp][:, None]
                            == jnp.arange(B)[None, :]
                        )
                    else:
                        blocks.append(jnp.zeros((B, B), bool))
                rows.append(jnp.concatenate(blocks, axis=1))
                # committed-buffer root: T0's source of the level-0
                # ancestor
                roots.append(src0[anc_tab[s][0]])
                node_pos.append(jnp.full((B,), t + s, jnp.int32))
            tree_mask = jnp.concatenate(rows, axis=0)  # (N, N)
            tree_bias = jnp.where(
                tree_mask, 0.0, NEG_INF
            ).astype(jnp.float32)
            root_n = jnp.concatenate(roots)
            node_pos = jnp.concatenate(node_pos)

            # ---- verify: ONE full weight stream over all tree nodes
            lg_tree, k_tree, v_tree = llama_mod.beam_tree_step(
                params, cfg, prefix, gen_k, gen_v, t,
                llama_mod.embed(params, toks_a.reshape(-1)[None])[0],
                node_pos, tree_bias, root_n,
            )
            # f32: the carried logits ride the while_loop state (the
            # model may compute bf16)
            return (
                lg_tree.reshape(k + 1, B, V).astype(jnp.float32),
                # cache dtype: must type-match skip_round's placeholders
                # even when the KV cache stores a different dtype than
                # the activations (the commit path casts anyway)
                k_tree.reshape(L, k + 1, B, KV, Dh).astype(
                    prefix.k.dtype
                ),
                v_tree.reshape(L, k + 1, B, KV, Dh).astype(
                    prefix.k.dtype
                ),
                srcs_a, toks_a,
            )

        def skip_round(_):
            # T0 already terminated the search: skip the draft forwards
            # and the tree verify entirely (the replay applies nothing —
            # done_c starts True — and the level-0 commit below is dead
            # state the while_loop exit never reads)
            return (
                jnp.zeros((k + 1, B, V), jnp.float32),
                jnp.zeros((L, k + 1, B, KV, Dh), prefix.k.dtype),
                jnp.zeros((L, k + 1, B, KV, Dh), prefix.k.dtype),
                jnp.tile(src0[None], (k + 1, 1)),
                jnp.tile(tok0[None], (k + 1, 1)),
            )

        lg_tree, k_tree, v_tree, srcs, toks = lax.cond(
            done1, skip_round, draft_and_verify, None
        )

        # ---- replay T1..Tk with TARGET logits, applying while matched
        bs_c, sb_c, sl_c, gt_c = bs1, sb1, sl1, gt1
        ft_c, fl_c, fs_c = ft1, fl1, fs1
        done_c = done1
        n_r = jnp.asarray(1, jnp.int32)
        matched = jnp.asarray(True)
        # anc_fin[b, s]: level-s tree slot on final slot b's path
        anc_fin = jnp.zeros((B, k + 1), jnp.int32).at[:, 0].set(
            jnp.arange(B)
        )
        root_fin = src0
        lg_carry = lg_tree[0]
        for s in range(1, k + 1):
            force = (srcs[s], toks[s]) if accept_all else None
            (src_s, tok_s, bs_n, sb_n, sl_n, gt_n, ft_n, fl_n, fs_n,
             dn_n) = transition(
                lg_tree[s - 1], t + s, bs_c, sb_c, sl_c, gt_c, ft_c,
                fl_c, fs_c, force=force,
            )
            if accept_all:
                match_s = jnp.asarray(True)
            else:
                match_s = jnp.all(src_s == srcs[s]) & jnp.all(
                    tok_s == toks[s]
                )
            apply = matched & match_s & (~done_c)
            matched = matched & match_s

            def pick(new, old):
                return jnp.where(apply, new, old)

            bs_c = pick(bs_n, bs_c)
            sb_c = pick(sb_n, sb_c)
            sl_c = pick(sl_n, sl_c)
            gt_c = pick(gt_n, gt_c)
            ft_c = pick(ft_n, ft_c)
            fl_c = pick(fl_n, fl_c)
            fs_c = pick(fs_n, fs_c)
            done_c = jnp.where(apply, dn_n, done_c)
            anc_fin = pick(
                anc_fin[src_s].at[:, s].set(jnp.arange(B)), anc_fin
            )
            root_fin = pick(root_fin[src_s], root_fin)
            lg_carry = pick(lg_tree[s], lg_carry)
            n_r = n_r + apply.astype(jnp.int32)

        # ---- commit: reorder committed K/V by the final roots, then
        # copy the applied tree nodes' K/V along each final beam's path
        gen_k = gen_k[:, root_fin]
        gen_v = gen_v[:, root_fin]
        for s in range(k + 1):
            write = s < n_r
            gk_s = k_tree[:, s][:, anc_fin[:, s]]  # (L, B, KV, Dh)
            gv_s = v_tree[:, s][:, anc_fin[:, s]]
            def put(buf, new):
                # buf (B, Gb, KV, Dh) per layer; new (B, KV, Dh) goes to
                # generation slot t+s of every beam row
                return lax.dynamic_update_slice(
                    buf, new[:, None].astype(buf.dtype), (0, t + s, 0, 0)
                )

            gen_k = jnp.where(write, jax.vmap(put)(gen_k, gk_s), gen_k)
            gen_v = jnp.where(write, jax.vmap(put)(gen_v, gv_s), gen_v)

        # rounds counts VERIFY weight streams and drafted counts levels
        # actually proposed: a skipped round (T0 terminated the search)
        # ran neither
        ran = (~done1).astype(jnp.int32)
        return (
            t + n_r, done_c, lg_carry, bs_c, sb_c, sl_c, gt_c,
            gen_k, gen_v, ft_c, fl_c, fs_c, rounds + ran,
            drafted + k * ran, accepted + (n_r - 1),
        )

    seq_buf0 = jnp.tile(
        jnp.concatenate(
            [prompt_buf,
             jnp.full((Gb,), spec.pad_id, prompt_buf.dtype)]
        )[None],
        (B, 1),
    )
    state0 = (
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.tile(first_logits[None], (B, 1)).astype(jnp.float32),
        jnp.full((B,), NEG_INF, jnp.float32).at[0].set(0.0),
        seq_buf0,
        jnp.zeros((B,), jnp.int32) + prompt_len,
        jnp.full((B, Gb), spec.pad_id, jnp.int32),
        jnp.zeros((L, B, Gb, KV, Dh), prefix.k.dtype),
        jnp.zeros((L, B, Gb, KV, Dh), prefix.k.dtype),
        jnp.full((B, Gb), spec.pad_id, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), NEG_INF, jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    final = lax.while_loop(
        lambda s: (~s[1]) & (s[0] < G), round_fn, state0
    )
    (t, _done, _lg, beam_scores, _sb, _sl, gen_tokens, _gk, _gv,
     fin_tokens, fin_len, fin_scores, rounds, drafted, accepted) = final

    best_live, best_fin, use_fin, live_score = finalize_winner(
        spec, t, beam_scores, fin_scores
    )

    tokens = jnp.where(
        use_fin, fin_tokens[best_fin], gen_tokens[best_live]
    )[:G]
    n_tokens = jnp.where(use_fin, fin_len[best_fin], t)
    score = jnp.where(use_fin, fin_scores[best_fin], live_score[best_live])
    return SpecBeamResult(
        tokens=tokens, n_tokens=n_tokens, score=score, steps=t,
        hit_eos=use_fin, rounds=rounds, drafted=drafted,
        accepted=accepted,
    )
