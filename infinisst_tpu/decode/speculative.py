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

One implementation, two entry points: ``batched_speculative_greedy`` is
the real thing (the serving pool shares one draft stream and one verify
stream per round across all slots and all k+1 positions);
``speculative_greedy`` is its B=1 wrapper for the single-stream agent.
Used by the InfiniSST agent's --speculative greedy mode and
``ServingEngine(speculative=True)`` (off by default; the reference has no
speculative path — this is a TPU-native extension, ref decode loop being
replaced: transformers greedy_search semantics as in
agents/infinisst.py:320-368).

``batched_speculative_sample`` / ``speculative_sample`` extend the same
draft/verify machinery to the sampling path (the reference's --do-sample
DPO data-collection flow, and ``ServingEngine(do_sample=True)`` pooled
sampling) via the standard rejection scheme: exact in DISTRIBUTION
rather than token-exact — every emitted token's conditional law equals
single-step ancestral sampling from the processed target distribution,
independently per row.
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


def breakeven_tokens_per_round(
    llama_params,
    num_layers: int,
    draft_layers: int,
    draft_k: int,
    draft_head=None,
    exit_adapter=None,
) -> float:
    """Tokens a verify round must emit for speculation to beat plain
    decode, from the weight-stream byte model.

    Decode is weight-bound (ARCHITECTURE phase profile: ~11 ms/step vs a
    ~9.2 ms HBM floor at 8B-int8), so per-token cost ≈ bytes streamed:
    a speculative round streams k draft steps (first ``d`` layers + the
    draft's lm_head [+ exit adapter]) plus ONE full verify pass, and
    emits ``accepted + 1`` tokens; plain decode streams the full model
    once per token.  Speculation wins iff

        tokens_per_round > 1 + k * draft_step_bytes / full_bytes.

    Used by the acceptance guard (agents/infinisst.py, serve/engine.py)
    to auto-drop to plain decode when a draft underperforms — the
    reference has no speculative path, so this protects a capability it
    does not have (VERDICT r3 weak #1).
    """

    def nbytes(t) -> float:
        return float(
            sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(t))
        )

    layer_bytes = nbytes(llama_params["layers"]) / num_layers
    head_bytes = nbytes(
        draft_head if draft_head is not None else llama_params["lm_head"]
    )
    adapter_bytes = nbytes(exit_adapter) if exit_adapter is not None else 0.0
    draft_step_bytes = (
        draft_layers * layer_bytes + head_bytes + adapter_bytes
    )
    # embed is a per-token gather (a few rows), not a streamed weight —
    # exclude it from both sides of the ratio
    full_bytes = nbytes(
        {k: v for k, v in llama_params.items() if k != "embed"}
    )
    return 1.0 + draft_k * draft_step_bytes / full_bytes


def make_draft_head(lm_head, head_vocab: int, ids=None):
    """Slice a cheap DRAFT-ONLY lm_head: ``head_vocab`` vocabulary columns
    of the target head (a shortlist).  The draft then scores only the
    shortlist (its scores are scattered back into full-vocab space before
    the shared processors), so the per-draft-step head stream shrinks from
    V columns to ``head_vocab`` columns — at 8B-int8 the full 0.53 GB head
    dominates draft cost (ARCHITECTURE.md optimization log); a 16k
    shortlist streams 1/8 of it.  Exactness is untouched: the verify
    forward uses the full head, so emitted tokens remain exactly
    sequential processed-greedy — a shortlist miss only costs acceptance.

    ``ids`` defaults to the first ``head_vocab`` token ids: BPE vocabularies
    (incl. Llama's) are merge-ordered, i.e. roughly frequency-ordered, so
    the id-prefix is a natural high-coverage shortlist without needing
    corpus statistics.  Pass corpus-ranked ids for a tuned shortlist.

    Handles every head layout quantize_llama_params produces: bf16 (D, V),
    W8A8 {'q','scale_a8'(V,)} and grouped {'q','scale_a8'(G, V)}, and
    weight-only {'q','scale'(V,)}.  int8 layouts are padded to a
    512-multiple of columns with zero scales (pad logits are sliced off by
    the draft cfg's vocab_size, mirroring llama.py's handling).

    Returns {'w': sliced head, 'prefix': (head_vocab,) int32} for the
    default id-prefix shortlist, or {'w': ..., 'ids': (head_vocab,)} for
    a custom shortlist — the KEY is how the decoders statically pick the
    cheap path: a prefix shortlist's scores re-enter full-vocab space as
    a constant pad (vectorized, near-free), a custom shortlist needs a
    real scatter (measurably slower per draft step at 128k vocab)."""
    prefix = ids is None
    if prefix:
        ids = jnp.arange(head_vocab, dtype=jnp.int32)
    else:
        ids = jnp.asarray(ids, jnp.int32)
        if ids.shape != (head_vocab,):
            raise ValueError(
                f"shortlist ids have shape {ids.shape}, need exactly "
                f"({head_vocab},) — is the ids file shorter than "
                "the requested head_vocab?"
            )

    def cols(a, pad_cols):
        out = jnp.take(a, ids, axis=-1)
        if pad_cols:
            pad = [(0, 0)] * (a.ndim - 1) + [(0, pad_cols)]
            out = jnp.pad(out, pad)
        return out

    if isinstance(lm_head, dict):
        vp = ((head_vocab + 511) // 512) * 512 - head_vocab
        skey = "scale_a8" if "scale_a8" in lm_head else "scale"
        w = {
            "q": cols(lm_head["q"], vp),
            skey: cols(lm_head[skey], vp),
        }
    else:
        w = cols(lm_head, 0)
    return {"w": w, ("prefix" if prefix else "ids"): ids}


def _draft_setup(params, cfg, d, draft_head, exit_adapter):
    """Build the draft's (params, cfg, shortlist) triple shared by the
    greedy and sampling speculative decoders: first ``d`` target layers
    (+ optional distilled exit adapter), full / shortlist / low-rank
    lm_head.  Returns (params_d, cfg_d, head_ids, head_prefix)."""
    params_d = {
        "embed": params["embed"],
        "layers": jax.tree.map(lambda a: a[:d], params["layers"]),
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
    }
    if exit_adapter is not None:
        # distilled early-exit adapter (train/draft.py): draft-only, so
        # exactness is untouched — verify never sees it
        params_d["exit_adapter"] = exit_adapter
    if draft_head is None:
        cfg_d = dataclasses.replace(cfg, num_layers=d)
        head_ids = None
        head_prefix = False
    else:
        # kind is static pytree structure: 'prefix' selects the pad
        # re-entry, 'ids' the scatter re-entry (make_draft_head);
        # neither = a full-vocab REPLACEMENT head (low-rank factors,
        # make_lowrank_draft_head) needing no re-entry at all
        head_prefix = "prefix" in draft_head
        if head_prefix:
            head_ids = draft_head["prefix"]
        elif "ids" in draft_head:
            head_ids = draft_head["ids"]
        else:
            head_ids = None
        cfg_d = dataclasses.replace(
            cfg, num_layers=d,
            vocab_size=(
                head_ids.shape[0] if head_ids is not None
                else cfg.vocab_size
            ),
        )
        params_d["lm_head"] = draft_head["w"]
    return params_d, cfg_d, head_ids, head_prefix


def _shortlist_reenter(lg_last, head_ids, head_prefix, V):
    """Map the draft's (B, Vs) shortlist scores back into full-vocab
    space: prefix shortlists pad (shortlist id i IS vocab id i), custom
    shortlists scatter.  Off-shortlist ids sit at -inf — strictly below
    every processed score including banned ones, so the draft can never
    propose an off-shortlist id (and under sampling their probability is
    exactly 0)."""
    if head_ids is None:
        return lg_last[:, :V]
    B, Vs = lg_last.shape
    if head_prefix:
        return jnp.pad(
            lg_last, ((0, 0), (0, V - Vs)), constant_values=-jnp.inf
        ).astype(lg_last.dtype)
    scores = jnp.full((B, V), -jnp.inf, lg_last.dtype)
    return scores.at[:, head_ids].set(lg_last)


def dequant_head(lm_head):
    """Any lm_head layout -> dense float32 numpy (D, V) on the host.
    Layouts: plain array; weight-only {'q','scale'(V,)}; W8A8
    {'q','scale_a8'(V,)}; grouped W8A8 {'q','scale_a8'(Gr, V)} (padded
    vocab columns carry zero scales and dequantize to zero)."""
    import numpy as np

    if not isinstance(lm_head, dict):
        return np.asarray(jax.device_get(lm_head), np.float32)
    q = np.asarray(jax.device_get(lm_head["q"]), np.float32)
    s = np.asarray(
        jax.device_get(lm_head.get("scale_a8", lm_head.get("scale"))),
        np.float32,
    )
    if s.ndim == 1:  # per-out-channel
        return q * s[None, :]
    Gr, V = s.shape  # per-(input-group, out-channel)
    D = q.shape[0]
    return (q.reshape(Gr, D // Gr, V) * s[:, None, :]).reshape(D, V)


def make_lowrank_draft_head(lm_head, rank: int, dtype=None):
    """Truncated-SVD low-rank DRAFT-ONLY lm_head: W ~= A @ B with
    A (D, r), B (r, V).  The draft's head stream shrinks from D*V bytes
    to r*(D+V) — at 8B-int8 the full 0.53 GB head dominates draft cost
    (ARCHITECTURE.md optimization log / docs/spec_decompose.json); r=512
    bf16 factors stream 0.14 GB, a ~4x head cut.  Exactness is untouched
    for both greedy and sampling speculative decoding: verify uses the
    full head, so truncation error only costs acceptance.

    Computed via the D x D Gram matrix (D << V): the top-r eigenvectors
    U of W @ W^T give the best rank-r factorization A = U,
    B = U^T @ W (Eckart-Young).  One-time host-side cost: one (D, D, V)
    GEMM + a (D, D) eigh — minutes at 8B scale, done at load time.
    Quantized layouts are dequantized first (``dequant_head``).

    Returns {'w': {'a': (D, r), 'b': (r, V)}} — a full-vocab replacement
    head (no shortlist re-entry; models/quant.mm dispatches the factored
    matmul).

    On a remote-tunnel dev backend, building from DEVICE-resident params
    means one head fetch + one factor upload, which can dominate startup
    (CLAUDE.md upload pathology) — a warning is emitted; precompute
    factors offline and pass --spec-lowrank-head there instead.  Real
    checkpoint loads build the factors while params are still host-side
    numpy, where this is a pure host computation."""
    import sys as _sys

    import numpy as np

    arr = lm_head["q"] if isinstance(lm_head, dict) else lm_head
    if isinstance(arr, jax.Array) and arr.devices() and (
        next(iter(arr.devices())).platform not in ("cpu",)
    ):
        print(
            "make_lowrank_draft_head: lm_head is device-resident "
            f"({next(iter(arr.devices())).platform}); the SVD needs a "
            "full head fetch + factor upload, which is slow on remote "
            "tunnels — consider precomputing factors offline and "
            "passing spec_lowrank_head / --spec-lowrank-head",
            file=_sys.stderr, flush=True,
        )
    w = dequant_head(lm_head)
    D = w.shape[0]
    if not (0 < rank <= D):
        raise ValueError(f"rank must be in (0, {D}], got {rank}")
    g = w @ w.T  # (D, D)
    _, evecs = np.linalg.eigh(g)  # ascending eigenvalues
    u = evecs[:, -rank:]  # (D, r) top singular subspace
    dt = dtype or (jnp.bfloat16 if isinstance(lm_head, dict)
                   else lm_head.dtype)
    return {"w": {"a": jnp.asarray(u, dt), "b": jnp.asarray(u.T @ w, dt)}}


class SpecResult(NamedTuple):
    tokens: jnp.ndarray  # (G,) emitted tokens (pad-filled)
    n_tokens: jnp.ndarray  # scalar int32 (EOS excluded)
    hit_eos: jnp.ndarray  # scalar bool
    rounds: jnp.ndarray  # scalar int32: verify forwards (weight streams)
    drafted: jnp.ndarray  # scalar int32: draft tokens proposed
    accepted: jnp.ndarray  # scalar int32: draft tokens accepted
    dec: DecoderState  # cache WITH the emitted tokens committed


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
    draft_head: Optional[dict] = None,  # make_draft_head output (shortlist)
    exit_adapter: Optional[dict] = None,  # train/draft.py distilled adapter
):
    """Pooled layer-skip speculation: every slot drafts and verifies in
    lockstep, so the pool shares ONE draft stream and ONE verify stream
    per round across all slots AND all verified positions.  Emitted
    tokens per row are exactly the engine's sequential batched-greedy
    output (EOS not emitted, per-row cap); accepted tokens' K/V commit
    during verification.

    Per round: 1 fused draft scan (k cheap steps over the first d
    layers) + 1 full verify forward over k+1 tokens.  Every live row
    emits at least one token per round (the round's first token is the
    full model's own argmax from the previous round's logits, so it is
    always correct), plus however many draft tokens the full model
    confirms, minus EOS/cap truncation.

    Returns (tokens (B, G), n_tokens (B,), hit_eos (B,), dec,
    rounds, drafted (B,), accepted (B,))."""
    G = spec.max_new_tokens
    k = spec.draft_k
    d = spec.draft_layers
    B, V = first_logits.shape
    Tp = ids.shape[1]
    # +k slack: near the cap a round still stages k+1 candidates in the
    # buffer before the cap truncates the commit — without the slack the
    # staging write would clamp and corrupt earlier context
    Tbuf = Tp + G + k
    if row_max_new is None:
        row_max_new = jnp.full((B,), G, jnp.int32)
    else:
        # defend the <= G contract in-graph: the staging/commit arithmetic
        # sizes its buffers by G, so an over-G row cap must bind to G (the
        # serve engine clamps host-side too; this keeps the decoder
        # correct for any caller)
        row_max_new = jnp.minimum(row_max_new, G)

    params_d, cfg_d, head_ids, head_prefix = _draft_setup(
        params, cfg, d, draft_head, exit_adapter
    )

    def process_argmax(logits, seq_buf, seq_len):
        """(B, V) batched processors, the greedy order shared by the beam
        loop and the serve engine (decode/beam.py:149-170)."""
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
        (dec, last_logits, seq_buf, seq_len, tokens, n_out, done, hit_eos,
         rounds, drafted, accepted) = state

        # the round's anchor token: the full model's own next choice
        t1 = process_argmax(last_logits, seq_buf, seq_len)  # (B,)

        # ---- draft phase: k cheap steps over the first d layers.  The
        # draft's cache is a slice of the main cache (identical layers)
        # plus its own in-round appends.
        sbuf1 = jax.vmap(lambda b, l, t: b.at[l].set(t))(seq_buf, seq_len, t1)
        ddec = DecoderState(k=dec.k[:d], v=dec.v[:d], valid_len=dec.valid_len)

        def draft_step(carry, _):
            ddec, tok, sbuf, slen = carry
            lg, ddec = llama_mod.decode_step(
                params_d, cfg_d, ddec,
                llama_mod.embed(params_d, tok[:, None]),
            )
            # full-vocab re-entry (constant pad for prefix shortlists,
            # scatter for custom ones) so the shared processors see real
            # token ids; if the entire shortlist is banned the round
            # drafts a banned token that verify rejects —
            # acceptance-only cost, never correctness
            scores = _shortlist_reenter(lg[:, -1], head_ids, head_prefix, V)
            nxt = process_argmax(scores, sbuf, slen + 1)
            sbuf = jax.vmap(lambda b, l, t: b.at[l + 1].set(t))(
                sbuf, slen, nxt
            )
            return (ddec, nxt, sbuf, slen + 1), nxt

        (_, _, _, _), drafts = jax.lax.scan(
            draft_step, (ddec, t1, sbuf1, seq_len), None, length=k
        )  # drafts (k, B)

        # ---- verify: ONE full forward over [t1, d2..d_{k+1}] per row
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

        # per-position processed argmax; position j's context is the
        # prefix + toks_v[:j+1]
        true_next = jax.vmap(
            lambda lgj, off: process_argmax(lgj, sbuf_v, seq_len + off + 1),
            in_axes=(1, 0), out_axes=1,
        )(lg_v[:, :, :V], jnp.arange(k + 1))  # (B, k+1)

        if spec.accept_all:
            a = jnp.full((B,), k, jnp.int32)
        else:
            match = true_next[:, :-1] == toks_v[:, 1:]  # (B, k)
            a = jnp.where(
                jnp.all(match, axis=1), k, jnp.argmin(match, axis=1)
            ).astype(jnp.int32)

        # ---- emission: toks_v[0..a], truncated at EOS and the cap
        idx = jnp.arange(k + 1)[None]
        eos_in = (toks_v == spec.eos_id) & (idx <= a[:, None])
        first_eos = jnp.where(
            jnp.any(eos_in, axis=1), jnp.argmax(eos_in, axis=1), k + 1
        ).astype(jnp.int32)
        room = (row_max_new - n_out).astype(jnp.int32)
        n_r = jnp.minimum(jnp.minimum(a + 1, first_eos), room)
        n_r = jnp.where(live, n_r, 0)
        # EOS "hits" only when it falls strictly INSIDE the remaining
        # budget: at first_eos == room the cap exhausts first and the
        # sequential-greedy loop would never have computed the EOS step
        # (first_eos <= a holds whenever eos_in is nonempty)
        hit = jnp.any(eos_in, axis=1) & (first_eos < room) & live

        # masked scatter (dynamic_update_slice would CLAMP its start near
        # the end of the buffer and overwrite earlier emissions)
        relt = jnp.arange(G)[None] - n_out[:, None]  # (B, G)
        put = jnp.take_along_axis(toks_v, jnp.clip(relt, 0, k), axis=1)
        tokens = jnp.where((relt >= 0) & (relt < n_r[:, None]), put, tokens)
        rels = jnp.arange(Tbuf)[None] - seq_len[:, None]
        puts = jnp.take_along_axis(toks_v, jnp.clip(rels, 0, k), axis=1)
        seq_buf = jnp.where(
            (rels >= 0) & (rels < n_r[:, None]), puts, seq_buf
        )

        # commit exactly the emitted tokens' K/V (computed in the verify
        # forward); the rest stays past valid_len
        dec = dec_v._replace(valid_len=dec.valid_len + n_r)
        next_logits = jnp.take_along_axis(
            lg_v[:, :, :V], jnp.maximum(n_r - 1, 0)[:, None, None], axis=1
        )[:, 0].astype(jnp.float32)
        # carried dtype/content stable for frozen rows
        next_logits = jnp.where(live[:, None], next_logits, last_logits)
        n_out = n_out + n_r
        done = done | hit | (n_out >= row_max_new)
        return (
            dec, next_logits, seq_buf, seq_len + n_r, tokens, n_out, done,
            hit_eos | hit, rounds + 1,
            drafted + jnp.where(live, k, 0),
            accepted + jnp.maximum(n_r - 1, 0),
        )

    zb = jnp.zeros((B,), jnp.int32)
    state0 = (
        dec0, first_logits.astype(jnp.float32), seq_buf0,
        prompt_lens.astype(jnp.int32),
        jnp.full((B, G), spec.pad_id, jnp.int32), zb,
        ~act0,  # inactive rows start done
        jnp.zeros((B,), bool),
        jnp.zeros((), jnp.int32), zb, zb,
    )
    state = jax.lax.while_loop(
        lambda s: jnp.any(~s[6]), round_fn, state0
    )
    (dec, _, _, _, tokens, n_out, _, hit_eos, rounds, drafted,
     accepted) = state
    return tokens, n_out, hit_eos, dec, rounds, drafted, accepted


class SpecSampleSpec(NamedTuple):
    max_new_tokens: int
    eos_id: int
    pad_id: int
    draft_layers: int
    draft_k: int
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    epsilon_cutoff: float = 0.0
    no_repeat_ngram_size: int = 0
    repetition_penalty: float = 1.0


def batched_speculative_sample(
    params,
    cfg: LlamaConfig,
    dec0: DecoderState,  # batch B — per-slot caches after chunk prefill
    first_logits: jnp.ndarray,  # (B, V) logits at each row's last position
    ids: jnp.ndarray,  # (B, Tp) per-row prompt ids (padded)
    prompt_lens: jnp.ndarray,  # (B,) int32
    history: jnp.ndarray,  # (B, Lh) per-row cross-chunk target ids
    history_len: jnp.ndarray,  # (B,) int32
    spec: SpecSampleSpec,
    rng: jax.Array,
    row_active: jnp.ndarray,  # (B,) bool — inactive rows emit nothing
    row_max_new: Optional[jnp.ndarray] = None,  # (B,) per-row caps <= G
    encoder_ngram_size: int = 0,
    suppress_mask: Optional[jnp.ndarray] = None,
    draft_head: Optional[dict] = None,
    exit_adapter: Optional[dict] = None,
):
    """Pooled speculative SAMPLING (Leviathan et al. 2022 / Chen et al.
    2023 rejection scheme) over the layer-skip draft: exact in
    distribution — every emitted token's conditional law equals
    single-step ancestral sampling from the PROCESSED target
    distribution (the same temperature -> penalties/ngram/suppress ->
    top-k/top-p/epsilon stack as decode/beam.sample_decode, the
    reference's --do-sample path, ref agents/infinisst.py sampling
    kwargs), independently per row, for ANY draft.  The draft only moves
    speed, exactly as in :func:`batched_speculative_greedy`; all rows
    share ONE draft stream and ONE verify stream per round.

    Per round and row: sample the anchor from the carried target
    distribution (or, after a rejection, from the residual
    max(p - q, 0)/Z — the correct conditional), sample k draft tokens
    from the draft's processed distribution q, verify all k+1 in ONE
    full weight stream, and accept draft j with probability
    min(1, p_j(x)/q_j(x)).  The first rejected position's residual
    sample becomes the NEXT round's anchor (its logits come out of this
    round's verify forward, so no extra stream is spent).  Accepted
    tokens' K/V commit during verification.

    Returns (tokens (B, G), n_tokens (B,), hit_eos (B,), dec, rounds,
    drafted (B,), accepted (B,))."""
    G = spec.max_new_tokens
    k = spec.draft_k
    d = spec.draft_layers
    B, V = first_logits.shape
    Tp = ids.shape[1]
    Tbuf = Tp + G + k  # +k staging slack, as in the greedy decoder
    if row_max_new is None:
        row_max_new = jnp.full((B,), G, jnp.int32)
    else:
        row_max_new = jnp.minimum(row_max_new, G)

    params_d, cfg_d, head_ids, head_prefix = _draft_setup(
        params, cfg, d, draft_head, exit_adapter
    )

    def process_scores(logits, seq_buf, seq_len):
        """(B, V) raw logits -> (B, V) processed + filtered log scores:
        the exact stack (and order) of decode/beam.sample_decode."""
        scores = jax.nn.log_softmax(
            lp.temperature_scale(
                logits.astype(jnp.float32), spec.temperature
            ),
            -1,
        )
        scores = lp.repetition_penalty(
            scores, seq_buf, jnp.arange(Tbuf)[None] < seq_len[:, None],
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
        scores = lp.top_k_filter(scores, spec.top_k)
        scores = lp.top_p_filter(scores, spec.top_p)
        scores = lp.epsilon_filter(scores, spec.epsilon_cutoff)
        return scores

    seq_buf0 = jnp.concatenate(
        [ids.astype(jnp.int32),
         jnp.full((B, G + k), spec.pad_id, jnp.int32)], axis=1,
    )
    act0 = row_active.astype(bool)

    def round_fn(state):
        (dec, c_lg, c_q, c_rej, key, seq_buf, seq_len, tokens, n_out,
         done, hit_eos, rounds, drafted, accepted) = state
        key, k_anchor, k_draft, k_acc = jax.random.split(key, 4)
        live = (~done) & act0

        # ---- anchor: a true sample from the correct conditional law.
        # Normal case: categorical over the processed target scores
        # (recomputed from the carried raw logits — the seq context at
        # this position is unchanged since they were produced, so the
        # processors give the identical distribution).  After a
        # rejection: the speculative-sampling residual max(p - q, 0)/Z.
        p0 = process_scores(c_lg, seq_buf, seq_len)  # (B, V)
        p0_probs = jax.nn.softmax(p0, -1)
        res = jnp.maximum(p0_probs - c_q, 0.0)
        rsum = jnp.sum(res, -1, keepdims=True)
        # rsum > 0 whenever a rejection occurred (rejection at x implies
        # q(x) > p(x), so max(q-p,0) and max(p-q,0) both carry mass);
        # the epsilon guards only numerical p == q underflow
        use_res = (c_rej & (rsum[:, 0] > 1e-12))[:, None]
        anchor_probs = jnp.where(
            use_res, res / jnp.maximum(rsum, 1e-12), p0_probs
        )
        t1 = jax.random.categorical(
            k_anchor,
            jnp.where(anchor_probs > 0, jnp.log(anchor_probs), -jnp.inf),
        ).astype(jnp.int32)  # (B,)

        # ---- draft phase: k cheap sampled steps over the first d layers
        sbuf1 = jax.vmap(lambda b, l, t: b.at[l].set(t))(seq_buf, seq_len, t1)
        ddec = DecoderState(k=dec.k[:d], v=dec.v[:d], valid_len=dec.valid_len)

        def draft_step(carry, kj):
            ddec, tok, sbuf, slen = carry
            lg, ddec = llama_mod.decode_step(
                params_d, cfg_d, ddec,
                llama_mod.embed(params_d, tok[:, None]),
            )
            raw = _shortlist_reenter(lg[:, -1], head_ids, head_prefix, V)
            qs = process_scores(raw, sbuf, slen + 1)  # (B, V)
            nxt = jax.random.categorical(kj, qs).astype(jnp.int32)
            sbuf = jax.vmap(lambda b, l, t: b.at[l + 1].set(t))(
                sbuf, slen, nxt
            )
            return (ddec, nxt, sbuf, slen + 1), (nxt, qs)

        (_, _, _, _), (drafts, q_scores) = jax.lax.scan(
            draft_step, (ddec, t1, sbuf1, seq_len),
            jax.random.split(k_draft, k),
        )  # drafts (k, B), q_scores (k, B, V)

        # ---- verify: ONE full forward over [t1, d1..dk] per row
        toks_v = jnp.concatenate([t1[None], drafts]).T  # (B, k+1)
        sbuf_v = jax.vmap(
            lambda b, t, l: jax.lax.dynamic_update_slice(b, t, (l,))
        )(seq_buf, toks_v, seq_len)
        vmask = jnp.broadcast_to(
            live[:, None], (B, k + 1)
        ).astype(jnp.int32)
        lg_v, dec_v = llama_mod.decode_step(
            params, cfg, dec,
            llama_mod.embed(params, toks_v), valid_mask=vmask,
        )  # (B, k+1, V)
        p_scores = jax.vmap(
            lambda lgj, off: process_scores(lgj, sbuf_v, seq_len + off + 1),
            in_axes=(1, 0), out_axes=0,
        )(lg_v[:, :, :V], jnp.arange(k + 1))  # (k+1, B, V)

        # ---- acceptance: accept draft j with prob min(1, p_j(x)/q_j(x))
        # (u*q < p  <=>  u < p/q for q > 0, and q(x) > 0 for any sampled
        # x); a = per-row length of the accepted prefix
        q_probs = jax.nn.softmax(q_scores, -1)  # (k, B, V)
        p_probs = jax.nn.softmax(p_scores[:k], -1)  # (k, B, V)
        q_d = jnp.take_along_axis(
            q_probs, drafts[:, :, None], axis=-1
        )[..., 0]  # (k, B)
        p_d = jnp.take_along_axis(
            p_probs, drafts[:, :, None], axis=-1
        )[..., 0]
        u = jax.random.uniform(k_acc, (k, B))
        acc = u * q_d < p_d  # (k, B)
        a = jnp.where(
            jnp.all(acc, axis=0), k, jnp.argmin(acc, axis=0)
        ).astype(jnp.int32)  # (B,)

        # ---- emission: toks_v[0..a], truncated at EOS and the cap
        # (identical rules to the greedy decoder)
        idx = jnp.arange(k + 1)[None]
        eos_in = (toks_v == spec.eos_id) & (idx <= a[:, None])
        first_eos = jnp.where(
            jnp.any(eos_in, axis=1), jnp.argmax(eos_in, axis=1), k + 1
        ).astype(jnp.int32)
        room = (row_max_new - n_out).astype(jnp.int32)
        n_r = jnp.minimum(jnp.minimum(a + 1, first_eos), room)
        n_r = jnp.where(live, n_r, 0)
        hit = jnp.any(eos_in, axis=1) & (first_eos < room) & live

        relt = jnp.arange(G)[None] - n_out[:, None]  # (B, G)
        put = jnp.take_along_axis(toks_v, jnp.clip(relt, 0, k), axis=1)
        tokens = jnp.where((relt >= 0) & (relt < n_r[:, None]), put, tokens)
        rels = jnp.arange(Tbuf)[None] - seq_len[:, None]
        puts = jnp.take_along_axis(toks_v, jnp.clip(rels, 0, k), axis=1)
        seq_buf = jnp.where(
            (rels >= 0) & (rels < n_r[:, None]), puts, seq_buf
        )

        # commit exactly the emitted tokens' K/V
        dec = dec_v._replace(valid_len=dec.valid_len + n_r)
        # carry for the next anchor: raw verify logits at the last
        # emitted position (all-accept) or the rejected position, plus
        # the rejected draft's q for the residual; frozen rows keep
        # their carry untouched
        c_lg2 = jnp.take_along_axis(
            lg_v[:, :, :V], a[:, None, None], axis=1
        )[:, 0].astype(jnp.float32)
        c_lg2 = jnp.where(live[:, None], c_lg2, c_lg)
        rej_now = (a < k) & live
        qa = jnp.take_along_axis(
            q_probs, jnp.minimum(a, k - 1)[None, :, None], axis=0
        )[0]  # (B, V)
        c_q2 = jnp.where(rej_now[:, None], qa, c_q)
        c_rej2 = jnp.where(live, a < k, c_rej)

        n_out2 = n_out + n_r
        done2 = done | hit | (n_out2 >= row_max_new)
        return (
            dec, c_lg2, c_q2, c_rej2, key, seq_buf, seq_len + n_r,
            tokens, n_out2, done2, hit_eos | hit, rounds + 1,
            drafted + jnp.where(live, k, 0),
            accepted + jnp.maximum(n_r - 1, 0),
        )

    zb = jnp.zeros((B,), jnp.int32)
    state0 = (
        dec0, first_logits.astype(jnp.float32),
        jnp.zeros((B, V), jnp.float32), jnp.zeros((B,), bool), rng,
        seq_buf0, prompt_lens.astype(jnp.int32),
        jnp.full((B, G), spec.pad_id, jnp.int32), zb,
        ~act0, jnp.zeros((B,), bool),
        jnp.zeros((), jnp.int32), zb, zb,
    )
    state = jax.lax.while_loop(
        lambda s: jnp.any(~s[9]), round_fn, state0
    )
    (dec, _, _, _, _, _, _, tokens, n_out, _, hit_eos, rounds, drafted,
     accepted) = state
    return tokens, n_out, hit_eos, dec, rounds, drafted, accepted


def speculative_sample(
    params,
    cfg: LlamaConfig,
    prefix: DecoderState,  # batch 1 — cache after chunk prefill
    first_logits: jnp.ndarray,  # (V,) logits at the last prefill position
    prompt_buf: jnp.ndarray,  # (Tp,) this call's prompt ids (static len)
    prompt_len: jnp.ndarray,  # scalar int32 <= Tp
    history: jnp.ndarray,  # (Lh,) cross-chunk target ids
    history_len: jnp.ndarray,  # scalar int32
    spec: SpecSampleSpec,
    rng: jax.Array,
    encoder_ngram_size: int = 0,
    suppress_mask: Optional[jnp.ndarray] = None,
    draft_head: Optional[dict] = None,
    exit_adapter: Optional[dict] = None,
) -> SpecResult:
    """Single-stream wrapper over :func:`batched_speculative_sample`
    (B=1) — one copy of the rejection/residual arithmetic lives in the
    batched implementation.  Used by the agent's --speculative
    --do-sample mode (the reference's DPO data-collection flow)."""
    pl = jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32))
    hl = jnp.atleast_1d(jnp.asarray(history_len, jnp.int32))
    tokens, n_out, hit_eos, dec, rounds, drafted, accepted = (
        batched_speculative_sample(
            params, cfg, prefix, first_logits[None],
            prompt_buf[None], pl, history[None], hl, spec, rng,
            row_active=jnp.ones((1,), bool),
            encoder_ngram_size=encoder_ngram_size,
            suppress_mask=suppress_mask,
            draft_head=draft_head,
            exit_adapter=exit_adapter,
        )
    )
    return SpecResult(
        tokens=tokens[0], n_tokens=n_out[0], hit_eos=hit_eos[0],
        rounds=rounds, drafted=drafted[0], accepted=accepted[0], dec=dec,
    )


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
    draft_head: Optional[dict] = None,
    exit_adapter: Optional[dict] = None,
) -> SpecResult:
    """Single-stream wrapper over :func:`batched_speculative_greedy`
    (B=1) — one copy of the accept/emit arithmetic lives in the batched
    implementation."""
    pl = jnp.atleast_1d(jnp.asarray(prompt_len, jnp.int32))
    hl = jnp.atleast_1d(jnp.asarray(history_len, jnp.int32))
    tokens, n_out, hit_eos, dec, rounds, drafted, accepted = (
        batched_speculative_greedy(
            params, cfg, prefix, first_logits[None],
            prompt_buf[None], pl, history[None], hl, spec,
            row_active=jnp.ones((1,), bool),
            encoder_ngram_size=encoder_ngram_size,
            suppress_mask=suppress_mask,
            draft_head=draft_head,
            exit_adapter=exit_adapter,
        )
    )
    return SpecResult(
        tokens=tokens[0], n_tokens=n_out[0], hit_eos=hit_eos[0],
        rounds=rounds, drafted=drafted[0], accepted=accepted[0], dec=dec,
    )
