"""Early-exit draft adapter distillation for speculative decoding.

The layer-skip draft (decode/speculative.py) scores next tokens with the
target's first d layers + lm_head.  Its acceptance rate — the whole
speedup (docs/spec_acceptance.json: held-out 0.21-0.41 at d/L 0.25-0.75
on a trained model) — is limited by how far the layer-d hidden is from
the final hidden.  This module closes that gap with a small residual
adapter h -> h + W2 silu(W1 rmsnorm(h)) applied pre-final_ln on the DRAFT
path only (models/llama.apply_exit_adapter), distilled to match the full
model's next-token distribution.  The backbone is frozen; the target
model's own outputs are untouched, and speculative decoding stays exactly
greedy for any adapter (the verify forward never sees it) — a bad adapter
only costs acceptance.

Recipe (LayerSkip-style self-distillation, adapter-only):
  1. ``collect_targets`` — one offline teacher pass caches (h_d, teacher
     logits) for a batch of token sequences; for a real checkpoint this
     is an offline feature dump over transcripts (no labels needed).
  2. ``distill`` — Adam on the adapter alone, KL(teacher || draft)
     through final_ln + lm_head; reports top-1 agreement (the acceptance
     proxy) each log interval.
  3. ``save_adapter`` / ``load_adapter`` — npz with the draft depth d
     baked in so an adapter can never silently run at the wrong depth.

Distill on SELF-GENERATED text, not (only) corpus text.  The draft is
queried at rollout positions — contexts the target model itself
produced — and an adapter fit on teacher-forced corpus text does not
transfer there (exposure bias).  Measured on the synthetic trained-tiny
model (docs/spec_acceptance.json adapter rows, tests/test_draft_adapter
in-distribution test): corpus-teacher-forced distillation reaches
top-1 agreement ~1.0 on its batch yet leaves production acceptance at
(or below) the no-adapter level, while distilling on ``rollout_corpus``
output covering the deployment prompts lifts d=1 acceptance 0.04 ->
0.47 and tokens/round 1.15 -> 2.87 through the production speculative
path.  Deployment recipe for a real checkpoint: decode a few hours of
in-domain transcripts with the target model and distill on those
outputs — the adapter must see the serving distribution.  (Caveat
measured at tiny scale: rollouts from *disjoint* random prompts do not
transfer on this structureless synthetic corpus — there is nothing to
generalize over; real text shares linguistic structure, which is the
LayerSkip/EAGLE operating regime.)

The reference has no speculative path; this is a TPU-native extension
(the decode loop it accelerates replaces transformers greedy_search
semantics, ref agents/infinisst.py:320-368).
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from infinisst_tpu.core.config import LlamaConfig
from infinisst_tpu.models import llama as llama_mod

Adapter = dict


def init_exit_adapter(
    key: jax.Array, cfg: LlamaConfig, rank: Optional[int] = None,
    dtype=jnp.float32,
) -> Adapter:
    """Zero-output init: the fresh adapter is an exact identity, so
    plugging it in before training reproduces raw layer-skip behavior
    bit-for-bit.  ``rank`` defaults to hidden_size/2 (at 8B: D=4096,
    r=2048 -> 33 MB bf16, ~1.6% of one decoder layer's stream)."""
    D = cfg.hidden_size
    r = rank or D // 2
    return {
        "ln": jnp.ones((D,), dtype),
        "w1": (jax.random.normal(key, (D, r), dtype) / np.sqrt(D)),
        "w2": jnp.zeros((r, D), dtype),
    }


def draft_logits(
    params, cfg: LlamaConfig, adapter: Optional[Adapter], h_d: jnp.ndarray
) -> jnp.ndarray:
    """Draft head over a layer-d hidden: adapter -> final_ln -> lm_head.
    Mirrors the production draft tail in llama.decode_step exactly."""
    h = h_d
    if adapter is not None:
        h = llama_mod.apply_exit_adapter(adapter, h, cfg.rms_norm_eps)
    h = llama_mod._rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    return h @ params["lm_head"]


def collect_targets(
    params, cfg: LlamaConfig, ids: jnp.ndarray, d: int,
    attention_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher pass over token ids (B, S): returns (h_d (B, S, D), teacher
    logits (B, S, V)), both stop-gradiented.  The first d layers are
    computed once and continued to depth L, not recomputed."""
    x = llama_mod.embed(params, ids)
    return collect_targets_x(params, cfg, x, d, attention_mask)


def collect_targets_x(
    params, cfg: LlamaConfig, x: jnp.ndarray, d: int,
    attention_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """collect_targets over precomputed input EMBEDDINGS (B, S, D) —
    e.g. speech-spliced sequences from the speech-LLM
    (speech_llm.offline_spliced_embeddings), so the adapter can be
    distilled on the streaming agent's actual serving context (speech
    patches + self-decoded text) rather than text-only prefixes."""
    h_d = llama_mod.offline_hidden(
        params, cfg, x, attention_mask, num_layers=d
    )
    rest = {
        "layers": jax.tree.map(lambda a: a[d:], params["layers"]),
    }
    h_L = llama_mod._offline_scan(
        rest["layers"], cfg, h_d, attention_mask, remat=False
    )
    h_L = llama_mod._rms_norm(h_L, params["final_ln"], cfg.rms_norm_eps)
    teacher = h_L @ params["lm_head"]
    return jax.lax.stop_gradient(h_d), jax.lax.stop_gradient(teacher)


@functools.partial(jax.jit, static_argnames=("cfg", "gen_len"))
def _rollout(params, cfg: LlamaConfig, prompts: jnp.ndarray, gen_len: int):
    """Jitted rollout body: params is a traced input, so repeated calls
    with same-shaped batches reuse ONE compiled executable (jax.jit's
    own cache keys on shapes + the static (cfg, gen_len))."""
    from infinisst_tpu.streaming.state import init_decoder_state

    B, P = prompts.shape
    st = init_decoder_state(
        cfg.num_layers, B, P + gen_len + 1, cfg.num_kv_heads,
        cfg.head_dim, params["lm_head"].dtype,
    )
    lg, st = llama_mod.decode_step(
        params, cfg, st, llama_mod.embed(params, prompts)
    )
    first = jnp.argmax(lg[:, -1, : cfg.vocab_size], -1).astype(jnp.int32)

    def body(carry, _):
        tok, st = carry
        lg, st = llama_mod.decode_step(
            params, cfg, st, llama_mod.embed(params, tok[:, None])
        )
        nxt = jnp.argmax(
            lg[:, -1, : cfg.vocab_size], -1
        ).astype(jnp.int32)
        return (nxt, st), tok

    _, toks = jax.lax.scan(body, (first, st), None, length=gen_len)
    return jnp.concatenate([prompts, toks.T], axis=1)


def rollout_corpus(
    params, cfg: LlamaConfig, prompts: jnp.ndarray, gen_len: int,
) -> jnp.ndarray:
    """Greedy continuations from the TARGET model: (B, P) int32 prompts
    -> (B, P + gen_len) token ids.  This is the distillation corpus that
    matches the draft's deployment distribution (the draft is only ever
    queried at positions the target itself produced) — see the module
    docstring's exposure-bias note.  Incremental decode (one prefill +
    gen_len cached steps); one compile per (B, P, gen_len) across ALL
    calls (tools_distill_adapter loops over many batches)."""
    if isinstance(params["lm_head"], dict):
        raise ValueError("rollout_corpus needs unquantized params")
    return _rollout(params, cfg, jnp.asarray(prompts, jnp.int32), gen_len)


def _loss(adapter, params, cfg, h_d, teacher, mask):
    lg = draft_logits(params, cfg, adapter, h_d).astype(jnp.float32)
    t = teacher.astype(jnp.float32)
    p_t = jax.nn.softmax(t, axis=-1)
    kl = jnp.sum(
        p_t * (jax.nn.log_softmax(t, -1) - jax.nn.log_softmax(lg, -1)), -1
    )
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (kl * mask).sum() / denom
    agree = (
        ((jnp.argmax(lg, -1) == jnp.argmax(t, -1)) * mask).sum() / denom
    )
    return loss, agree


def distill(
    params,
    cfg: LlamaConfig,
    d: int,
    batches: Iterable[jnp.ndarray],  # (B, S) int32 token ids
    *,
    steps: int,
    lr: float = 1e-3,
    rank: Optional[int] = None,
    key: Optional[jax.Array] = None,
    pad_id: int = -1,
    log_every: int = 0,
    max_cached_batches: int = 4,
) -> Tuple[Adapter, list]:
    """Distill an exit adapter at draft depth ``d``.  ``batches`` is
    cycled for ``steps`` Adam updates; positions equal to ``pad_id`` are
    masked out of the loss.  Teacher features are cached per distinct
    batch object (one teacher pass each), so epochs over a SMALL corpus
    pay the full forward once; the cache is LRU-bounded by
    ``max_cached_batches`` because each entry holds full-vocab (B, S, V)
    f32 teacher logits (~0.7 GB per batch at 8B/V=128k) — many-batch
    corpora recompute the teacher forward per visit instead of OOMing.

    Returns (adapter, history) with history entries
    (step, kl, top1_agreement)."""
    if isinstance(params["lm_head"], dict):
        raise ValueError(
            "distill() needs unquantized (bf16/f32) params: the int8 "
            "activation rounding has zero gradient.  Distill on the "
            "float checkpoint; the adapter then rides the quantized "
            "draft path unchanged."
        )
    key = jax.random.PRNGKey(0) if key is None else key
    adapter = init_exit_adapter(key, cfg, rank, jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(adapter)

    @jax.jit
    def teacher_fn(ids, mask):
        return collect_targets(params, cfg, ids, d, mask)

    @jax.jit
    def step_fn(adapter, opt_state, h_d, teacher, mask):
        (loss, agree), grads = jax.value_and_grad(
            _loss, has_aux=True
        )(adapter, params, cfg, h_d, teacher, mask)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(adapter, updates), opt_state, loss, agree

    from collections import OrderedDict

    cache: OrderedDict = OrderedDict()
    batch_list = list(batches)
    history = []
    for i in range(steps):
        ids = batch_list[i % len(batch_list)]
        bid = id(ids)
        if bid in cache:
            cache.move_to_end(bid)
        else:
            ids = jnp.asarray(ids, jnp.int32)
            mask = (ids != pad_id).astype(jnp.float32)
            cache[bid] = (*teacher_fn(ids, mask), mask)
            while len(cache) > max(1, max_cached_batches):
                cache.popitem(last=False)
        h_d, teacher, mask = cache[bid]
        adapter, opt_state, loss, agree = step_fn(
            adapter, opt_state, h_d, teacher, mask
        )
        if log_every and (i % log_every == 0 or i == steps - 1):
            history.append((i, float(loss), float(agree)))
    return adapter, history


def distill_on_features(
    params,
    cfg: LlamaConfig,
    feats,  # list of (h_d (B,S,D), teacher (B,S,V), mask (B,S)) triples
    *,
    steps: int,
    lr: float = 1e-3,
    rank: Optional[int] = None,
    key: Optional[jax.Array] = None,
    log_every: int = 0,
) -> Tuple[Adapter, list]:
    """:func:`distill` over PRECOLLECTED teacher features — the entry
    point for serving-context distillation: collect (h_d, teacher) with
    :func:`collect_targets_x` over speech-SPLICED embeddings (the
    streaming agent's real context: speech patches + self-decoded text,
    speech_llm.offline_spliced_embeddings) with ``mask`` restricted to
    the decode positions the draft is actually queried at, then fit the
    adapter here.  The draft depth is baked into ``h_d`` by the collect
    pass.  Returns (adapter, history) like :func:`distill`."""
    key = jax.random.PRNGKey(0) if key is None else key
    adapter = init_exit_adapter(key, cfg, rank, jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(adapter)

    @jax.jit
    def step_fn(adapter, opt_state, h_d, teacher, mask):
        (loss, agree), grads = jax.value_and_grad(
            _loss, has_aux=True
        )(adapter, params, cfg, h_d, teacher, mask)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(adapter, updates), opt_state, loss, agree

    history = []
    for i in range(steps):
        h_d, teacher, mask = feats[i % len(feats)]
        adapter, opt_state, loss, agree = step_fn(
            adapter, opt_state, h_d, teacher, mask
        )
        if log_every and (i % log_every == 0 or i == steps - 1):
            history.append((i, float(loss), float(agree)))
    return adapter, history


def beam_rollout_states(
    params, cfg: LlamaConfig, prompt: jnp.ndarray, gen_len: int,
    beam: int = 4,
):
    """Beam rollout from the TARGET model recording per-step SELECTION
    states — the distillation corpus for speculative BEAM drafts.

    Spec-beam (decode/spec_beam.py) accepts a draft round only when the
    whole top-B selection over (B x V) flattened candidates matches the
    target's, which depends on calibrated score ORDERING across beams at
    beam-hypothesis prefixes — neither of which greedy-rollout KL
    distillation trains (measured: greedy-token agreement 0.87 with the
    rollout adapter, beam-selection acceptance 0.05-0.13;
    docs/spec_acceptance.json).  Study conditions: no EOS, no logits
    processors (matching tools_spec_acceptance's beam rows).

    Returns a list of per-step dicts: ``buf`` (B, P+gen_len) int32 padded
    prefixes, ``len`` int, ``beam_scores`` (B,), ``sel_beam``/``sel_tok``
    (B,) — the teacher's selection FROM that state.
    """
    from infinisst_tpu.decode.beam import NEG_INF, select_candidates

    B = beam
    P = int(prompt.shape[0])
    S = P + gen_len
    buf = jnp.zeros((B, S), jnp.int32).at[:, :P].set(
        jnp.asarray(prompt, jnp.int32)[None]
    )
    beam_scores = jnp.asarray(
        [0.0] + [float(NEG_INF)] * (B - 1), jnp.float32
    )

    @jax.jit
    def step_logp(buf, ln):
        # causal attention: positions >= ln never influence position
        # ln - 1, so the padded tail needs no mask
        h = llama_mod.offline_hidden(
            params, cfg, llama_mod.embed(params, buf), None
        )
        h_last = jnp.take_along_axis(
            h, (ln - 1)[None, None, None].repeat(B, 0), axis=1
        )[:, 0]
        h_last = llama_mod._rms_norm(
            h_last, params["final_ln"], cfg.rms_norm_eps
        )
        logits = (h_last @ params["lm_head"])[:, : cfg.vocab_size]
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1)

    samples = []
    ln = P
    for _ in range(gen_len):
        logp = step_logp(buf, jnp.asarray(ln, jnp.int32))
        total, _vals, cbeam, ctok = select_candidates(logp, beam_scores)
        sel_beam, sel_tok = cbeam[:B], ctok[:B]  # no EOS: first B live
        samples.append({
            "buf": np.asarray(buf),
            "len": ln,
            "beam_scores": np.asarray(beam_scores),
            "sel_beam": np.asarray(sel_beam),
            "sel_tok": np.asarray(sel_tok),
        })
        buf = buf[sel_beam].at[:, ln].set(sel_tok)
        beam_scores = total[sel_beam, sel_tok]
        ln += 1
    return samples


def beam_selection_distill(
    params,
    cfg: LlamaConfig,
    d: int,
    samples: list,  # beam_rollout_states output (equal-shape steps)
    *,
    steps: int,
    lr: float = 2e-3,
    rank: Optional[int] = None,
    key: Optional[jax.Array] = None,
    batch: int = 32,
    log_every: int = 0,
) -> Tuple[Adapter, list]:
    """Listwise SELECTION distillation for the spec-beam draft adapter.

    Loss per recorded beam state: cross-entropy of the teacher's selected
    (src_beam, token) pairs under the draft's flattened candidate
    distribution softmax over B x V of (beam_scores + draft log-probs) —
    directly optimising the event spec_beam verifies (whole-selection
    match), on beam-hypothesis prefixes (the deployment distribution of
    a beam draft).  Reports exact whole-selection agreement as the
    acceptance proxy.  Backbone frozen; draft-only, exactness untouched.

    Returns (adapter, history) with entries (step, ce, selection_agree).
    """
    if isinstance(params["lm_head"], dict):
        raise ValueError("beam_selection_distill needs unquantized params")
    key = jax.random.PRNGKey(0) if key is None else key
    adapter = init_exit_adapter(key, cfg, rank, jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(adapter)

    bufs = jnp.asarray(np.stack([s["buf"] for s in samples]))  # (N, B, S)
    lens = jnp.asarray([s["len"] for s in samples], jnp.int32)  # (N,)
    scores = jnp.asarray(np.stack([s["beam_scores"] for s in samples]))
    selb = jnp.asarray(np.stack([s["sel_beam"] for s in samples]))
    selt = jnp.asarray(np.stack([s["sel_tok"] for s in samples]))
    N, B, S = bufs.shape
    V = cfg.vocab_size

    @jax.jit
    def feats(bufs, lens):
        # teacher layer-d hiddens at the last valid position, per beam
        x = llama_mod.embed(params, bufs.reshape(N * B, S))
        h = llama_mod.offline_hidden(params, cfg, x, None, num_layers=d)
        h = h.reshape(N, B, S, -1)
        idx = (lens - 1)[:, None, None, None]
        return jax.lax.stop_gradient(
            jnp.take_along_axis(h, idx.repeat(B, 1), axis=2)[:, :, 0]
        )  # (N, B, D)

    h_d = feats(bufs, lens)

    def _loss(adapter, h, sc, sb, st_):
        hh = llama_mod.apply_exit_adapter(adapter, h, cfg.rms_norm_eps)
        hh = llama_mod._rms_norm(hh, params["final_ln"], cfg.rms_norm_eps)
        logp = jax.nn.log_softmax(
            (hh @ params["lm_head"])[..., :V].astype(jnp.float32), -1
        )
        flat = (sc[..., None] + logp).reshape(-1, B * V)
        idx = sb * V + st_  # (n, B)
        lsm = jax.nn.log_softmax(flat, -1)
        ce = -jnp.take_along_axis(lsm, idx, axis=-1).mean()
        # exact whole-selection agreement (the spec-beam accept event):
        # the draft's top-B flattened candidates == the teacher's set
        top = jax.lax.top_k(flat, B)[1]  # (n, B)
        match = (jnp.sort(top, -1) == jnp.sort(idx, -1)).all(-1)
        return ce, match.mean()

    @jax.jit
    def step_fn(adapter, opt_state, h, sc, sb, st_):
        (ce, agree), grads = jax.value_and_grad(_loss, has_aux=True)(
            adapter, h, sc, sb, st_
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(adapter, updates), opt_state, ce, agree

    history = []
    rng = np.random.RandomState(0)
    for i in range(steps):
        sel = rng.choice(N, size=min(batch, N), replace=False)
        sel = jnp.asarray(np.sort(sel))
        adapter, opt_state, ce, agree = step_fn(
            adapter, opt_state, h_d[sel], scores[sel], selb[sel],
            selt[sel],
        )
        if log_every and (i % log_every == 0 or i == steps - 1):
            history.append((i, float(ce), float(agree)))
    return adapter, history


def save_adapter(path: str, adapter: Adapter, d: int) -> None:
    """npz with the draft depth baked in (load_adapter validates it)."""
    np.savez(
        path,
        ln=np.asarray(adapter["ln"]),
        w1=np.asarray(adapter["w1"]),
        w2=np.asarray(adapter["w2"]),
        draft_layers=np.int32(d),
    )


def load_adapter(
    path: str, expect_d: Optional[int] = None, dtype=None
) -> Adapter:
    """Load an adapter npz; refuses a depth mismatch (an adapter trained
    at d=4 applied at d=8 would silently halve acceptance)."""
    z = np.load(path)
    d = int(z["draft_layers"])
    if expect_d is not None and d != expect_d:
        raise ValueError(
            f"adapter {path} was distilled for draft_layers={d}, but the "
            f"decoder is configured with draft_layers={expect_d}"
        )
    out = {k: jnp.asarray(z[k]) for k in ("ln", "w1", "w2")}
    if dtype is not None:
        out = jax.tree.map(lambda a: a.astype(dtype), out)
    return out
