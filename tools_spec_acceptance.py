"""Layer-skip speculative ACCEPTANCE on a trained model (no checkpoints).

The recorded speculative rows bracket an envelope: acceptance 0 (random
weights, pure overhead) to acceptance 1 (--spec-accept-all ceiling).
Where inside that envelope a real checkpoint lands is set by one number —
the layer-skip draft's acceptance rate — which cannot be measured on
random weights because their draft/target argmaxes are uncorrelated.

This tool trains the same small 128-divisible llama as
tools_quant_fidelity.py to convergence (peaked, *correlated* layerwise
representations — the regime real checkpoints live in), then measures
through the PRODUCTION path (decode/speculative.speculative_greedy):

  - acceptance rate per draft depth d/L in {1/4, 2/4, 3/4, 4/4}
  - emitted tokens per verify round (the speedup driver: each round costs
    one draft stream * k + one verify stream)
  - the same with a distilled early-exit adapter (train/draft.py) at
    d=1 and d=2, in three distillation regimes:
      adapter(corpus-TF)  — teacher-forced corpus text: the exposure-
                            bias negative control (agreement ~1.0 on its
                            batch, production acceptance does NOT rise)
      adapter(rollout)    — self-generated text covering the measured
                            prompts (the deployable recipe: distill on
                            the target's own decoded transcripts) — the
                            in-distribution acceptance lift
      adapter(rollout-x)  — self-generated text from DISJOINT prompts:
                            on this structureless synthetic corpus there
                            is nothing to generalize over, so the lift
                            does not transfer (tiny-scale caveat; real
                            text shares linguistic structure)
    plus adapter(rollout) composed with the ranked shortlist
  - the same with a shortlist draft head (make_draft_head) at 1/4 and
    1/8 vocab width, in TWO modes: "prefix" (first ids — on this
    synthetic corpus the token ids are uniform, so this is the
    worst-case zero-coverage-skew shortlist; on a real merge-ordered BPE
    vocab the id prefix IS roughly frequency-ranked) and "ranked"
    (corpus-frequency-ranked ids, what `make_draft_head(ids=...)` is for
    — the analogue of the BPE id prefix's coverage on real text)
  - greedy prefix agreement vs a single-step sequential rollout, as an
    FYI only: the verify forward computes k+1 positions in one batched
    decode_step, whose float accumulation order differs from the
    single-token reference — on an overfit model whose off-distribution
    top-2 margins dip to ~0.06 logits, sub-1e-5 logit deltas flip
    near-ties and the rollouts legitimately fork.  Bit-exactness of the
    accept/emit machinery at equal compute granularity is proven in
    tests/test_speculative.py; acceptance rates here are measured on the
    spec path's own rollouts and are unaffected by tie forks.

Both teacher-distribution (training-like prefixes) and held-out
(model-generated continuations from unseen prefixes) streams are
measured; the held-out rows are the informative ones.  Caveat recorded in
the output: a 4-layer overfit model is an optimistic analogue for depth
ratios, not a BLEU-grade prediction — but it turns "acceptance unknown"
into "acceptance at d/L=0.5 on a trained model = X".

Usage:  JAX_PLATFORMS=cpu python tools_spec_acceptance.py \
            [--steps 600] [--json docs/spec_acceptance.json]
Runs on CPU in ~8 min (6 adapter distillations dominate).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from infinisst_tpu.decode.speculative import (
    SpecSpec,
    make_draft_head,
    make_lowrank_draft_head,
    speculative_greedy,
)
from infinisst_tpu.models import llama as L
from infinisst_tpu.streaming.state import init_decoder_state
from tools_quant_fidelity import CFG, greedy_rollout, make_corpus, train

G = 32  # tokens per stream


_JIT_CACHE = {}


def run_spec(params, prompt, d: int, k: int, head_vocab: int = 0,
             head_ids=None, adapter=None, adapter_tag="",
             lowrank: int = 0):
    """One speculative_greedy rollout; returns (tokens, rounds, drafted,
    accepted).  The jitted closure is cached per (d, k, hv, prompt_len)
    so the 6 streams of a split share one compile."""
    key = (d, k, head_vocab, prompt.shape[0], adapter_tag, lowrank,
           None if head_ids is None else tuple(np.asarray(head_ids)))
    if key not in _JIT_CACHE:
        spec = SpecSpec(
            max_new_tokens=G, eos_id=-1, pad_id=0, draft_layers=d,
            draft_k=k, no_repeat_ngram_size=0, repetition_penalty=1.0,
        )
        if lowrank:
            dh = make_lowrank_draft_head(params["lm_head"], lowrank)
        else:
            dh = (
                make_draft_head(params["lm_head"], head_vocab,
                                ids=head_ids)
                if head_vocab else None
            )
        hist = jnp.zeros((8,), jnp.int32)

        @jax.jit
        def fn(st, first, prompt):
            return speculative_greedy(
                params, CFG, st, first, prompt,
                jnp.asarray(prompt.shape[0], jnp.int32), hist,
                jnp.asarray(0, jnp.int32), spec, draft_head=dh,
                exit_adapter=adapter,
            )

        _JIT_CACHE[key] = fn
    st = init_decoder_state(
        CFG.num_layers, 1, prompt.shape[0] + G + k + 1, CFG.num_kv_heads,
        CFG.head_dim, params["embed"].dtype,
    )
    logits, st = L.decode_step(params, CFG, st, L.embed(params, prompt[None]))
    res = jax.device_get(
        _JIT_CACHE[key](st, logits[0, -1, : CFG.vocab_size], prompt)
    )
    toks = res.tokens[: int(res.n_tokens)].tolist()
    return toks, int(res.rounds), int(res.drafted), int(res.accepted)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--distill-steps", type=int, default=400)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--only-beam", action="store_true",
                    help="run only the spec-beam sections (baseline beam "
                         "rows + the beam-aware listwise adapter regime) "
                         "and MERGE rows into an existing --json artifact")
    ap.add_argument("--beam-distill-steps", type=int, default=600)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    corpus = make_corpus(rng, n_seq=8, S=64)
    params = L.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    print("training tiny llama...", file=sys.stderr)
    params = train(params, corpus, args.steps)

    # teacher-distribution prompts: prefixes of training-rule sequences
    # from fresh seeds; held-out prompts: unseen random-rule prefixes
    teach = [
        jnp.asarray(make_corpus(np.random.RandomState(200 + i), 1, 12)[0])
        for i in range(6)
    ]
    held = [
        jnp.asarray(make_corpus(np.random.RandomState(100 + i), 1, 8)[0])
        for i in range(6)
    ]

    # greedy references (production processors off, matching run_spec)
    refs = {}
    if not args.only_beam:
        for tag, prompts in (("teach", teach), ("held", held)):
            refs[tag] = [greedy_rollout(params, p, 32) for p in prompts]

    results = {
        "config": f"llama D=256 I=512 L=4 V=512 f32-trained "
                  f"({args.steps} steps); G={G} tokens/stream, 6 streams "
                  "per split",
        "caveat": "4-layer overfit model: depth-ratio analogue, "
                  "optimistic vs a real 8B checkpoint; the held rows are "
                  "the informative ones",
        "rows": [],
    }
    # corpus-frequency-ranked ids: the synthetic analogue of a real BPE
    # vocab's merge-ordered id prefix (high-coverage shortlist)
    freq = np.bincount(corpus.ravel(), minlength=CFG.vocab_size)
    ranked = np.argsort(-freq).astype(np.int32)
    variants = [("full", 0)]
    for hv in (CFG.vocab_size // 4, CFG.vocab_size // 8):
        variants += [("prefix", hv), ("ranked", hv)]

    def measure(d, k, hv, mode, head_ids=None, adapter=None, tag_a="",
                lowrank=0):
        row = {
            "d_over_L": round(d / CFG.num_layers, 2),
            "draft_layers": d, "draft_k": k,
            "head_vocab": hv or CFG.vocab_size,
            "head_mode": mode,
        }
        for tag, prompts in (("teach", teach), ("held", held)):
            rounds = drafted = accepted = emitted = 0
            match = []
            for p, ref in zip(prompts, refs[tag]):
                toks, r, dr, ac = run_spec(
                    params, p, d, k, hv, head_ids=head_ids,
                    adapter=adapter, adapter_tag=tag_a, lowrank=lowrank,
                )
                assert len(toks) == G, (d, k, hv, toks)
                match.append(next(
                    (i for i, (a, b) in enumerate(zip(toks, ref))
                     if a != b),
                    G,
                ))
                rounds += r
                drafted += dr
                accepted += ac
                emitted += len(toks)
            row[f"{tag}_accept_rate"] = round(accepted / drafted, 4)
            row[f"{tag}_tok_per_round"] = round(emitted / rounds, 3)
            row[f"{tag}_greedy_prefix_match"] = match
        results["rows"].append(row)
        print(json.dumps(row), file=sys.stderr)

    def release_compiles():
        """Drop accumulated executables between variant families: ~100
        distinct jitted closures otherwise pile up in one process and
        LLVM eventually fails its arena allocation (observed at ~75
        compiles: 'LLVM compilation error: Cannot allocate memory')."""
        _JIT_CACHE.clear()
        jax.clear_caches()

    if not args.only_beam:
        for d in (1, 2, 3, 4):
            for k in (4, 9):
                for mode, hv in variants:
                    head_ids = (
                        jnp.asarray(ranked[:hv]) if mode == "ranked" and hv
                        else None
                    )
                    measure(d, k, hv, mode, head_ids=head_ids)
            release_compiles()

        # low-rank draft head (truncated SVD of the trained head): the
        # acceptance cost of rank truncation, complementing the hardware
        # machinery rows (the factors cut the dominant draft head stream)
        for d in (1, 2, 4):
            for rank in (CFG.hidden_size // 2, CFG.hidden_size // 4):
                for k in (4, 9):
                    measure(d, k, 0, f"lowrank{rank}", lowrank=rank)
            release_compiles()

    # speculative BEAM search (decode/spec_beam.py): acceptance counts
    # whole B-beam selections, which is stricter than greedy token
    # matching — these rows quantify the gap at equal draft depth
    from infinisst_tpu.decode.beam import BeamSpec
    from infinisst_tpu.decode.spec_beam import spec_beam_search

    def run_beam(d, k, prompt, adapter=None, tag_a=""):
        key = ("beam", d, k, prompt.shape[0], tag_a)
        if key not in _JIT_CACHE:
            bs = BeamSpec(
                beam=4, max_new_tokens=G, eos_id=-1, pad_id=0,
                no_repeat_ngram_size=0, repetition_penalty=1.0,
            )

            @jax.jit
            def fn(st, first, prompt):
                return spec_beam_search(
                    params, CFG, st, first, prompt,
                    jnp.asarray(prompt.shape[0], jnp.int32),
                    jnp.zeros((8,), jnp.int32), jnp.asarray(0, jnp.int32),
                    bs, draft_layers=d, draft_k=k, exit_adapter=adapter,
                )

            _JIT_CACHE[key] = fn
        st = init_decoder_state(
            CFG.num_layers, 1, prompt.shape[0] + G + k + 1,
            CFG.num_kv_heads, CFG.head_dim, params["embed"].dtype,
        )
        lg, st = L.decode_step(
            params, CFG, st, L.embed(params, prompt[None])
        )
        res = jax.device_get(
            _JIT_CACHE[key](st, lg[0, -1, : CFG.vocab_size], prompt)
        )
        return int(res.steps), int(res.rounds), int(res.drafted), int(
            res.accepted
        )

    def measure_beam(d, kk, mode, adapter=None, tag_a=""):
        row = {
            "d_over_L": round(d / CFG.num_layers, 2),
            "draft_layers": d, "draft_k": kk,
            "head_vocab": CFG.vocab_size, "head_mode": mode,
        }
        for tag, prompts in (("teach", teach), ("held", held)):
            steps = rounds = drafted = accepted = 0
            for p in prompts:
                s_, r_, dr_, ac_ = run_beam(
                    d, kk, p, adapter=adapter, tag_a=tag_a
                )
                steps += s_
                rounds += r_
                drafted += dr_
                accepted += ac_
            row[f"{tag}_accept_rate"] = round(
                accepted / max(drafted, 1), 4
            )
            row[f"{tag}_steps_per_round"] = round(
                steps / max(rounds, 1), 3
            )
        results["rows"].append(row)
        print(json.dumps(row), file=sys.stderr)

    if args.only_beam:
        # same-process baseline for the beam-aware regime (the model is
        # retrained from identical seeds, but near-ties can fork across
        # processes on an overfit model)
        for d in (1, 2):
            for kk in (2, 4):
                measure_beam(d, kk, "beam4(rebaseline)")
        release_compiles()
    else:
        for d in (1, 2, 3, 4):
            for kk in (2, 4):
                measure_beam(d, kk, "beam4")
            release_compiles()

    from infinisst_tpu.train import draft as DR

    # beam-aware LISTWISE adapter (train/draft.beam_selection_distill):
    # roll out BEAM states with the target, then distill the adapter on
    # the SELECTION event spec_beam actually verifies — cross-entropy of
    # the teacher's chosen (src_beam, token) pairs under the draft's
    # flattened candidate softmax — on beam-hypothesis prefixes.  The
    # greedy-rollout KL adapter reached greedy agreement 0.87 yet lifted
    # beam acceptance only to 0.085 (whole-selection matching needs
    # cross-beam score ordering, not argmax agreement); this regime is
    # the VERDICT-r3 #5 experiment: does a beam-aware draft make
    # spec-beam pay?
    roll_beam = []
    for p in list(teach) + list(held):
        roll_beam.extend(
            DR.beam_rollout_states(params, CFG, p, G, beam=4)
        )
    S_max = max(s["buf"].shape[1] for s in roll_beam)
    for s in roll_beam:
        pad = S_max - s["buf"].shape[1]
        if pad:
            s["buf"] = np.pad(s["buf"], ((0, 0), (0, pad)))
    for d in (1, 2):
        print(f"beam-listwise distilling d={d}...", file=sys.stderr)
        adapter_b, hist_b = DR.beam_selection_distill(
            params, CFG, d, roll_beam, steps=args.beam_distill_steps,
            lr=2e-3, key=jax.random.PRNGKey(60 + d), log_every=100,
        )
        results[f"beam_distill_d{d}"] = [
            {"step": s_, "ce": round(l_, 4),
             "selection_agree": round(a_, 4)}
            for s_, l_, a_ in hist_b
        ]
        for kk in (2, 4):
            measure_beam(
                d, kk, "beam4+adapter(beamroll-listwise)",
                adapter=adapter_b, tag_a=f"d{d}-beamroll",
            )
        release_compiles()

    if args.only_beam:
        print(json.dumps(results, indent=2))
        if args.json:
            import os

            out = results
            if os.path.exists(args.json):
                with open(args.json) as f:
                    prev = json.load(f)
                prev["rows"].extend(results["rows"])
                for kk in results:
                    if kk.startswith("beam_distill"):
                        prev[kk] = results[kk]
                out = prev
            with open(args.json, "w") as f:
                json.dump(out, f, indent=2)
        return

    # distilled early-exit adapter (train/draft.py) in three regimes
    # (draft-only — exactness untouched in all of them); see the module
    # docstring for what each regime demonstrates
    from infinisst_tpu.train import draft as DR

    # rollout corpora: greedy continuations from the target model —
    # "rollout" covers the measured prompts (deployment analogue:
    # distill on the model's own decoded transcripts), "rollout-x" uses
    # disjoint prompts (the transfer caveat)
    roll_in = [
        DR.rollout_corpus(params, CFG, jnp.stack(teach), G),
        DR.rollout_corpus(params, CFG, jnp.stack(held), G),
    ]
    xfer_prompts = jnp.asarray(
        np.stack([
            make_corpus(np.random.RandomState(300 + i), 1, 8)[0]
            for i in range(12)
        ])
    )
    roll_x = [DR.rollout_corpus(params, CFG, xfer_prompts, G)]

    for d in (1, 2):
        hv = CFG.vocab_size // 4
        regimes = (
            ("adapter(corpus-TF)", [corpus[:, :48]]),
            ("adapter(rollout)", roll_in),
            ("adapter(rollout-x)", roll_x),
        )
        for mode, batches in regimes:
            print(f"distilling exit adapter d={d} {mode}...",
                  file=sys.stderr)
            adapter, hist_log = DR.distill(
                params, CFG, d, batches, steps=args.distill_steps,
                lr=2e-3, key=jax.random.PRNGKey(40 + d), log_every=100,
            )
            results[f"distill_d{d}_{mode}"] = [
                {"step": s, "kl": round(l, 4), "top1_agree": round(a, 4)}
                for s, l, a in hist_log
            ]
            tag_a = f"d{d}-{mode}"
            for k in (4, 9):
                measure(d, k, 0, mode, adapter=adapter, tag_a=tag_a)
            if mode == "adapter(rollout)":
                measure(
                    d, 4, hv, "adapter(rollout)+ranked",
                    head_ids=jnp.asarray(ranked[:hv]), adapter=adapter,
                    tag_a=tag_a,
                )
                # does the distilled adapter rescue BEAM acceptance?
                # (whole-selection matching needs a strong draft — the
                # open question for spec-beam's practical value)
                for kk in (2, 4):
                    measure_beam(
                        d, kk, "beam4+adapter(rollout)",
                        adapter=adapter, tag_a=tag_a,
                    )
                # composed with the low-rank head: the factors
                # approximate the RAW head independent of the adapter's
                # hidden shift, so the two cost cuts stack
                r4 = CFG.hidden_size // 4
                measure(
                    d, 4, 0, f"adapter(rollout)+lowrank{r4}",
                    adapter=adapter, tag_a=tag_a, lowrank=r4,
                )
            release_compiles()

    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
