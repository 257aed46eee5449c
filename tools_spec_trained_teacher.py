"""Trained-teacher speculative acceptance through the REAL agent path.

VERDICT r4 #6: every prior speculative row was either constructed
(accept-all ceilings, calibrated-agreement alpha=0) or measured on random
weights / text-only proxies (tools_spec_acceptance.py drives
decode/speculative directly).  This tool produces trained-model,
non-constructed, AGENT-PATH acceptance evidence, in two parts:

SHORT-EMISSION CONTROL (the first run's finding, kept as a section): on
the single-word copy task the trained agent emits ~1 token + EOS per
chunk, and a speculative round's first token is the full model's own
free anchor — so draft acceptance is STRUCTURALLY zero regardless of
draft quality (tokens/round pins to 1.0), and the guard correctly
contains the overhead.  Operationally: at m=1 with one-word emissions,
speculation has no headroom — this is a property of the workload, not
of the draft.

MAIN MEASUREMENT (phrase task): each 960 ms signature maps to a
3-word PHRASE, so chunks emit ~3-4 tokens and the draft has real
headroom.  The pipeline:

  1. Teacher = a trajectory-recipe streaming model trained here on the
     phrase task with the production Trainer (the same recipe
     docs/trained_e2e.json proves end-to-end).
  2. Distillation corpus = the agent's own SERVING distribution:
     train-domain audio streamed through the plain trained agent, its
     emissions rebuilt into spliced sequences by the production
     trajectory=4 collator.
  3. Exit adapter (train/draft.py) distilled on (h_d, teacher) over
     those SPLICED embeddings (speech_llm.offline_spliced_embeddings +
     draft.collect_targets_x), loss masked to decode positions.
  4. Measurement = InfiniSSTAgent speculative greedy on HELD-OUT
     streams, counters aggregated across utterances: acceptance,
     tokens/round vs the analytic break-even, guard behaviour (rows
     with guard on AND off), and exactness vs the plain greedy agent.

Rows land in docs/spec_trained_teacher.json tagged trained-teacher /
agent-path.  Caveat recorded: the teacher is a tiny synthetic-task
model (2-layer LLM, d/L=0.5) — this grounds machinery + recipe on a
genuinely trained teacher, not 8B MuST-C acceptance.

Usage:
  JAX_PLATFORMS=cpu python tools_spec_trained_teacher.py \
      [--steps 1000] [--distill-steps 400] \
      [--json docs/spec_trained_teacher.json]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import pickle

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tools_alignatt_quality import (  # noqa: E402
    UNIT,
    content_words,
    signature,
)
from tools_trained_e2e import make_infinisst, train_trajectory  # noqa: E402

from infinisst_tpu.core.presets import dryrun_config
from infinisst_tpu.data.audio import write_wav
from infinisst_tpu.data.collators import COLLATORS
from infinisst_tpu.data.dataset import SpeechToTextDataset
from infinisst_tpu.data.sampler import SpeechSampler
from infinisst_tpu.data.template import (
    IGNORE_INDEX,
    PromptBuilder,
    StubTokenizer,
)
from infinisst_tpu.models.speech_llm import offline_spliced_embeddings
from infinisst_tpu.train import draft as draft_mod

BLOCK, CACHE = 48, 96  # the trained model's streaming geometry


def phrase(tok, w):
    """Deterministic 3-word phrase for one signature word: multi-token
    per-chunk emissions give the draft real acceptance headroom."""
    (tid,) = tok.encode(w)
    return f"{w} y{tid % 97} z{tid % 89}"


def make_phrase_utt(tok, words, rng, k):
    ws = [words[rng.randint(len(words))] for _ in range(k)]
    wav = np.concatenate([signature(tok, w) for w in ws])
    wav = wav + rng.randn(len(wav)).astype(np.float32) * 0.005
    steps = [phrase(tok, w) for w in ws]
    return steps, wav


def write_phrase_split(path, split, utts):
    rows = []
    for i, (steps, wav) in enumerate(utts):
        wpath = os.path.join(path, f"{split}_{i}.wav")
        write_wav(wpath, wav)
        rows.append(
            {
                "id": f"{split}_{i}",
                "audio": wpath,
                "n_frames": str(len(wav)),
                "src_text": " ".join(steps),
                "tgt_text": " ".join(steps),
                "trajectory": repr(steps),
            }
        )
    with open(os.path.join(path, f"{split}.tsv"), "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=list(rows[0].keys()), delimiter="\t",
            quotechar=None, doublequote=False, lineterminator="\n",
            quoting=csv.QUOTE_NONE,
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)


def stream_utt(agent, wav, n_units):
    """Push one utterance chunk-by-chunk; returns emitted text per chunk
    (empty string for read-only chunks)."""
    agent.reset()
    per_chunk = []
    for j in range(n_units):
        act = agent.push(
            wav[j * UNIT:(j + 1) * UNIT], finished=(j == n_units - 1)
        )
        per_chunk.append(
            act.content if (act is not None and not act.is_read()
                            and act.content) else ""
        )
    return per_chunk


def collect_serving_features(params, cfg, builder, workdir, split, d):
    """Production collator over the serving corpus -> spliced embeddings
    -> (h_d, teacher, decode-position mask) feature batches."""
    ds = SpeechToTextDataset.from_tsv(workdir, split)
    sampler = SpeechSampler(
        ds, shuffle=False, batch_size=2400, batch_size_sent=8, min_ms=320,
        multiplier=1, tokenizer=builder.tokenizer.encode,
    )
    collator = COLLATORS[4](
        builder, cfg, block_size=BLOCK, max_multiplier=1, seed=0
    )
    sampler.set_epoch(0)
    feats = []
    for idx_batch in sampler:
        raw = collator([ds[i] for i in idx_batch])
        emb = offline_spliced_embeddings(
            params, cfg,
            jnp.asarray(raw["speech"]),
            jnp.asarray(raw["input_ids"]),
            jnp.asarray(raw["patch_mask"]),
            BLOCK, CACHE,
            frame_lengths=jnp.asarray(raw["frame_lengths"]),
            dropout_rate=0.0,
        )
        h_d, teacher = draft_mod.collect_targets_x(
            params["llama"], cfg.llama, emb, d,
            jnp.asarray(raw["attention_mask"]),
        )
        # the draft is queried at positions whose NEXT token is decoded
        # target text: labels are unshifted (logits[p] predicts
        # labels[p+1], train/objective.shifted_ce)
        lab = np.asarray(raw["labels"])
        mask = np.zeros(lab.shape, np.float32)
        mask[:, :-1] = (lab[:, 1:] != IGNORE_INDEX).astype(np.float32)
        feats.append((h_d, teacher, jnp.asarray(mask)))
    return feats


def measure_agent(params, cfg, builder, eval_utts, *, adapter=None,
                  k=4, d=1, guard=True, plain_ref=None):
    """Stream every held-out utt through the speculative agent and
    aggregate the per-stream counters (they reset with the per-utt
    agent.reset())."""
    agent = make_infinisst(
        params, cfg, builder, beam=1,
        speculative=True, spec_draft_layers=d, spec_k=k,
        spec_guard=guard, spec_adapter=adapter,
    )
    hyps = []
    tot = dict(rounds=0, drafted=0, accepted=0, emitted=0, fallbacks=0)
    for ws, wav in eval_utts:
        hyps.append(" ".join(
            s for s in stream_utt(agent, wav, len(ws)) if s))
        tot["rounds"] += agent.spec_rounds
        tot["drafted"] += agent.spec_drafted
        tot["accepted"] += agent.spec_accepted
        tot["emitted"] += agent.spec_emitted
        tot["fallbacks"] += int(agent.spec_fallback_active)
    acc = tot["accepted"] / tot["drafted"] if tot["drafted"] else 0.0
    tpr = tot["emitted"] / tot["rounds"] if tot["rounds"] else 0.0
    row = {
        "tag": "trained-teacher agent-path",
        "d": d,
        "k": k,
        "adapter": adapter is not None,
        "guard": guard,
        "accept_rate": round(acc, 4),
        "tokens_per_round": round(tpr, 3),
        "breakeven_tokens_per_round": (
            round(agent._spec_breakeven, 3)
            if agent._spec_breakeven is not None else None
        ),
        "clears_breakeven": (
            bool(tpr > agent._spec_breakeven)
            if agent._spec_breakeven is not None else None
        ),
        "guard_fallback_streams": tot["fallbacks"],
        "streams": len(eval_utts),
        **tot,
    }
    if plain_ref is not None:
        row["exact_match_vs_plain_greedy"] = round(
            float(np.mean([h == p for h, p in zip(hyps, plain_ref)])), 3
        )
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000,
                    help="trajectory-model training steps (phrase task)")
    ap.add_argument("--distill-steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train-utts", type=int, default=400)
    ap.add_argument("--corpus-utts", type=int, default=48)
    ap.add_argument("--eval-utts", type=int, default=24)
    ap.add_argument("--workdir", default="/tmp/spec_teacher2")
    ap.add_argument("--params", default="/tmp/spec_phrase_params.pkl",
                    help="phrase-model pickle; trained here if absent")
    ap.add_argument("--json", default="docs/spec_trained_teacher.json")
    args = ap.parse_args(argv)

    cfg = dryrun_config()
    tok = StubTokenizer(cfg.llama.vocab_size, lo=10, hi=900)
    builder = PromptBuilder(tok, cfg.tokens)
    words = content_words(tok)
    os.makedirs(args.workdir, exist_ok=True)

    rng = np.random.RandomState(11)
    train_utts = [
        make_phrase_utt(tok, words, rng, k=int(rng.randint(1, 5)))
        for _ in range(args.train_utts)
    ]
    write_phrase_split(args.workdir, "tr", train_utts)
    write_phrase_split(args.workdir, "dv",
                       train_utts[: max(4, len(train_utts) // 10)])

    if os.path.exists(args.params):
        with open(args.params, "rb") as f:
            params = pickle.load(f)
        train_info = {"loaded": args.params}
        print(f"loaded {args.params}", flush=True)
    else:
        print(f"training phrase trajectory model {args.steps} steps ...",
              flush=True)
        params, losses, eval_curve = train_trajectory(
            args.workdir, cfg, builder, args.steps, args.lr
        )
        with open(args.params, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, params), f)
        train_info = {
            "steps": args.steps,
            "loss_first": round(losses[0], 4),
            "loss_final": round(losses[-1], 4),
            "eval_loss_curve": eval_curve,
        }
        print(f"loss {losses[0]:.3f} -> {losses[-1]:.3f}", flush=True)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    crng = np.random.RandomState(21)
    corpus_utts = [
        make_phrase_utt(tok, words, crng, k=int(crng.randint(2, 5)))
        for _ in range(args.corpus_utts)
    ]
    erng = np.random.RandomState(4321)
    eval_utts = [make_phrase_utt(tok, words, erng, k=4)
                 for _ in range(args.eval_utts)]

    d = max(1, cfg.llama.num_layers // 2)  # d/L = 0.5, the studied ratio

    # 1. serving-distribution corpus from the plain trained agent
    plain = make_infinisst(params, cfg, builder, beam=1)
    sv_utts = []
    for steps, wav in corpus_utts:
        emitted = stream_utt(plain, wav, len(steps))
        sv_utts.append((emitted, wav))
    write_phrase_split(args.workdir, "sv", sv_utts)
    n_emit = sum(1 for steps, _ in sv_utts for s in steps if s)
    print(f"serving corpus: {len(sv_utts)} streams, {n_emit} emitted "
          "steps", flush=True)

    # plain greedy reference outputs on the held-out set + task accuracy
    plain_ref, n_exact = [], 0
    for steps, wav in eval_utts:
        hyp = " ".join(s for s in stream_utt(plain, wav, len(steps)) if s)
        plain_ref.append(hyp)
        n_exact += int(hyp == tok.decode(tok.encode(" ".join(steps))))
    plain_acc = n_exact / len(eval_utts)
    print(f"plain greedy held-out exact: {plain_acc:.3f}", flush=True)

    # 2. distill the exit adapter on spliced serving contexts
    feats = collect_serving_features(
        params, cfg, builder, args.workdir, "sv", d
    )
    print(f"collected {len(feats)} feature batches", flush=True)
    adapter, hist = draft_mod.distill_on_features(
        params["llama"], cfg.llama, feats,
        steps=args.distill_steps, lr=args.lr, log_every=50,
    )
    print(f"distill: agreement {hist[0][2]:.3f} -> {hist[-1][2]:.3f}",
          flush=True)

    # 3. agent-path speculative measurement
    rows = []
    for use_adapter in (False, True):
        for k in (2, 4):
            for guard in (True, False):
                row = measure_agent(
                    params, cfg, builder, eval_utts,
                    adapter=adapter if use_adapter else None,
                    k=k, d=d, guard=guard, plain_ref=plain_ref,
                )
                rows.append(row)
                print(json.dumps(row), flush=True)

    result = {
        "teacher": "phrase-task trajectory model trained here with the "
                   "production Trainer (same recipe as "
                   "docs/trained_e2e.json)",
        "task": "synthetic phrase copy: each 960 ms signature -> a fixed "
                "3-word phrase (multi-token per-chunk emissions = real "
                "draft headroom)",
        "recipe": "serving-distribution distillation: agent emissions -> "
                  "trajectory collator -> spliced embeddings -> "
                  "collect_targets_x -> distill_on_features (decode-"
                  "position mask)",
        "model": "dryrun tiny speech-LLM",
        "d_over_L": round(d / cfg.llama.num_layers, 3),
        "train": train_info,
        "plain_greedy_heldout_exact": round(plain_acc, 3),
        "distill_history": [
            {"step": s, "kl": round(kl, 4), "agree": round(a, 4)}
            for s, kl, a in hist
        ],
        "rows": rows,
        "short_emission_control": {
            "finding": "on the single-word copy task the trained agent "
                       "emits ~1 token + EOS per chunk; the speculative "
                       "round's first token is the full model's own "
                       "free anchor, so draft acceptance is "
                       "STRUCTURALLY zero however good the draft "
                       "(tokens/round pinned to 1.0, measured accept "
                       "0/12 with a 97%-offline-agreement draft) and "
                       "the guard contains the overhead.  Speculation "
                       "needs multi-token emissions to pay — hence the "
                       "phrase task above.",
        },
        "caveat": "tiny synthetic-task teacher: grounds machinery + "
                  "recipe on a trained model, not 8B MuST-C acceptance",
    }
    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.json}")
    return result


if __name__ == "__main__":
    main()
