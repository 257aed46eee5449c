"""Trained-teacher speculative acceptance through the REAL agent path.

VERDICT r4 #6: every prior speculative row was either constructed
(accept-all ceilings, calibrated-agreement alpha=0) or measured on random
weights / text-only proxies (tools_spec_acceptance.py trains its own
text-only llama and drives decode/speculative directly).  This tool
produces the first trained-model, non-constructed, AGENT-PATH acceptance
evidence:

  1. Teacher = the trajectory-recipe streaming speech-LLM trained by
     tools_trained_e2e.py (the end-to-end-proven model: train -> export ->
     agent -> eval with BLEU >> random).
  2. Distillation corpus = the agent's own SERVING DISTRIBUTION: train-
     domain audio is streamed through the plain trained agent, its
     emissions become trajectory rows, and the production trajectory=4
     collator rebuilds the exact spliced sequences (speech patches +
     self-decoded text) the serving cache contains.
  3. The exit adapter (train/draft.py) is distilled on (h_d, teacher)
     features collected over those SPLICED embeddings
     (speech_llm.offline_spliced_embeddings + draft.collect_targets_x),
     with the loss masked to decode positions (where the draft is
     queried) — not text-only rollouts.
  4. Measurement = InfiniSSTAgent with speculative greedy ON (guard on,
     the production config) streaming HELD-OUT utterances: acceptance
     rate, emitted tokens per verify round, the analytic break-even, and
     whether the guard tripped; plus exactness vs the plain greedy agent
     (speculative decoding must not change outputs).

Rows land in docs/spec_trained_teacher.json, tagged trained-teacher /
agent-path.  Caveat recorded in the JSON: the teacher is the tiny
synthetic-copy-task model (2-layer LLM, d/L=0.5) — this grounds the
MACHINERY + recipe on a genuinely trained teacher, it does not predict
8B MuST-C acceptance.

Usage:
  JAX_PLATFORMS=cpu python tools_spec_trained_teacher.py \
      [--traj-params /tmp/traj_params.pkl] [--distill-steps 400] \
      [--json docs/spec_trained_teacher.json]
"""

from __future__ import annotations

import argparse
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
    make_utt,
    ref_text,
    write_split,
)
from tools_trained_e2e import make_infinisst  # noqa: E402

from infinisst_tpu.core.presets import dryrun_config
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


def stream_utt(agent, wav, n_units):
    """Push one utterance chunk-by-chunk; returns the emitted text per
    chunk (empty string for read-only chunks)."""
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


def build_serving_corpus(agent, workdir, utts):
    """Stream train-domain audio through the PLAIN trained agent and
    write its per-chunk emissions as trajectory rows — the distillation
    corpus that matches the draft's deployment distribution."""
    rows = []
    for i, (ws, wav) in enumerate(utts):
        emitted = stream_utt(agent, wav, len(ws))
        rows.append((emitted, wav))
    # write_split wants (word-list, wav); our trajectory steps are the
    # agent's emissions (possibly multi-word / empty per chunk)
    import csv

    from infinisst_tpu.data.audio import write_wav

    tsv = []
    for i, (steps, wav) in enumerate(rows):
        p = os.path.join(workdir, f"sv_{i}.wav")
        write_wav(p, wav)
        tsv.append(
            {
                "id": f"sv_{i}",
                "audio": p,
                "n_frames": str(len(wav)),
                "src_text": " ".join(s for s in steps if s),
                "tgt_text": " ".join(s for s in steps if s),
                "trajectory": repr(steps),
            }
        )
    with open(os.path.join(workdir, "sv.tsv"), "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=list(tsv[0].keys()), delimiter="\t",
            quotechar=None, doublequote=False, lineterminator="\n",
            quoting=csv.QUOTE_NONE,
        )
        w.writeheader()
        for r in tsv:
            w.writerow(r)
    return sum(1 for steps, _ in rows for s in steps if s)


def collect_serving_features(params, cfg, builder, workdir, d):
    """Production collator over the serving corpus -> spliced embeddings
    -> (h_d, teacher, decode-position mask) feature batches."""
    ds = SpeechToTextDataset.from_tsv(workdir, "sv")
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


def measure_agent(params, cfg, builder, eval_utts, tok, *, adapter=None,
                  k=4, d=1, plain_ref=None):
    opts_kw = dict(
        speculative=True,
        spec_draft_layers=d,
        spec_k=k,
        spec_guard=True,
        spec_adapter=adapter,
    )
    agent = make_infinisst(params, cfg, builder, beam=1, **opts_kw)
    hyps = []
    for ws, wav in eval_utts:
        hyps.append(" ".join(s for s in stream_utt(agent, wav, len(ws))
                             if s))
    acc = (agent.spec_accepted / agent.spec_drafted
           if agent.spec_drafted else 0.0)
    tpr = (agent.spec_emitted / agent.spec_rounds
           if agent.spec_rounds else 0.0)
    row = {
        "tag": "trained-teacher agent-path",
        "d": d,
        "k": k,
        "adapter": adapter is not None,
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
        "guard_fallback": bool(agent.spec_fallback_active),
        "rounds": agent.spec_rounds,
        "drafted": agent.spec_drafted,
        "accepted": agent.spec_accepted,
        "emitted": agent.spec_emitted,
    }
    if plain_ref is not None:
        row["exact_match_vs_plain_greedy"] = round(
            float(np.mean([h == p for h, p in zip(hyps, plain_ref)])), 3
        )
    return row, hyps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--traj-params", default="/tmp/traj_params.pkl")
    ap.add_argument("--distill-steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--corpus-utts", type=int, default=48)
    ap.add_argument("--eval-utts", type=int, default=24)
    ap.add_argument("--workdir", default="/tmp/spec_teacher")
    ap.add_argument("--json", default="docs/spec_trained_teacher.json")
    args = ap.parse_args(argv)

    cfg = dryrun_config()
    tok = StubTokenizer(cfg.llama.vocab_size, lo=10, hi=900)
    builder = PromptBuilder(tok, cfg.tokens)
    words = content_words(tok)
    os.makedirs(args.workdir, exist_ok=True)

    with open(args.traj_params, "rb") as f:
        params = pickle.load(f)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    rng = np.random.RandomState(21)
    corpus_utts = [make_utt(tok, words, rng, k=int(rng.randint(2, 5)))
                   for _ in range(args.corpus_utts)]
    erng = np.random.RandomState(4321)
    eval_utts = [make_utt(tok, words, erng, k=4)
                 for _ in range(args.eval_utts)]

    d = max(1, cfg.llama.num_layers // 2)  # d/L = 0.5, the studied ratio

    # 1. serving-distribution corpus from the plain trained agent
    plain = make_infinisst(params, cfg, builder, beam=1)
    n_emitted = build_serving_corpus(plain, args.workdir, corpus_utts)
    print(f"serving corpus: {args.corpus_utts} streams, "
          f"{n_emitted} emitted steps", flush=True)

    # plain greedy reference outputs on the held-out set (exactness check)
    plain_ref = []
    for ws, wav in eval_utts:
        plain_ref.append(" ".join(
            s for s in stream_utt(plain, wav, len(ws)) if s))
    refs = [ref_text(tok, ws) for ws, _ in eval_utts]
    plain_acc = float(np.mean([h == r for h, r in zip(plain_ref, refs)]))

    # 2. distill the exit adapter on spliced serving contexts
    feats = collect_serving_features(params, cfg, builder, args.workdir, d)
    print(f"collected {len(feats)} feature batches", flush=True)
    adapter, hist = draft_mod.distill_on_features(
        params["llama"], cfg.llama, feats,
        steps=args.distill_steps, lr=args.lr, log_every=50,
    )
    print(f"distill: agreement {hist[0][2]:.3f} -> {hist[-1][2]:.3f}",
          flush=True)

    # 3. agent-path speculative measurement, guard ON
    rows = []
    for use_adapter in (False, True):
        for k in (2, 4):
            row, _ = measure_agent(
                params, cfg, builder, eval_utts, tok,
                adapter=adapter if use_adapter else None, k=k, d=d,
                plain_ref=plain_ref,
            )
            rows.append(row)
            print(json.dumps(row), flush=True)

    result = {
        "teacher": "trajectory-recipe streaming model trained by "
                   "tools_trained_e2e.py (see docs/trained_e2e.json)",
        "recipe": "serving-distribution distillation: agent emissions -> "
                  "trajectory collator -> spliced embeddings -> "
                  "collect_targets_x -> distill_on_features (decode-"
                  "position mask)",
        "model": "dryrun tiny speech-LLM",
        "d_over_L": round(d / cfg.llama.num_layers, 3),
        "plain_greedy_heldout_exact": round(plain_acc, 3),
        "distill_history": [
            {"step": s, "kl": round(l, 4), "agree": round(a, 4)}
            for s, l, a in hist
        ],
        "rows": rows,
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
