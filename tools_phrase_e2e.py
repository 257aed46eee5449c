"""Phrase-task BLEU through the production agent: non-identity e2e proof.

docs/trained_e2e.json's headline row (BLEU 100.0 trained vs 0.05 random)
is measured on the monotonic COPY task, where target == source words.  A
critic could object that copying is trivial evidence of learning.  This
tool closes that objection with the PHRASE task
(tools_spec_trained_teacher.py): each 960 ms signature maps to a fixed
3-word phrase `w yN zM` — a genuine non-identity source->target mapping
(a deterministic toy "translation"), trained with the same production
trajectory recipe and streamed through the same production
InfiniSSTAgent + eval/runner.run_streaming_eval (sacrebleu BLEU +
StreamLAAL + RTF), against an untrained twin.

Reuses the teacher already trained by tools_spec_trained_teacher.py
(--params pickle) when present; otherwise trains it with the identical
recipe.  Results merge into docs/trained_e2e.json as a "phrase_task"
section.  (Ref behaviors validated: train recipe
/root/reference/train/main.py:138-203, streaming policy
/root/reference/agents/infinisst.py.)

Usage:
  JAX_PLATFORMS=cpu python tools_phrase_e2e.py \
      [--params /tmp/spec_phrase_params.pkl] [--json docs/trained_e2e.json]
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

from tools_alignatt_quality import content_words, init_params  # noqa: E402
from tools_spec_trained_teacher import (  # noqa: E402
    make_phrase_utt,
    write_phrase_split,
)
from tools_trained_e2e import make_infinisst, score, train_trajectory

from infinisst_tpu.core.presets import dryrun_config
from infinisst_tpu.data.audio import write_wav
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer


def write_phrase_eval_files(workdir, eval_utts, tok):
    d = os.path.join(workdir, "phrase_eval")
    os.makedirs(d, exist_ok=True)
    src_lines, tgt_lines = [], []
    for i, (steps, wav) in enumerate(eval_utts):
        p = os.path.join(d, f"p{i}.wav")
        write_wav(p, wav)
        src_lines.append(p)
        tgt_lines.append(tok.decode(tok.encode(" ".join(steps))))
    with open(os.path.join(d, "eval.source"), "w") as f:
        f.write("\n".join(src_lines) + "\n")
    with open(os.path.join(d, "eval.target"), "w") as f:
        f.write("\n".join(tgt_lines) + "\n")
    return d


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="/tmp/spec_phrase_params.pkl",
                    help="phrase-model pickle (tools_spec_trained_teacher);"
                         " trained here if absent")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train-utts", type=int, default=400)
    ap.add_argument("--eval-utts", type=int, default=24)
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/phrase_e2e")
    ap.add_argument("--json", default="docs/trained_e2e.json")
    args = ap.parse_args(argv)

    cfg = dryrun_config()
    tok = StubTokenizer(cfg.llama.vocab_size, lo=10, hi=900)
    builder = PromptBuilder(tok, cfg.tokens)
    words = content_words(tok)
    os.makedirs(args.workdir, exist_ok=True)

    if os.path.exists(args.params):
        with open(args.params, "rb") as f:
            params = pickle.load(f)
        train_info = {"loaded": args.params}
    else:
        rng = np.random.RandomState(11)
        train_utts = [
            make_phrase_utt(tok, words, rng, k=int(rng.randint(1, 5)))
            for _ in range(args.train_utts)
        ]
        write_phrase_split(args.workdir, "tr", train_utts)
        write_phrase_split(
            args.workdir, "dv", train_utts[: max(4, len(train_utts) // 10)]
        )
        print(f"training phrase model {args.steps} steps ...", flush=True)
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
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    # held-out eval streams (seed disjoint from the training seed 11)
    erng = np.random.RandomState(4321)
    eval_utts = [make_phrase_utt(tok, words, erng, k=4)
                 for _ in range(args.eval_utts)]
    eval_dir = write_phrase_eval_files(args.workdir, eval_utts, tok)

    sec = {
        "task": "synthetic phrase mapping: each 960 ms signature -> a "
                "fixed 3-word phrase (NON-identity source->target "
                "mapping; same teacher as docs/spec_trained_teacher.json)",
        "recipe": "trajectory=4 multi-latency collator at m=1, block 48 /"
                  " cache 96 (release streaming recipe)",
        "beam": args.beam,
        "train": train_info,
    }
    sec["trained"] = score(
        make_infinisst(params, cfg, builder, args.beam),
        eval_dir, "out_phrase_trained",
    )
    print(json.dumps({"trained": sec["trained"]}), flush=True)
    sec["random"] = score(
        make_infinisst(init_params(cfg), cfg, builder, args.beam),
        eval_dir, "out_phrase_random",
    )
    print(json.dumps({"random": sec["random"]}), flush=True)

    result = {}
    if args.json and os.path.exists(args.json):
        with open(args.json) as f:
            result = json.load(f)
    result["phrase_task"] = sec
    print(json.dumps({"phrase_task": sec}, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.json}")
    return result


if __name__ == "__main__":
    main()
