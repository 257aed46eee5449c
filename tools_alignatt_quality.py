"""AlignAtt early-stop QUALITY DELTA on a trained model (no checkpoints).

ARCHITECTURE.md records the early-stop *speed* gain (RTF 0.799 -> 0.117 on
the 8B stream) but flags its quality cost as unmeasured: stopping the beam
loop at the attention stop zone selects the winner among EARLY-STOPPED
hypotheses, which can differ from the reference's generate-to-cap +
truncate-post-hoc winner (ref agents/alignatt.py:150-179).  Random weights
cannot measure this: their near-uniform attention fires the stop
immediately, and their outputs are noise either way.

This tool manufactures the regime the policy assumes — concentrated,
monotonic speech-to-text attention — without checkpoints:

  1. A synthetic copy task: each content word owns a fixed 960 ms waveform
     signature; an utterance is K in [1,4] signatures concatenated (plus
     noise) and its target is the K words in order.  Audio position j is
     the only evidence for output token j, so a model that learns the task
     must attend monotonically.
  2. Train the tiny speech-LLM on it with the production Trainer
     (stage-2 recipe: frozen random w2v2 as a feature extractor,
     adapter + llama trained; train/trainer.py).
  3. Stream held-out utterances through AlignAttAgent twice — reference
     parity (generate to cap, truncate post-hoc) vs ``attn_early_stop``
     (end the beam loop at the stop zone) — with identical options, and
     measure:
       - token error rate vs ground truth, per mode (grounds the delta)
       - inter-mode disagreement (TER of early-stop output against the
         parity output; fraction of utterances bitwise identical)
       - attention monotonicity (fraction of non-decreasing most-attended
         frames) as evidence the trained regime differs from random
     plus the same rows for the untrained twin as a control.

Caveat (recorded in the JSON): a 2-layer proxy on a synthetic copy task
bounds the mechanism, not MuST-C BLEU — but it turns "the early-stop
quality delta is unmeasurable here" into "on a trained monotonic-attention
model the delta is X".

Usage:  JAX_PLATFORMS=cpu python tools_alignatt_quality.py \
            [--steps 3000] [--json docs/alignatt_quality.json] \
            [--save-params P | --load-params P]
Runs on CPU in ~1.5 h at the defaults (training dominates); the JSON also
records teacher-forced held-out content accuracy (did the proxy learn)
and warm per-chunk CPU seconds per mode (the loop-iteration saving).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import shutil
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from infinisst_tpu.agents.alignatt import AlignAttAgent, AlignAttOptions
from infinisst_tpu.core.config import StreamConfig
from infinisst_tpu.core.presets import dryrun_config
from infinisst_tpu.data.audio import write_wav
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
from infinisst_tpu.models import adapter as A
from infinisst_tpu.models import llama as L
from infinisst_tpu.models import wav2vec2 as W
from infinisst_tpu.tools.preprocess.utils import word_error_rate

UNIT = 15360  # 960 ms @ 16 kHz — one trajectory step / one agent chunk


def content_words(tok, n=32):
    """n words with pairwise-distinct StubTokenizer ids (id -> signature
    must be injective or the task is unlearnable)."""
    words, seen = [], set()
    i = 0
    while len(words) < n:
        w = f"w{i}"
        i += 1
        (tid,) = tok.encode(w)
        if tid in seen:
            continue
        seen.add(tid)
        words.append(w)
    return words


def signature(tok, word):
    """The word's fixed waveform: deterministic in its token id."""
    (tid,) = tok.encode(word)
    rng = np.random.RandomState(100000 + tid)
    return (rng.randn(UNIT) * 0.1).astype(np.float32)


def make_utt(tok, words, rng, k):
    ws = [words[rng.randint(len(words))] for _ in range(k)]
    wav = np.concatenate([signature(tok, w) for w in ws])
    wav = wav + rng.randn(len(wav)).astype(np.float32) * 0.005
    return ws, wav


def write_split(path, split, utts):
    rows = []
    for i, (ws, wav) in enumerate(utts):
        wpath = os.path.join(path, f"{split}_{i}.wav")
        write_wav(wpath, wav)
        rows.append(
            {
                "id": f"{split}_{i}",
                "audio": wpath,
                "n_frames": str(len(wav)),
                "src_text": " ".join(ws),
                "tgt_text": " ".join(ws),
                "trajectory": repr(ws),
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


def init_params(cfg):
    k = jax.random.PRNGKey(0)
    return {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama),
    }


def train(workdir, cfg, builder, steps, lr):
    from infinisst_tpu.train.trainer import Trainer, TrainerArgs

    run_dir = os.path.join(workdir, "run")
    shutil.rmtree(run_dir, ignore_errors=True)  # no stale auto-resume
    args = TrainerArgs(
        data_path=workdir,
        data_split_train="tr",
        data_split_eval="dv",
        # the OFFLINE recipe: AlignAtt drives an offline model (ref
        # scripts/infer/streamatt.sh:78-79) — single-turn chat prompt
        # (trajectory=1) and an effectively bidirectional encoder
        # (block/cache masks set huge, matching the agent's
        # block_frames=1e7 eval-time encode)
        trajectory=1,
        # stage 2 (frozen w2v2): the random encoder already separates the
        # signatures perfectly (NN probe acc 1.0), so adapter+llm training
        # suffices and is ~2x faster per step than stage 0 full fine-tune
        stage=2,
        train_bsz=600,
        eval_bsz=600,
        bsz_sent=4,
        learning_rate=lr,
        warmup_steps=20,
        scheduler="cosine",
        max_epochs=10_000,
        max_steps=steps,
        grad_acc_steps=1,
        clip_norm=1.0,
        log_step=20,
        eval_step=200,
        save_step=0,
        save_dir=run_dir,
        block_size=10**6,
        max_cache_size=10**6,
        encoder_dropout=0.0,
    )
    t = Trainer(args, cfg, builder, init_params(cfg))
    t.fit()
    rows = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    losses = [m["train_loss"] for m in rows if "train_loss" in m]
    eval_curve = [
        {"step": m.get("step"), "eval_loss": round(m["eval_loss"], 4)}
        for m in rows
        if "eval_loss" in m
    ]
    return jax.device_get(t.state.params), losses, eval_curve


def stream(agent, wav, n_units):
    """Push one utterance chunk-by-chunk; return (text, most_attended)."""
    agent.reset()
    outs = []
    for j in range(n_units):
        act = agent.push(
            wav[j * UNIT:(j + 1) * UNIT], finished=(j == n_units - 1)
        )
        if act is not None and not act.is_read() and act.content:
            outs.append(act.content)
    return " ".join(outs), list(agent.states.most_attended_indices)


def monotonic_frac(indices):
    if len(indices) < 2:
        return 1.0
    d = np.diff(np.asarray(indices))
    return float((d >= 0).mean())


def evaluate(params, cfg, builder, eval_utts, tok, beam, early_stop):
    stream_cfg = StreamConfig(max_cache_frames=96, llm_cache_capacity=256)
    opts = AlignAttOptions(
        latency_multiplier=1,
        beam=beam,
        attn_layer=1,
        frame_num=1,
        length_bucket_chunks=2,
        decode_buf_tokens=16,
        no_repeat_ngram_lookback=16,
        attn_early_stop=early_stop,
    )
    agent = AlignAttAgent(
        params, cfg, stream_cfg, builder, opts, param_dtype=jnp.float32
    )
    hyps, monos, times = [], [], []
    for i, (ws, wav) in enumerate(eval_utts):
        t0 = time.perf_counter()
        text, attended = stream(agent, wav, len(ws))
        if i > 0:  # utterance 0 pays the compiles
            times.append((time.perf_counter() - t0) / len(ws))
        hyps.append(text)
        monos.append(monotonic_frac(attended))
    return hyps, float(np.mean(monos)), float(np.mean(times))


def ref_text(tok, ws):
    return tok.decode(tok.encode(" ".join(ws)))


def teacher_forced_acc(params, cfg, builder, eval_utts, workdir):
    """Held-out content-token argmax accuracy through the TRAINING forward
    (teacher-forced): grounds 'did the proxy learn the task' independently
    of the agent's decode policy."""
    from infinisst_tpu.data.collators import OfflineInstructCollator
    from infinisst_tpu.data.dataset import SpeechToTextDataset
    from infinisst_tpu.models import speech_llm

    write_split(workdir, "ev", eval_utts)
    ds = SpeechToTextDataset.from_tsv(workdir, "ev")
    coll = OfflineInstructCollator(builder, cfg, block_size=10**6)
    b = coll([ds[i] for i in range(len(ds))])
    logits = speech_llm.offline_forward(
        params, cfg, b["speech"], b["input_ids"], b["patch_mask"],
        10**6, 10**6, frame_lengths=b["frame_lengths"],
        attention_mask=b["attention_mask"],
    )
    lab = np.asarray(b["labels"])
    pred = np.asarray(jnp.argmax(logits, -1))
    content = (lab >= 10) & (lab < 900)  # StubTokenizer content id range
    hit = (pred[:, :-1] == lab[:, 1:])[content[:, 1:]]
    return float(hit.mean())


def mode_rows(params, cfg, builder, eval_utts, tok, beam):
    refs = [ref_text(tok, ws) for ws, _ in eval_utts]
    out = {}
    hyp_by_mode = {}
    for name, early in (("parity", False), ("early_stop", True)):
        hyps, mono, sec = evaluate(
            params, cfg, builder, eval_utts, tok, beam, early
        )
        hyp_by_mode[name] = hyps
        out[name] = {
            "ter_vs_ref": round(
                float(np.mean([word_error_rate(h, r)
                               for h, r in zip(hyps, refs)])), 4),
            "mean_tokens": round(
                float(np.mean([len(h.split()) for h in hyps])), 2),
            "attn_monotonic_frac": round(mono, 4),
            # CPU proxy for the loop-iteration saving (the RTF lever);
            # warm chunks only — utterance 0 carries the compiles
            "sec_per_chunk_cpu": round(sec, 4),
        }
    pa, es = hyp_by_mode["parity"], hyp_by_mode["early_stop"]
    out["samples"] = [
        {"ref": r, "parity": p, "early_stop": e}
        for r, p, e in list(zip(refs, pa, es))[:3]
    ]
    out["delta"] = {
        "ter_early_vs_parity": round(
            float(np.mean([word_error_rate(e, p)
                           for e, p in zip(es, pa)])), 4),
        "identical_utt_frac": round(
            float(np.mean([e == p for e, p in zip(es, pa)])), 4),
        "ter_delta_vs_ref": round(
            out["early_stop"]["ter_vs_ref"] - out["parity"]["ter_vs_ref"], 4),
    }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train-utts", type=int, default=500)
    ap.add_argument("--eval-utts", type=int, default=24)
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/alignatt_quality")
    ap.add_argument("--json", default="")
    ap.add_argument("--save-params", default="",
                    help="pickle the trained params here after training")
    ap.add_argument("--load-params", default="",
                    help="skip training; unpickle params from this path")
    args = ap.parse_args(argv)

    cfg = dryrun_config()
    tok = StubTokenizer(cfg.llama.vocab_size, lo=10, hi=900)
    builder = PromptBuilder(tok, cfg.tokens)
    words = content_words(tok)

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.RandomState(7)
    train_utts = [
        make_utt(tok, words, rng, k=int(rng.randint(1, 5)))
        for _ in range(args.train_utts)
    ]
    write_split(args.workdir, "tr", train_utts)
    write_split(args.workdir, "dv", train_utts[: max(4, len(train_utts) // 10)])

    # held-out sequences (word COMBINATIONS unseen with p ~ 1 at 32^4)
    erng = np.random.RandomState(1234)
    eval_utts = [
        make_utt(tok, words, erng, k=4) for _ in range(args.eval_utts)
    ]

    import pickle

    if args.load_params:
        with open(args.load_params, "rb") as f:
            trained = pickle.load(f)
        losses, eval_curve = [float("nan"), float("nan")], []
        print(f"loaded params from {args.load_params}", flush=True)
    else:
        print(f"training {args.steps} steps on {args.train_utts} utts ...",
              flush=True)
        trained, losses, eval_curve = train(args.workdir, cfg, builder,
                                            args.steps, args.lr)
        print(f"loss {losses[0]:.3f} -> {losses[-1]:.3f}", flush=True)
        if args.save_params:
            with open(args.save_params, "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, trained), f)
            print(f"saved params to {args.save_params}", flush=True)

    result = {
        "task": "synthetic monotonic copy (32 words x 960ms signatures)",
        "model": "dryrun tiny speech-LLM (2L w2v2 frozen, 2L llama trained)",
        "train": (
            {"loaded": args.load_params} if args.load_params else {
                "steps": args.steps,
                "loss_first": round(losses[0], 4),
                "loss_final": round(losses[-1], 4),
                # subsampled train-loss curve + held-out eval-loss curve:
                # the "did it learn" evidence, not just endpoints
                "loss_curve": [round(x, 4) for x in losses[:: max(
                    1, len(losses) // 40)]],
                "eval_loss_curve": eval_curve,
            }
        ),
        "beam": args.beam,
        "eval_utts": args.eval_utts,
        "tf_content_acc_heldout": round(
            teacher_forced_acc(trained, cfg, builder, eval_utts,
                               args.workdir), 4),
        "trained": mode_rows(trained, cfg, builder, eval_utts, tok,
                             args.beam),
        "random_control": mode_rows(init_params(cfg), cfg, builder,
                                    eval_utts, tok, args.beam),
        "caveat": (
            "tiny proxy on a synthetic copy task: bounds the early-stop "
            "winner-selection mechanism under concentrated monotonic "
            "attention, not MuST-C BLEU"
        ),
    }
    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.json}")
    return result


if __name__ == "__main__":
    main()
