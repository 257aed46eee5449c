"""Build a corpus-frequency-ranked shortlist for the speculative draft
head (``--spec-head-ids``).

The draft head shortlist (decode/speculative.make_draft_head) keeps the
most acceptance per sliced column when its ids cover the decode-time
token distribution; docs/spec_acceptance.json measures ranked shortlists
keeping 65-80% of full-head acceptance at 1/4 vocab width where
coverage-free shortlists collapse.  For Llama-style merge-ordered BPE
vocabularies the id prefix is already roughly frequency-ranked (the
default, no file needed); this tool produces the tuned alternative:
token-frequency ranks over YOUR target-language corpus — e.g. the
reference training targets (SURVEY.md: MuST-C translation text) or
previously produced translations.

Usage:
  python tools/make_head_shortlist.py --tokenizer-path <hf dir> \
      --text corpus.txt [--out head_ids.npy] [--min-count 1]

Output: .npy int32 array of ALL vocab ids, most-frequent first (ties by
id; unseen ids follow in id order, so any --spec-head-vocab prefix of
the file is a valid shortlist).  Then:
  python -m infinisst_tpu.agents.cli ... --speculative \
      --spec-head-vocab 16384 --spec-head-ids head_ids.npy
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def rank_ids(counts: np.ndarray) -> np.ndarray:
    """Most-frequent-first stable ranking over ALL ids: ties and unseen
    ids stay in id order, so every prefix is a well-defined shortlist."""
    order = np.argsort(-counts, kind="stable")
    return order.astype(np.int32)


def count_tokens(lines, encode, vocab_size: int) -> np.ndarray:
    counts = np.zeros((vocab_size,), np.int64)
    for line in lines:
        line = line.strip()
        if not line:
            continue
        ids = encode(line)
        ids = np.asarray(ids, np.int64)
        ids = ids[(ids >= 0) & (ids < vocab_size)]
        np.add.at(counts, ids, 1)
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenizer-path", required=True)
    ap.add_argument("--text", required=True,
                    help="UTF-8 text file, one target-language line each")
    ap.add_argument("--out", default="head_ids.npy")
    ap.add_argument("--report-coverage", type=int, nargs="*",
                    default=[8192, 16384, 32768],
                    help="print corpus coverage at these shortlist widths")
    args = ap.parse_args()

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.tokenizer_path, use_fast=True)
    vocab_size = len(tok)

    with open(args.text, encoding="utf-8") as f:
        counts = count_tokens(
            f, lambda s: tok.encode(s, add_special_tokens=False), vocab_size
        )

    ranked = rank_ids(counts)
    np.save(args.out, ranked)

    total = counts.sum()
    print(f"{total} tokens counted over {vocab_size} ids -> {args.out}",
          file=sys.stderr)
    for w in args.report_coverage:
        w = min(w, vocab_size)
        cov = counts[ranked[:w]].sum() / max(total, 1)
        pref = counts[:w].sum() / max(total, 1)
        print(
            f"  width {w}: ranked coverage {cov:.4f} "
            f"(id-prefix coverage {pref:.4f})",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
