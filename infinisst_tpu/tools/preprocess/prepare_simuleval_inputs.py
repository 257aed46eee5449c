"""Prepare full-talk streaming-eval inputs.

Behavioural mirror of preprocess/prepare_simuleval_inputs.py: order
tst-COMMON rows by (talk id, offset), then emit one line per talk —
source: the full talk wav; target: the concatenated per-utterance
references joined by tabs (segment boundaries preserved for StreamLAAL
resegmentation).
"""

from __future__ import annotations

import argparse
from collections import defaultdict

from infinisst_tpu.data.audio import parse_path
from infinisst_tpu.tools.preprocess.utils import read_tsv


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--output-prefix", required=True)
    args = p.parse_args(argv)

    rows = read_tsv(args.tsv)
    talks = defaultdict(list)
    for row in rows:
        path, off, _ = parse_path(row["audio"])
        talks[path].append((off, row))
    with open(args.output_prefix + ".source", "w") as src_f, open(
        args.output_prefix + ".target", "w"
    ) as tgt_f:
        for path in sorted(talks):
            utts = sorted(talks[path], key=lambda x: x[0])
            src_f.write(path + "\n")
            tgt_f.write("\t".join(r["tgt_text"] for _, r in utts) + "\n")
    print(f"{len(talks)} talks -> {args.output_prefix}.{{source,target}}")


if __name__ == "__main__":
    main()
