"""Remove speaker tags ("NAME: ...") from transcripts.

Behavioural mirror of preprocess/remove_speakers.py: detect leading
speaker-name tags by regex; decide "strip the tag" vs "drop the sample" by
sentence similarity between the tagged and untagged target (LaBSE in the
reference, :113-160).  sentence-transformers is optional here — without it
a character-overlap similarity is used.  Iterates to fixpoint and writes
*_nospeaker.tsv.
"""

from __future__ import annotations

import argparse
import re

from infinisst_tpu.tools.preprocess.utils import read_tsv, write_tsv

SPEAKER_RE = re.compile(r"^\s*([A-Z][\w .'-]{0,30}):\s+")


def _similarity_fn():
    try:  # pragma: no cover - optional dep
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer("sentence-transformers/LaBSE")

        def sim(a: str, b: str) -> float:
            import numpy as np

            ea, eb = model.encode([a, b])
            return float(
                np.dot(ea, eb)
                / (np.linalg.norm(ea) * np.linalg.norm(eb) + 1e-8)
            )

        return sim
    except Exception:

        def sim(a: str, b: str) -> float:
            sa, sb = set(a.lower().split()), set(b.lower().split())
            if not sa or not sb:
                return 0.0
            return len(sa & sb) / max(len(sa), len(sb))

        return sim


def strip_speakers(rows, threshold: float = 0.6, max_iters: int = 5):
    sim = _similarity_fn()
    kept = []
    n_stripped = n_dropped = 0
    for row in rows:
        src = row.get("src_text", "")
        tgt = row.get("tgt_text", "")
        for _ in range(max_iters):
            m_src = SPEAKER_RE.match(src)
            m_tgt = SPEAKER_RE.match(tgt)
            if not (m_src or m_tgt):
                break
            new_src = SPEAKER_RE.sub("", src, count=1) if m_src else src
            new_tgt = SPEAKER_RE.sub("", tgt, count=1) if m_tgt else tgt
            # if stripping destroys the src/tgt correspondence, drop
            if sim(new_src, new_tgt) + 1e-6 < sim(src, tgt) - 0.3:
                src = tgt = None
                break
            src, tgt = new_src, new_tgt
            n_stripped += 1
        if src is None:
            n_dropped += 1
            continue
        row = dict(row)
        row["src_text"], row["tgt_text"] = src, tgt
        kept.append(row)
    return kept, n_stripped, n_dropped


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)
    rows = read_tsv(args.tsv)
    kept, n_stripped, n_dropped = strip_speakers(rows)
    out = args.output or args.tsv.replace(".tsv", "_nospeaker.tsv")
    write_tsv(out, kept)
    print(
        f"{len(kept)} rows kept ({n_stripped} tags stripped, "
        f"{n_dropped} dropped) -> {out}"
    )


if __name__ == "__main__":
    main()
