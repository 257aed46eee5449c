"""Build chunk-aligned training trajectories from MFA alignments.

Behavioural mirror of preprocess/build_trajectory_full_mfa.py:
1. word-align source -> target (simalign/LaBSE in the reference, :20,66;
   optional here with a monotone proportional fallback), monotonized so
   target indices never regress (:73-85);
2. map MFA TextGrid word end-times to source word indices (:87-126);
3. for every 960 ms step emit the target words newly covered (:129-155);
4. re-slice whole talks into <= max_multiplier x 960 ms (28.8 s) windows,
   concatenating utterance trajectories into document-level samples
   (:159-224), writing a TSV with a `trajectory` column.

TextGrid parsing is implemented here directly (the reference depends on the
`textgrids` package).
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Dict, List, Optional, Tuple

from infinisst_tpu.tools.preprocess.utils import read_tsv, write_tsv

STEP_S = 0.96
MAX_WINDOW_STEPS = 30  # 28.8 s / 0.96 s


# ---------------------------------------------------------------------------
# TextGrid parsing (long + short formats, 'words' tier)


def parse_textgrid_words(path: str) -> List[Tuple[float, float, str]]:
    with open(path, encoding="utf-8", errors="replace") as f:
        text = f.read()
    # find the 'words' tier
    out = []
    tiers = re.split(r'item\s*\[\d+\]\s*:', text)
    for tier in tiers:
        if '"words"' not in tier.split("\n", 5)[0:5].__str__() and '"words"' not in tier[:200]:
            continue
        intervals = re.findall(
            r'xmin\s*=\s*([\d.]+)\s*\n\s*xmax\s*=\s*([\d.]+)\s*\n\s*'
            r'text\s*=\s*"([^"]*)"',
            tier,
        )
        for xmin, xmax, word in intervals:
            w = word.strip()
            if w:
                out.append((float(xmin), float(xmax), w))
        if out:
            break
    return out


# ---------------------------------------------------------------------------
# Word alignment


def monotone_align(n_src: int, n_tgt: int) -> List[Tuple[int, int]]:
    """Proportional monotone fallback when simalign is unavailable."""
    return [
        (i, min(n_tgt - 1, round(i * n_tgt / max(n_src, 1))))
        for i in range(n_src)
    ]


def align_words(
    src_words: List[str], tgt_words: List[str]
) -> List[Tuple[int, int]]:
    try:  # pragma: no cover - optional dep
        from simalign import SentenceAligner

        aligner = align_words._aligner
        if aligner is None:
            aligner = SentenceAligner(
                model="LaBSE", token_type="word", matching_methods="i"
            )
            align_words._aligner = aligner
        res = aligner.get_word_aligns(src_words, tgt_words)
        pairs = sorted(res["itermax"])
    except Exception:
        pairs = monotone_align(len(src_words), len(tgt_words))
    # monotonize: target index never decreases (ref :73-85)
    mono = []
    last_t = -1
    for s, t in pairs:
        if t >= last_t:
            mono.append((s, t))
            last_t = t
    return mono


align_words._aligner = None


def trajectory_for_utterance(
    src_words_timed: List[Tuple[float, float, str]],
    tgt_words: List[str],
    duration_s: float,
    step_s: float = STEP_S,
) -> List[str]:
    """Per 960 ms step, the target words newly covered (ref :129-155)."""
    src_words = [w for _, _, w in src_words_timed]
    pairs = align_words(src_words, tgt_words)
    # for each src word, the max aligned tgt index
    src2tgt: Dict[int, int] = {}
    for s, t in pairs:
        src2tgt[s] = max(src2tgt.get(s, -1), t)

    import math

    n_steps = max(1, math.ceil(duration_s / step_s - 1e-9))
    traj: List[str] = []
    emitted = 0
    for k in range(n_steps):
        t_end = (k + 1) * step_s
        # src words fully finished by t_end
        max_tgt = -1
        for i, (_, xmax, _) in enumerate(src_words_timed):
            if xmax <= t_end and i in src2tgt:
                max_tgt = max(max_tgt, src2tgt[i])
        if k == n_steps - 1:
            max_tgt = len(tgt_words) - 1
        if max_tgt >= emitted:
            seg = " ".join(tgt_words[emitted : max_tgt + 1])
            emitted = max_tgt + 1
        else:
            seg = ""
        traj.append(seg)
    return traj


def reslice_talk(
    utterances: List[Dict],
    max_multiplier: int = 4,
) -> List[Dict]:
    """Concatenate a talk's utterance trajectories and re-slice into
    <= 28.8 s document-level windows (ref :159-224).  Each utterance dict
    needs: audio(path), offset, n_frames, trajectory, tgt_text."""
    out = []
    window_steps = MAX_WINDOW_STEPS
    cur_traj: List[str] = []
    cur_start: Optional[int] = None
    cur_frames = 0
    cur_tgt: List[str] = []
    path = utterances[0]["path"]

    def flush():
        nonlocal cur_traj, cur_start, cur_frames, cur_tgt
        if cur_traj:
            out.append(
                {
                    "audio": f"{path}:{cur_start}:{cur_frames}",
                    "n_frames": cur_frames,
                    "trajectory": repr(cur_traj),
                    "tgt_text": " ".join(cur_tgt),
                }
            )
        cur_traj, cur_start, cur_frames, cur_tgt = [], None, 0, []

    for utt in utterances:
        traj = utt["trajectory"]
        if len(cur_traj) + len(traj) > window_steps:
            flush()
        if cur_start is None:
            cur_start = utt["offset"]
        cur_frames = utt["offset"] + utt["n_frames"] - cur_start
        cur_traj.extend(traj)
        cur_tgt.append(utt["tgt_text"])
    flush()
    return out


def main(argv=None):  # pragma: no cover - file-system driver
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--textgrid-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--max-multiplier", type=int, default=4)
    args = p.parse_args(argv)

    rows = read_tsv(args.tsv)
    by_talk: Dict[str, List[Dict]] = {}
    for row in rows:
        tg = os.path.join(args.textgrid_dir, row["id"] + ".TextGrid")
        if not os.path.isfile(tg):
            continue
        words = parse_textgrid_words(tg)
        n_frames = int(row["n_frames"])
        duration = n_frames / 16000.0
        traj = trajectory_for_utterance(
            words, row["tgt_text"].split(), duration
        )
        path, off, fr = (row["audio"].split(":") + ["0", str(n_frames)])[:3]
        talk = row["id"].rsplit("_", 1)[0]
        by_talk.setdefault(talk, []).append(
            {
                "path": path,
                "offset": int(off),
                "n_frames": n_frames,
                "trajectory": traj,
                "tgt_text": row["tgt_text"],
                "id": row["id"],
            }
        )
    out_rows = []
    for talk, utts in by_talk.items():
        utts.sort(key=lambda u: u["offset"])
        for i, doc in enumerate(reslice_talk(utts, args.max_multiplier)):
            doc["id"] = f"{talk}_doc{i}"
            doc["src_text"] = ""
            out_rows.append(doc)
    write_tsv(
        args.output,
        out_rows,
        fieldnames=["id", "audio", "n_frames", "src_text", "tgt_text", "trajectory"],
    )
    print(f"{len(out_rows)} document samples -> {args.output}")


if __name__ == "__main__":
    main()
