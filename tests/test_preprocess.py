"""Preprocess pipeline tests on synthetic data: TextGrid parsing,
trajectory building + talk re-slicing, speaker-tag stripping, ASR
filtering, MFA prep, and SimulEval input prep."""

import os

import numpy as np

from infinisst_tpu.data.audio import write_wav
from infinisst_tpu.tools.preprocess import prep_mfa, prepare_simuleval_inputs
from infinisst_tpu.tools.preprocess.asr_filter import filter_by_asr, normalize
from infinisst_tpu.tools.preprocess.build_trajectory import (
    monotone_align,
    parse_textgrid_words,
    reslice_talk,
    trajectory_for_utterance,
)
from infinisst_tpu.tools.preprocess.remove_speakers import strip_speakers
from infinisst_tpu.tools.preprocess.utils import read_tsv, write_tsv

TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.5
tiers? <exists>
size = 2
item []:
item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.5
        intervals: size = 4
        intervals [1]:
            xmin = 0.0
            xmax = 0.5
            text = "hello"
        intervals [2]:
            xmin = 0.5
            xmax = 0.9
            text = ""
        intervals [3]:
            xmin = 0.9
            xmax = 1.6
            text = "streaming"
        intervals [4]:
            xmin = 1.6
            xmax = 2.4
            text = "world"
item [2]:
        class = "IntervalTier"
        name = "phones"
        intervals [1]:
            xmin = 0.0
            xmax = 2.5
            text = "x"
"""


def test_parse_textgrid(tmp_path):
    p = tmp_path / "u0.TextGrid"
    p.write_text(TEXTGRID)
    words = parse_textgrid_words(str(p))
    assert [w for _, _, w in words] == ["hello", "streaming", "world"]
    assert words[0][:2] == (0.0, 0.5)


def test_trajectory_for_utterance(tmp_path):
    p = tmp_path / "u0.TextGrid"
    p.write_text(TEXTGRID)
    words = parse_textgrid_words(str(p))
    traj = trajectory_for_utterance(
        words, "hallo streaming welt".split(), duration_s=2.5
    )
    # 2.5 s -> 3 steps of 960 ms; every target word emitted exactly once
    assert len(traj) == 3
    assert " ".join(t for t in traj if t.strip()).split() == [
        "hallo", "streaming", "welt",
    ]


def test_utterance_trajectory_talk_grid(tmp_path):
    """Trajectories are laid on the TALK step grid: an utterance whose
    offset is not step-aligned starts at the rounded-down step and still
    emits all target words (ref :108-155)."""
    from infinisst_tpu.tools.preprocess.build_trajectory import (
        STEP_SAMPLES,
        utterance_trajectory,
    )

    p = tmp_path / "u0.TextGrid"
    p.write_text(TEXTGRID)
    words = parse_textgrid_words(str(p))
    src = [w for _, _, w in words]
    offset = 2 * STEP_SAMPLES + 5000  # mid-step start in the talk
    off_r, traj, src_segs = utterance_trajectory(
        words, src, "hallo streaming welt".split(), offset, 40000
    )
    assert off_r == 2 * STEP_SAMPLES
    # steps span [off_r, offset + 40000) -> ceil((5000+40000)/15360)=3
    assert len(traj) == 3 and len(src_segs) == 3
    assert " ".join(t for t in traj if t.strip()).split() == [
        "hallo", "streaming", "welt",
    ]
    assert traj[-1].endswith(" ")  # reference's trailing-space quirk


def test_monotone_align():
    pairs = monotone_align(4, 2)
    assert [t for _, t in pairs] == sorted(t for _, t in pairs)


def _utt(step0, n_steps, tag, skipped=False):
    from infinisst_tpu.tools.preprocess.build_trajectory import STEP_SAMPLES

    return {
        "path": "talk.wav",
        "offset": step0 * STEP_SAMPLES,
        "n_frames": n_steps * STEP_SAMPLES,
        "traj_offset": step0 * STEP_SAMPLES,
        "trajectory": None if skipped else [f"{tag}{j} " for j in range(n_steps)],
        "src_segments": None if skipped else [f"s{tag}{j}" for j in range(n_steps)],
    }


def test_reslice_talk_gaps_and_windows():
    """Inter-utterance gaps become empty trajectory steps; every emitted
    row keeps trajectory length == ceil(n_frames / step) — the collators'
    validate() invariant (ref :180-224)."""
    import ast

    from infinisst_tpu.tools.preprocess.build_trajectory import STEP_SAMPLES

    # utterance A: steps 0-2; SILENCE: steps 3-4; utterance B: steps 5-6
    utts = [_utt(0, 3, "a"), _utt(5, 2, "b")]
    docs = reslice_talk(utts, window_steps=30)
    traj = ast.literal_eval(docs[0]["trajectory"])
    n_frames = int(docs[0]["n_frames"])
    assert len(traj) == -(-n_frames // STEP_SAMPLES) == 7
    # gap steps are EMPTY, utterance steps carry their segments
    assert [t.strip() for t in traj] == [
        "a0", "a1", "a2", "", "", "b0", "b1",
    ]
    assert docs[0]["audio"] == f"talk.wav:0:{7 * STEP_SAMPLES}"
    # the reference's snap rule re-windows at the last mid-window
    # utterance -> one overlapping tail sample (ref :216-221)
    assert len(docs) == 2
    assert int(docs[1]["audio"].split(":")[1]) == 5 * STEP_SAMPLES
    assert [t.strip() for t in ast.literal_eval(docs[1]["trajectory"])] == [
        "b0", "b1",
    ]


def test_reslice_talk_window_split_and_skip():
    import ast

    from infinisst_tpu.tools.preprocess.build_trajectory import STEP_SAMPLES

    # 3 utterances x 3 steps back-to-back, 4-step windows
    utts = [_utt(0, 3, "a"), _utt(3, 3, "b"), _utt(6, 3, "c")]
    docs = reslice_talk(utts, window_steps=4)
    for d in docs:
        traj = ast.literal_eval(d["trajectory"])
        assert len(traj) == -(-int(d["n_frames"]) // STEP_SAMPLES)
    # window 1 holds a0..a2 + b0; the straddling b snaps window 2 to its
    # start (overlapping samples, reference :216-221)
    t0 = [t.strip() for t in ast.literal_eval(docs[0]["trajectory"])]
    assert t0 == ["a0", "a1", "a2", "b0"]
    assert int(docs[1]["audio"].split(":")[1]) == 3 * STEP_SAMPLES

    # a skipped (alignment-failed) utterance truncates the window and is
    # excluded from the output entirely
    utts2 = [_utt(0, 2, "a"), _utt(2, 2, "x", skipped=True), _utt(4, 2, "b")]
    docs2 = reslice_talk(utts2, window_steps=30)
    all_txt = " ".join(d["tgt_text"] for d in docs2)
    assert "x" not in all_txt and "a0" in all_txt and "b0" in all_txt
    for d in docs2:
        traj = ast.literal_eval(d["trajectory"])
        assert len(traj) == -(-int(d["n_frames"]) // STEP_SAMPLES)


def test_reslice_rows_pass_collator_validate():
    """End-to-end property: rows produced by reslice_talk (with gaps and a
    skipped utterance) satisfy TrajectoryCollator.validate()."""
    import ast

    from infinisst_tpu.tools.preprocess.build_trajectory import STEP_SAMPLES
    from tests.test_data import BUILDER, MCFG
    from infinisst_tpu.data.collators import TrajectoryCollator

    utts = [
        _utt(0, 3, "a"),
        _utt(4, 2, "b"),
        _utt(7, 1, "x", skipped=True),
        _utt(9, 2, "c"),
    ]
    docs = reslice_talk(utts, window_steps=5)

    class DS:
        def __init__(self, rows):
            self.ids = [f"d{i}" for i in range(len(rows))]
            self.n_frames = [int(r["n_frames"]) for r in rows]
            self.trajectories = [
                ast.literal_eval(r["trajectory"]) for r in rows
            ]

        def __len__(self):
            return len(self.ids)

    coll = TrajectoryCollator(BUILDER, MCFG, block_size=48)
    assert coll.validate(DS(docs)) == len(docs) > 0


def test_strip_speakers():
    rows = [
        {"id": "a", "src_text": "Narrator: hello there",
         "tgt_text": "Erzähler: hallo there"},
        {"id": "b", "src_text": "no tag here", "tgt_text": "kein tag here"},
    ]
    kept, n_stripped, n_dropped = strip_speakers(rows)
    assert len(kept) == 2
    by_id = {r["id"]: r for r in kept}
    assert by_id["a"]["src_text"] == "hello there"
    assert by_id["a"]["tgt_text"] == "hallo there"
    assert n_stripped >= 1


def test_strip_speakers_reference_rules():
    """The reference's decision rules (:77, :150-155): initials tags,
    zh full-width colon, src-len > 3 drop, number-word false positives."""
    rows = [
        # 1-3 letter initials tag, both sides short -> stripped
        {"id": "init", "src_text": "CA: Thank you so much",
         "tgt_text": "CA: Vielen Dank"},
        # zh full-width colon on the target side -> stripped (char length)
        {"id": "zh", "src_text": "David Perry: Wow great",
         "tgt_text": "佩里：哇 棒"},
        # tag detected but source prefix longer than 3 words -> dropped
        {"id": "long", "src_text": "A B C D E Narrator: dropped sample",
         "tgt_text": "x y: z"},
        # number-word tag is a regex false positive -> sample removed
        # without stripping (the reference's `continue` drops it)
        {"id": "numword", "src_text": "Ten: little helpers",
         "tgt_text": "Zehn: kleine Helfer"},
        # untagged -> untouched
        {"id": "clean", "src_text": "plain text", "tgt_text": "plain text"},
    ]
    kept, n_stripped, n_dropped = strip_speakers(rows, lang="zh")
    by_id = {r["id"]: r for r in kept}
    assert by_id["init"]["src_text"] == "Thank you so much"
    assert by_id["init"]["tgt_text"] == "Vielen Dank"
    assert by_id["zh"]["src_text"] == "Wow great"
    assert by_id["zh"]["tgt_text"] == "哇 棒"
    assert "long" not in by_id and "numword" not in by_id
    assert "clean" in by_id
    assert n_dropped == 2


def test_asr_filter():
    rows = [
        {"id": "good", "src_text": "hello streaming world"},
        {"id": "bad", "src_text": "hello streaming world"},
        {"id": "laughter", "src_text": "(Laughter)"},
    ]
    asr = {
        "good": "hello streaming world",
        "bad": "completely different words entirely",
    }
    kept, dropped = filter_by_asr(rows, asr, threshold=0.4)
    ids = [r["id"] for r in kept]
    assert "good" in ids and "laughter" in ids and "bad" not in ids
    assert dropped == 1
    assert normalize("Hello, (Laughter) WORLD!") == "hello world"


def test_prep_mfa_and_simuleval_inputs(tmp_path):
    wav = (np.random.RandomState(0).randn(16000) * 0.1).astype(np.float32)
    talk = str(tmp_path / "talk.wav")
    write_wav(talk, wav)
    rows = [
        {"id": "t_1", "audio": f"{talk}:0:8000", "n_frames": "8000",
         "src_text": "first part", "tgt_text": "erster teil"},
        {"id": "t_0", "audio": f"{talk}:8000:8000", "n_frames": "8000",
         "src_text": "second part", "tgt_text": "zweiter teil"},
    ]
    tsv = str(tmp_path / "split.tsv")
    write_tsv(tsv, rows)
    assert len(read_tsv(tsv)) == 2

    out = str(tmp_path / "mfa")
    prep_mfa.main(["--tsv", tsv, "--output-dir", out])
    assert os.path.isfile(os.path.join(out, "t_1.wav"))
    assert open(os.path.join(out, "t_1.txt")).read().strip() == "first part"

    prefix = str(tmp_path / "tst")
    prepare_simuleval_inputs.main(["--tsv", tsv, "--output-prefix", prefix])
    src = open(prefix + ".source").read().splitlines()
    tgt = open(prefix + ".target").read().splitlines()
    assert src == [talk]
    # ordered by offset: t_1 (offset 0) before t_0 (offset 8000)
    assert tgt == ["erster teil\tzweiter teil"]
