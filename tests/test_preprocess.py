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
    assert " ".join(t for t in traj if t).split() == [
        "hallo", "streaming", "welt",
    ]


def test_monotone_align():
    pairs = monotone_align(4, 2)
    assert [t for _, t in pairs] == sorted(t for _, t in pairs)


def test_reslice_talk():
    utts = [
        {
            "path": "talk.wav",
            "offset": i * 16000,
            "n_frames": 16000,
            "trajectory": [f"seg{i}"] * 10,  # 10 steps each
            "tgt_text": f"text{i}",
        }
        for i in range(7)
    ]
    docs = reslice_talk(utts)
    # 30-step windows over 7x10 steps -> 3 docs
    assert len(docs) == 3
    assert docs[0]["audio"].startswith("talk.wav:0:")
    total_steps = sum(len(eval(d["trajectory"])) for d in docs)
    assert total_steps == 70


def test_strip_speakers():
    rows = [
        {"id": "a", "src_text": "Narrator: hello there",
         "tgt_text": "Erzähler: hallo there"},
        {"id": "b", "src_text": "no tag here", "tgt_text": "kein tag here"},
    ]
    kept, n_stripped, n_dropped = strip_speakers(rows)
    assert len(kept) == 2
    assert kept[0]["src_text"] == "hello there"
    assert n_stripped >= 1


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
