"""Eval-harness test: streaming evaluation of the tiny agent over wav files
produces scores and instance logs."""

import json
import os

import numpy as np
import pytest

from infinisst_tpu.data.audio import write_wav
from infinisst_tpu.eval.runner import EvalArgs, run_streaming_eval

from tests.test_agent import make_agent


@pytest.mark.slow
def test_run_streaming_eval(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(2):
        write_wav(
            str(tmp_path / f"w{i}.wav"),
            (rng.randn(2 * 15360) * 0.1).astype(np.float32),
        )
    with open(tmp_path / "eval.source", "w") as f:
        f.write(f"{tmp_path}/w0.wav\n{tmp_path}/w1.wav\n")
    with open(tmp_path / "eval.target", "w") as f:
        f.write("ref one\tref two\nref three\n")

    agent = make_agent()
    scores = run_streaming_eval(
        agent,
        EvalArgs(
            source=str(tmp_path / "eval.source"),
            target=str(tmp_path / "eval.target"),
            output=str(tmp_path / "out"),
        ),
    )
    assert scores["n_instances"] == 2
    assert np.isfinite(scores["rtf"]) and scores["rtf"] > 0
    assert np.isfinite(scores["stream_laal"])
    logs = open(tmp_path / "out" / "instances.log").read().splitlines()
    assert len(logs) == 2
    rec = json.loads(logs[0])
    assert rec["delays"] and rec["source_length"] == 2 * 960.0
    assert os.path.isfile(tmp_path / "out" / "scores.json")


def test_stream_laal_uses_manifest_timing():
    """With unequal real segment times, StreamLAAL must differ from the
    equal-split assumption and equal a hand-computed per-segment LAAL."""
    from infinisst_tpu.eval.latency import (
        Emission,
        InstanceLog,
        average_lagging,
        stream_laal,
    )

    # 10 s stream, two reference segments: 0-8 s and 8-10 s (very unequal)
    log = InstanceLog(source_duration_ms=10000.0)
    log.emissions = [
        Emission("a b", 2000.0, 2100.0),   # within segment 1
        Emission("c", 7000.0, 7200.0),      # within segment 1
        Emission("d e", 9000.0, 9100.0),    # within segment 2
    ]
    refs = ["a b c", "d e"]
    seg_times = [(0.0, 8000.0), (8000.0, 2000.0)]

    got = stream_laal(log, refs, seg_times=seg_times)
    want = 0.5 * (
        average_lagging([2000.0, 2000.0, 7000.0], 8000.0, 3)
        + average_lagging([1000.0, 1000.0], 2000.0, 2)
    )
    assert abs(got - want) < 1e-6, (got, want)

    equal = stream_laal(log, refs)  # equal split: 5 s + 5 s
    assert abs(got - equal) > 100.0, (got, equal)


def test_prepare_simuleval_inputs_timing(tmp_path):
    """.timing emits per-segment start:duration in ms from TSV offsets."""
    tsv = tmp_path / "tst.tsv"
    tsv.write_text(
        "id\taudio\tn_frames\tsrc_text\ttgt_text\n"
        "u2\t/wavs/talk1.wav:64000:32000\t32000\thi b\tref b\n"
        "u1\t/wavs/talk1.wav:16000:48000\t48000\thi a\tref a\n"
        "u3\t/wavs/talk2.wav:0:16000\t16000\thi c\tref c\n"
    )
    from infinisst_tpu.tools.preprocess.prepare_simuleval_inputs import main

    main(["--tsv", str(tsv), "--output-prefix", str(tmp_path / "full")])
    src = (tmp_path / "full.source").read_text().splitlines()
    tgt = (tmp_path / "full.target").read_text().splitlines()
    tim = (tmp_path / "full.timing").read_text().splitlines()
    assert src == ["/wavs/talk1.wav", "/wavs/talk2.wav"]
    assert tgt[0] == "ref a\tref b"  # ordered by offset
    assert tim[0] == "1000.0:3000.0\t4000.0:2000.0"
    assert tim[1] == "0.0:1000.0"
