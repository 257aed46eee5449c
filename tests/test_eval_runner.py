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
