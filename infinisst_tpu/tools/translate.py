"""Offline (non-streaming) translation of wav files.

The "offline reference" condition (BASELINE.md offline rows; PROGRESS
config 1): full-utterance bidirectional encode + single-turn prompt + beam
decode, i.e. the AlignAtt agent's model path without the attention policy.

Usage:
  python -m infinisst_tpu.tools.translate --wav utt.wav [utt2.wav ...] \
      --state-dict-path .../pytorch_model.bin --model-name .../llama-dir \
      --target-lang German [--beam 4] [--dtype float32]
"""

from __future__ import annotations

import argparse

import numpy as np


def translate_waveform(agent, wav: np.ndarray) -> str:
    """One-shot offline translation using the AlignAtt machinery with the
    policy disabled (source_finished=True emits everything)."""
    agent.reset()
    act = agent.push(wav, finished=True)
    return act.content if not act.is_read() else ""


def main():  # pragma: no cover - CLI
    from infinisst_tpu.agents.cli import add_args, build_agent

    p = argparse.ArgumentParser()
    add_args(p)
    p.add_argument("--wav", nargs="+", required=True)
    # --source/--target are required by the eval CLI parser; make them moot
    args = p.parse_args(
        ["--source", "/dev/null", "--target", "/dev/null", "--agent",
         "alignatt"]
        + __import__("sys").argv[1:]
    )

    from infinisst_tpu.data.audio import get_waveform

    agent = build_agent(args)
    for path in args.wav:
        wav, sr = get_waveform(path)
        assert sr == 16000
        print(f"{path}\t{translate_waveform(agent, wav)}")


if __name__ == "__main__":
    main()
