"""Released-checkpoint-path end-to-end test with SYNTHETIC files.

The real released checkpoints don't exist in this environment; this test
exercises every step of the PARITY_EVAL runbook's plumbing with fake files
of the same layout, so only the *weights*, not the *pipeline*, remain
unverified (VERDICT r2 #9; ref load path agents/infinisst.py:130-183):

  fake fairseq CTC .pt (w2v_encoder.w2v_model.* + omegaconf-like cfg
  object -> the restricted unpickler path) + fake pruned stage-2
  pytorch_model.bin (SpeechLlama layout) on disk
  -> the ACTUAL agent CLI (agents/cli.py main)
  -> streams real wav files -> eval/runner.py -> BLEU + StreamLAAL.
"""

import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from infinisst_tpu.convert import from_torch as C  # noqa: E402
from infinisst_tpu.core.presets import dryrun_config  # noqa: E402
from infinisst_tpu.data import audio as audio_mod  # noqa: E402
from infinisst_tpu.models import llama as L  # noqa: E402

from tests.test_convert import _tiny_w2v2_sd  # noqa: E402


def _build_reference_bin(rng, cfg):
    """Pruned stage-2 pytorch_model.bin layout (ref: train/prune_bin.py,
    model/model.py:114-133) for the dryrun preset shapes."""
    import jax

    w_sd = _tiny_w2v2_sd(rng, cfg.w2v2)
    bin_sd = {
        f"model.speech_encoder.speech_encoder.{k}": v
        for k, v in w_sd.items()
    }
    in_d = cfg.adapter.in_dim
    for i, lc in enumerate(cfg.adapter.conv_layers):
        base = f"model.speech_encoder.length_shrink.conv_layers.{i}"
        bin_sd[f"{base}.0.weight"] = (
            rng.randn(lc.dim, in_d, lc.kernel).astype(np.float32) * 0.3
        )
        bin_sd[f"{base}.2.1.weight"] = rng.rand(lc.dim).astype(np.float32)
        bin_sd[f"{base}.2.1.bias"] = np.zeros(lc.dim, np.float32)
        in_d = lc.dim
    bin_sd["model.speech_encoder.proj.weight"] = (
        rng.randn(cfg.adapter.out_dim, in_d).astype(np.float32) * 0.2
    )
    bin_sd["model.speech_encoder.proj.bias"] = np.zeros(
        cfg.adapter.out_dim, np.float32
    )
    l_params = L.init_params(jax.random.PRNGKey(5), cfg.llama)
    bin_sd.update(C.export_llama(l_params, cfg.llama))
    return bin_sd, w_sd


@pytest.mark.slow
def test_cli_file_to_bleu(tmp_path, monkeypatch):
    rng = np.random.RandomState(42)
    cfg = dryrun_config()
    bin_sd, w_sd = _build_reference_bin(rng, cfg)

    # --- files on disk, as the release pipeline would produce them
    bin_path = tmp_path / "pytorch_model.bin"
    torch.save({k: torch.from_numpy(v) for k, v in bin_sd.items()}, bin_path)

    # 2 talks x ~2.1 s of audio
    wavs = []
    for i in range(2):
        wav = (
            np.sin(np.linspace(0, 700 + 100 * i, 34000)) * 0.3
            + rng.randn(34000) * 0.02
        ).astype(np.float32)
        p = tmp_path / f"talk{i}.wav"
        audio_mod.write_wav(str(p), wav)
        wavs.append(str(p))
    src = tmp_path / "tst.source"
    src.write_text("\n".join(wavs) + "\n")
    tgt = tmp_path / "tst.target"
    tgt.write_text("ein kleiner test satz\tnoch einer\nzweiter talk text\n")
    timing = tmp_path / "tst.timing"
    timing.write_text("0:1000\t1000:1125\n0:2125\n")

    out_dir = tmp_path / "out"
    argv = [
        "cli",
        "--agent", "infinisst",
        "--source", str(src),
        "--target", str(tgt),
        "--timing", str(timing),
        "--output", str(out_dir),
        "--state-dict-path", str(bin_path),
        "--model-preset", "dryrun",
        "--latency-multiplier", "1",
        "--beam", "2",
        "--max-llm-cache-size", "120",
        "--always-cache-system-prompt",
        "--dtype", "float32",
    ]
    monkeypatch.setattr(sys, "argv", argv)

    from infinisst_tpu.agents.cli import main as cli_main

    cli_main()

    # scores + per-instance logs exist and are well-formed
    scores = json.loads((out_dir / "scores.json").read_text())
    assert "bleu" in {k.lower() for k in scores} or any(
        "bleu" in k.lower() for k in scores
    ), scores
    assert any("laal" in k.lower() for k in scores), scores
    inst = (out_dir / "instances.log").read_text().strip().splitlines()
    assert len(inst) == 2
    for line in inst:
        rec = json.loads(line)
        assert rec["prediction"] is not None


def test_fairseq_ctc_pt_load_path(tmp_path):
    """--w2v2-path loads a fairseq-style CTC .pt carrying config OBJECTS
    (argparse.Namespace stands in for omegaconf): the restricted
    unpickler must stub them and still deliver the tensors, and the
    CTC wrapper keys must be auto-stripped."""
    import argparse as ap

    import jax

    rng = np.random.RandomState(7)
    cfg = dryrun_config()
    w_sd = _tiny_w2v2_sd(rng, cfg.w2v2)
    ckpt = {
        "model": {
            f"w2v_encoder.w2v_model.{k}": torch.from_numpy(v)
            for k, v in w_sd.items()
        },
        "cfg": ap.Namespace(task="audio_finetuning", arbitrary=object()),
        "args": ap.Namespace(encoder_layers=cfg.w2v2.encoder_layers),
    }
    ckpt["model"]["w2v_encoder.proj.weight"] = torch.randn(40, 128)
    ckpt["model"]["w2v_encoder.proj.bias"] = torch.zeros(40)
    pt = tmp_path / "ctc.pt"
    torch.save(ckpt, pt)

    from infinisst_tpu.train.main import build_params

    class _A:
        llm_path = None
        w2v2_path = str(pt)
        sllm_weight_path = None

    params = build_params(_A, cfg)
    # converted w2v2 equals direct conversion of the raw dict
    direct = C.to_jax(C.convert_w2v2(w_sd, cfg.w2v2))
    for a, b in zip(
        jax.tree.leaves(params["w2v2"]), jax.tree.leaves(direct)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )
