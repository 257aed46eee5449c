"""Trainer-driver test: end-to-end fit on synthetic data (tiny model, CPU),
checkpoint save + auto-resume."""

import csv
import os

import numpy as np
import pytest

from infinisst_tpu.core.presets import dryrun_config
from infinisst_tpu.data.audio import write_wav
from infinisst_tpu.data.template import PromptBuilder, StubTokenizer
from infinisst_tpu.train.trainer import Trainer, TrainerArgs


def _make_data(tmp_path, n=6):
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        n_units = int(rng.randint(1, 3))
        wav = (rng.randn(n_units * 15360) * 0.1).astype(np.float32)
        path = str(tmp_path / f"u{i}.wav")
        write_wav(path, wav)
        traj = [f"seg{i} tok{j}" for j in range(n_units)]
        rows.append(
            {
                "id": f"u{i}",
                "audio": path,
                "n_frames": str(len(wav)),
                "src_text": "src words",
                "tgt_text": " ".join(traj),
                "trajectory": repr(traj),
            }
        )
    for split in ("tr", "dv"):
        with open(tmp_path / f"{split}.tsv", "w", newline="") as f:
            w = csv.DictWriter(
                f, fieldnames=list(rows[0].keys()), delimiter="\t",
                quotechar=None, doublequote=False, lineterminator="\n",
                quoting=csv.QUOTE_NONE,
            )
            w.writeheader()
            for r in rows:
                w.writerow(r)


def _params(cfg):
    import jax

    from infinisst_tpu.models import adapter as A, llama as L, wav2vec2 as W

    k = jax.random.PRNGKey(0)
    return {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), cfg.w2v2),
        "adapter": A.init_params(jax.random.fold_in(k, 1), cfg.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), cfg.llama),
    }


def test_prefetch_matches_sequential(tmp_path):
    """The background prefetch generator must yield exactly the batches
    the sequential loop builds (same order, same contents), and releasing
    it early must stop the worker thread instead of leaking it."""
    import threading

    import jax
    import numpy as np

    _make_data(tmp_path)
    cfg = dryrun_config()
    builder = PromptBuilder(
        StubTokenizer(cfg.llama.vocab_size, lo=10, hi=900), cfg.tokens
    )
    args = TrainerArgs(
        data_path=str(tmp_path),
        data_split_train="tr",
        data_split_eval="dv",
        trajectory=4,
        trajectory_max_multiplier=2,
        stage=2,
        train_bsz=300,
        eval_bsz=300,
        bsz_sent=2,
        learning_rate=1e-3,
        warmup_steps=1,
        max_steps=3,
        grad_acc_steps=1,
        save_dir=str(tmp_path / "run"),
        max_cache_size=96,
    )
    t = Trainer(args, cfg, builder, _params(cfg))

    # fresh loader per pass: the trajectory-4 collator's aug RNG advances
    # per call, so reuse across passes would desynchronise multipliers
    ds, sampler, collator = t._make_loader("tr", args.train_bsz, shuffle=True)
    sampler.set_epoch(0)
    seq = []
    for idx_batch in sampler:
        raw = collator([ds[i] for i in idx_batch])
        m = raw.get("multiplier", 1)
        seq.append((m, t._to_batch(raw, m)))
    assert len(seq) > 1

    ds, sampler, collator = t._make_loader("tr", args.train_bsz, shuffle=True)
    sampler.set_epoch(0)  # same epoch + seed -> same order and augs
    pre = list(t._prefetch(sampler, ds, collator))
    assert len(pre) == len(seq)
    for (m_a, b_a), (m_b, b_b) in zip(pre, seq):
        assert m_a == m_b
        for x, y in zip(jax.tree.leaves(b_a), jax.tree.leaves(b_b)):
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(x)), np.asarray(jax.device_get(y))
            )

    # early abandonment (the fit() max_steps break) stops the worker
    n0 = threading.active_count()
    sampler.set_epoch(0)
    gen = t._prefetch(sampler, ds, collator)
    next(gen)
    gen.close()  # runs the generator's finally: stop + join
    assert threading.active_count() <= n0 + 1


@pytest.mark.slow
def test_fit_and_resume(tmp_path):
    _make_data(tmp_path)
    cfg = dryrun_config()
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size, lo=10, hi=900),
                            cfg.tokens)
    args = TrainerArgs(
        data_path=str(tmp_path),
        data_split_train="tr",
        data_split_eval="dv",
        trajectory=4,
        trajectory_max_multiplier=2,
        stage=2,  # train llm+adapter (dryrun llm is tiny)
        train_bsz=300,
        eval_bsz=300,
        bsz_sent=2,
        learning_rate=1e-3,
        warmup_steps=1,
        max_steps=3,
        grad_acc_steps=1,
        log_step=1,
        eval_step=2,
        save_step=3,
        save_dir=str(tmp_path / "run"),
        max_cache_size=96,
    )
    t = Trainer(args, cfg, builder, _params(cfg))
    final = t.fit()
    assert final == 3
    assert os.path.isfile(tmp_path / "run" / "metrics.jsonl")
    lines = open(tmp_path / "run" / "metrics.jsonl").read().splitlines()
    assert any("train_loss" in l for l in lines)
    assert any("eval_loss" in l for l in lines)

    # resume continues from step 3
    args2 = TrainerArgs(**{**args.__dict__, "max_steps": 5})
    t2 = Trainer(args2, cfg, builder, _params(cfg))
    final2 = t2.fit()
    assert final2 == 5


def test_stage0_trains_everything(tmp_path):
    """stage=0 is full fine-tune: no leaf frozen (from-scratch proxies;
    the staged recipes assume a pretrained LLM and keep w2v2 or the LLM
    fixed)."""
    import jax

    from infinisst_tpu.train import step as tstep

    cfg = dryrun_config()
    params = _params(cfg)
    m0 = tstep.trainable_mask(params, tstep.FreezeConfig())
    assert all(jax.tree.leaves(m0))
    _make_data(tmp_path, n=2)
    builder = PromptBuilder(StubTokenizer(cfg.llama.vocab_size, lo=10, hi=900),
                            cfg.tokens)
    args = TrainerArgs(
        data_path=str(tmp_path), data_split_train="tr", data_split_eval="dv",
        trajectory=1, stage=0, train_bsz=300, bsz_sent=2, max_steps=2,
        warmup_steps=1, grad_acc_steps=1, log_step=1, eval_step=0,
        save_step=0, save_dir=str(tmp_path / "run"), max_cache_size=96,
    )
    t = Trainer(args, cfg, builder, params)
    assert not any(
        [t.freeze.w2v2, t.freeze.adapter, t.freeze.llm,
         t.freeze.llm_embed, t.freeze.llm_head]
    )
    before = jax.tree.map(lambda x: x.copy(), t.state.params)
    t.fit()
    after = t.state.params
    # every top-level component moved (w2v2 included — the stage-2 recipe
    # would have left it bitwise identical)
    for comp in ("w2v2", "adapter", "llama"):
        moved = any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree.leaves(before[comp]),
                            jax.tree.leaves(after[comp]))
        )
        assert moved, comp
