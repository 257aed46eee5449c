"""Training driver: the equivalent of the reference's train/main.py +
SLlamaLightning (model/model.py) in one place.

- two-stage recipe via FreezeConfig (stage1/stage2) and stage-1 weight
  loading (ref: model/model.py:142-145);
- token-budget SpeechSampler + collator selected by --trajectory 0..4
  (ref: model/model.py:33-39, :149-226);
- per-multiplier compiled train steps (the multi-latency collator samples m
  per batch; shapes are bucketed so the compiled-program set stays small);
- gradient accumulation via optax.MultiSteps (ref grad_acc, main.py:185);
- metrics to JSONL (+ wandb when available), per-multiplier loss logging
  (ref: model/model.py:228-241);
- orbax checkpointing with auto-resume (ref: main.py:199-203).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from infinisst_tpu.core.config import ModelConfig
from infinisst_tpu.data.collators import COLLATORS
from infinisst_tpu.data.dataset import SpeechToTextDataset
from infinisst_tpu.data.sampler import SpeechSampler
from infinisst_tpu.data.template import PromptBuilder
from infinisst_tpu.parallel import mesh as pmesh
from infinisst_tpu.train import checkpoint as ckpt
from infinisst_tpu.train import step as tstep


@dataclass
class TrainerArgs:
    """Mirrors the reference arg dataclasses (train/main.py:31-123)."""

    data_path: str = ""
    data_split_train: str = "train"
    data_split_eval: str = "dev"
    source_lang: str = "English"
    target_lang: str = "German"
    trajectory: int = 4
    trajectory_max_multiplier: int = 4
    trajectory_prob_aug: float = 0.0
    trajectory_perturb: tuple = (0.3, 0.3, 0.4)

    stage: int = 1
    train_bsz: int = 1800  # token budget per batch
    eval_bsz: int = 1800
    bsz_sent: int = 2
    learning_rate: float = 2e-4
    warmup_steps: int = 1000
    scheduler: str = "cosine"
    max_epochs: int = 6
    grad_acc_steps: int = 4
    clip_norm: float = 1.0
    cpo_beta: float = 0.0
    seed: int = 998244353

    block_size: int = 48
    max_cache_size: int = 576

    save_dir: str = "runs/stage1"
    log_step: int = 5
    eval_step: int = 200
    save_step: int = 1000
    max_steps: Optional[int] = None
    debug_mode: bool = False  # fast_dev_run equivalent

    remat: bool = True  # gradient checkpointing (activation memory)
    encoder_dropout: float = 0.1  # fairseq w2v2 training dropout

    # mesh
    n_data: int = 1
    n_model: int = 1
    zero: bool = True


class MetricsLogger:
    """JSONL metrics + optional wandb (ref: WandbLogger, main.py:165-168)."""

    def __init__(self, save_dir: str, run_name: str = "run"):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, "metrics.jsonl")
        self.wandb = None
        if os.environ.get("WANDB_PROJECT"):
            try:  # pragma: no cover - env dependent
                import wandb

                self.wandb = wandb
                wandb.init(
                    project=os.environ["WANDB_PROJECT"],
                    entity=os.environ.get("WANDB_ENTITY"),
                    name=run_name,
                )
            except Exception:
                self.wandb = None

    def log(self, metrics: Dict, step: int):
        rec = {"step": step, "time": time.time(), **metrics}
        # tolerate the run dir vanishing mid-fit (e.g. a concurrent tool
        # sharing the workdir rmtree'd it): losing a metrics line beats
        # aborting an hours-long training run
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.wandb is not None:  # pragma: no cover
            self.wandb.log(metrics, step=step)


def pad_to_buckets(batch: Dict, m: int, pad_id: int) -> Dict:
    """Round (B, S, T) up to bucket sizes so the compiled-shape set stays
    small across packed batches.  Dummy rows/cols are fully masked."""
    from infinisst_tpu.data.template import IGNORE_INDEX

    B, S = batch["input_ids"].shape
    T = batch["speech"].shape[1]

    def round_up(x, mult):
        return ((x + mult - 1) // mult) * mult

    nB = max(1, 1 << (B - 1).bit_length())  # next pow2
    nS = round_up(S, 128)
    unit = 15360 * m
    nT = round_up(max(T - 399, 1), unit) + 399

    out = {}
    ids = np.full((nB, nS), pad_id, np.int32)
    ids[:B, :S] = batch["input_ids"]
    out["input_ids"] = ids
    lab = np.full((nB, nS), IGNORE_INDEX, np.int32)
    lab[:B, :S] = batch["labels"]
    out["labels"] = lab
    am = np.zeros((nB, nS), np.int32)
    am[:B, :S] = batch["attention_mask"]
    out["attention_mask"] = am
    pm = np.zeros((nB, nS), bool)
    pm[:B, :S] = batch["patch_mask"]
    out["patch_mask"] = pm
    sp = np.zeros((nB, nT), np.float32)
    sp[:B, :T] = batch["speech"]
    out["speech"] = sp
    fl = np.zeros((nB,), np.int32)
    fl[:B] = batch["frame_lengths"]
    out["frame_lengths"] = fl
    return out


class Trainer:
    def __init__(
        self,
        args: TrainerArgs,
        model_cfg: ModelConfig,
        builder: PromptBuilder,
        params,
    ):
        self.args = args
        self.cfg = model_cfg
        self.builder = builder

        self.mesh = pmesh.make_mesh(args.n_data, args.n_model)
        specs = pmesh.model_param_specs(model_cfg, zero=args.zero and args.n_data > 1)
        with self.mesh:
            params = pmesh.shard_params(params, self.mesh, specs)

        # stage 0 = full fine-tune (nothing frozen): for from-scratch
        # proxies and offline-recipe studies; the reference's staged
        # recipes assume a pretrained LLM (train/main.py:60-76)
        freeze = {
            0: tstep.FreezeConfig(),
            1: tstep.FreezeConfig.stage1(),
        }.get(args.stage, tstep.FreezeConfig.stage2())
        self.freeze = freeze
        opt_cfg = tstep.OptimConfig(
            learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps,
            scheduler=args.scheduler,
            clip_norm=args.clip_norm,
            total_steps=args.max_steps or 100_000,
        )
        self._schedule = tstep.make_schedule(opt_cfg)
        base_tx = tstep.make_optimizer(opt_cfg, params, freeze)
        self.tx = (
            optax.MultiSteps(base_tx, args.grad_acc_steps)
            if args.grad_acc_steps > 1
            else base_tx
        )
        self.state = tstep.init_train_state(params, self.tx)
        self.logger = MetricsLogger(args.save_dir)

        self._step_fns: Dict[int, callable] = {}
        self._eval_fns: Dict[int, callable] = {}

    # -- data ---------------------------------------------------------------
    def _make_loader(self, split: str, budget: int, shuffle: bool):
        ds = SpeechToTextDataset.from_tsv(self.args.data_path, split)
        sampler = SpeechSampler(
            ds,
            shuffle=shuffle,
            batch_size=budget,
            batch_size_sent=self.args.bsz_sent,
            min_ms=320,
            multiplier=max(1, self.args.grad_acc_steps),
            tokenizer=self.builder.tokenizer.encode,
        )
        coll_cls = COLLATORS[self.args.trajectory]
        kw = {}
        if self.args.trajectory == 3:
            kw = dict(perturb=self.args.trajectory_perturb, seed=self.args.seed)
        elif self.args.trajectory == 4:
            kw = dict(
                max_multiplier=self.args.trajectory_max_multiplier,
                prob_aug=self.args.trajectory_prob_aug,
                seed=self.args.seed,
            )
        collator = coll_cls(
            self.builder, self.cfg, block_size=self.args.block_size, **kw
        )
        return ds, sampler, collator

    def _get_step_fn(self, m: int):
        if m not in self._step_fns:
            self._step_fns[m] = jax.jit(
                tstep.make_train_step(
                    self.cfg,
                    self.tx,
                    self.args.block_size,
                    self.args.max_cache_size,
                    multiplier=m,
                    cpo_beta=self.args.cpo_beta,
                    freeze=self.freeze,
                    remat=self.args.remat,
                    encoder_dropout=(
                        self.args.encoder_dropout
                        if self.args.stage == 1 else 0.0
                    ),
                    dropout_seed=self.args.seed,
                ),
                donate_argnums=(0,),
            )
        return self._step_fns[m]

    def _to_batch(self, raw: Dict, m: int) -> tstep.Batch:
        padded = pad_to_buckets(raw, m, self.cfg.tokens.pad)
        return tstep.Batch(
            speech=jnp.asarray(padded["speech"]),
            frame_lengths=jnp.asarray(padded["frame_lengths"]),
            input_ids=jnp.asarray(padded["input_ids"]),
            labels=jnp.asarray(padded["labels"]),
            attention_mask=jnp.asarray(padded["attention_mask"]),
            patch_mask=jnp.asarray(padded["patch_mask"]),
        )

    # -- loops --------------------------------------------------------------
    def _prefetch(self, sampler, ds, collator, depth: int = 2):
        """Depth-bounded background batch preparation — host TSV/audio
        reads + collate + bucket-pad + device upload run in a worker
        thread while the device executes the current step, the JAX
        analogue of the reference DataLoader's worker prefetch (ref
        train/main.py num_workers).  jnp.asarray dispatches the uploads
        asynchronously from the worker; the bounded queue caps host+HBM
        staging at ``depth`` batches.  Exceptions propagate at the
        consuming step."""
        import queue as _queue
        import threading

        q: _queue.Queue = _queue.Queue(maxsize=depth)
        DONE, ERR = object(), object()
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded-wait put so an abandoned consumer (max_steps /
            # debug break) releases the worker instead of leaking it
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except _queue.Full:
                    continue
            return False

        def produce():
            try:
                for idx_batch in sampler:
                    samples = [ds[i] for i in idx_batch]
                    raw = collator(samples)
                    m = raw.get("multiplier", 1)
                    if not _put((m, self._to_batch(raw, m))):
                        return
                _put(DONE)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                _put((ERR, e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    return
                if isinstance(item, tuple) and item[0] is ERR:
                    raise item[1]
                yield item
        finally:
            stop.set()
            t.join(timeout=5.0)

    def fit(self):
        args = self.args
        ds, sampler, collator = self._make_loader(
            args.data_split_train, args.train_bsz, shuffle=True
        )
        step = int(self.state.step)
        # auto-resume (ref: main.py:199-203)
        resume = ckpt.latest_step(os.path.join(args.save_dir, "ckpt"))
        if resume is not None:
            abstract = jax.eval_shape(lambda: self.state)
            # free the freshly-initialised state before restoring, or HBM
            # briefly holds two full copies
            for leaf in jax.tree.leaves(self.state):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            self.state = None
            self.state = ckpt.restore(
                os.path.join(args.save_dir, "ckpt"), abstract
            )
            step = int(jax.device_get(self.state.step))
            print(f"resumed from step {step}")

        t0 = time.time()
        with self.mesh:
            for epoch in range(args.max_epochs):
                sampler.set_epoch(epoch)
                for m, batch in self._prefetch(sampler, ds, collator):
                    self.state, metrics = self._get_step_fn(m)(
                        self.state, batch
                    )
                    step += 1
                    if step % args.log_step == 0:
                        loss = float(metrics["loss"])
                        self.logger.log(
                            {
                                "train_loss": loss,
                                f"train_loss_m{m}": loss,
                                "grad_norm": float(metrics["grad_norm"]),
                                "lr": float(self._schedule(step)),
                                "epoch": epoch,
                                "sec_per_step": (time.time() - t0)
                                / max(step, 1),
                            },
                            step,
                        )
                    if args.eval_step and step % args.eval_step == 0:
                        self.evaluate(step)
                    if args.save_step and step % args.save_step == 0:
                        ckpt.save(
                            os.path.join(args.save_dir, "ckpt"),
                            jax.device_get(self.state),
                            step,
                        )
                    if args.max_steps and step >= args.max_steps:
                        break
                    if args.debug_mode:
                        break
                if (args.max_steps and step >= args.max_steps) or args.debug_mode:
                    break
            ckpt.save(
                os.path.join(args.save_dir, "ckpt"),
                jax.device_get(self.state),
                step,
            )
        return step

    def evaluate(self, step: int):
        args = self.args
        try:
            ds, sampler, collator = self._make_loader(
                args.data_split_eval, args.eval_bsz, shuffle=False
            )
        except FileNotFoundError:
            return None
        losses = []
        for idx_batch in sampler:
            samples = [ds[i] for i in idx_batch]
            raw = collator(samples)
            m = raw.get("multiplier", 1)
            if m not in self._eval_fns:
                self._eval_fns[m] = jax.jit(
                    tstep.eval_step_fn(
                        self.cfg, args.block_size, args.max_cache_size, m
                    )
                )
            batch = self._to_batch(raw, m)
            losses.append(
                float(self._eval_fns[m](self.state.params, batch))
            )
            if args.debug_mode:
                break
        if losses:
            self.logger.log({"eval_loss": float(np.mean(losses))}, step)
        return float(np.mean(losses)) if losses else None
