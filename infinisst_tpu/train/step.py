"""Sharded training step: optax AdamW under jit with GSPMD shardings.

Replaces the reference's Lightning + DeepSpeed ZeRO-2 stack
(train/main.py:170-196, model/model.py:255-290): the optimizer is optax
adamw with warmup-cosine or warmup-constant schedules, gradient clipping,
and optimizer/parameter sharding expressed as PartitionSpecs
(parallel/mesh.py) — XLA's reduce-scatter/all-gather over ICI is the ZeRO
equivalent, no NCCL analogue needed.

Freeze flags reproduce the two-stage recipe (ref: model/model.py:106-138,
scripts/train/stage{1,2}.sh): stage 1 freezes the LLM (body+embed+head) and
trains encoder+adapter; stage 2 freezes the w2v2 body and trains
adapter+LLM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple  # noqa: F401

import jax
import jax.numpy as jnp
import optax

from infinisst_tpu.core.config import ModelConfig
from infinisst_tpu.models import speech_llm
from infinisst_tpu.train.objective import lm_loss


@dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 2e-4
    warmup_steps: int = 1000
    total_steps: int = 100_000
    scheduler: str = "cosine"  # 'cosine' | 'constant'
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    clip_norm: float = 1.0
    min_lr_ratio: float = 0.0


@dataclass(frozen=True)
class FreezeConfig:
    """ref: train/main.py:60-76 (llm_freeze etc.), model/model.py:106-138."""

    w2v2: bool = False
    adapter: bool = False
    llm: bool = False
    llm_embed: bool = False
    llm_head: bool = False

    @staticmethod
    def stage1() -> "FreezeConfig":
        return FreezeConfig(llm=True, llm_embed=True, llm_head=True)

    @staticmethod
    def stage2() -> "FreezeConfig":
        return FreezeConfig(w2v2=True)


def trainable_mask(params: Dict[str, Any], freeze: FreezeConfig):
    """Pytree of bools: True = trainable."""

    def mask_subtree(tree, flag):
        return jax.tree.map(lambda _: not flag, tree)

    llama = params["llama"]
    llama_mask = {
        "embed": not freeze.llm_embed,
        "layers": jax.tree.map(lambda _: not freeze.llm, llama["layers"]),
        "final_ln": not freeze.llm,
        "lm_head": not freeze.llm_head,
    }
    return {
        "w2v2": mask_subtree(params["w2v2"], freeze.w2v2),
        "adapter": mask_subtree(params["adapter"], freeze.adapter),
        "llama": llama_mask,
    }


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    peak = cfg.learning_rate
    if cfg.scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=peak,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
            end_value=peak * cfg.min_lr_ratio,
        )
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak, cfg.warmup_steps),
            optax.constant_schedule(peak),
        ],
        [cfg.warmup_steps],
    )


def make_optimizer(
    cfg: OptimConfig, params, freeze: FreezeConfig
) -> optax.GradientTransformation:
    mask = trainable_mask(params, freeze)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(
            make_schedule(cfg),
            b1=cfg.b1,
            b2=cfg.b2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    # multi_transform (not optax.masked): masked passes the raw gradient
    # through for frozen leaves; set_to_zero actually freezes them.
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, tx) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


class Batch(NamedTuple):
    """One training batch (collated host-side; see data/collators.py).
    The latency multiplier is static per compiled step (the multi-latency
    collator samples m per batch, ref: train/dataset.py:800) and is passed
    to make_train_step, giving at most max_multiplier compiled variants."""

    speech: jnp.ndarray  # (B, T) raw samples incl. 399-sample offset
    frame_lengths: jnp.ndarray  # (B,) valid encoder frames
    input_ids: jnp.ndarray  # (B, S)
    labels: jnp.ndarray  # (B, S)
    attention_mask: jnp.ndarray  # (B, S)
    patch_mask: jnp.ndarray  # (B, S) bool, ids == sp_patch


def make_train_step(
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    block_frames: int,
    max_cache_frames: int,
    multiplier: int = 1,
    cpo_beta: float = 0.0,
    freeze: Optional[FreezeConfig] = None,
    remat: bool = False,
    encoder_dropout: float = 0.0,
    dropout_seed: int = 0,
) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).  Jit with
    donate_argnums=(0,) and sharding constraints applied by the caller.

    When ``freeze`` is given, gradients are computed only w.r.t. the
    trainable partition (frozen weight-grad buffers are never allocated —
    essential for fitting stage 1's frozen 8B LLM in HBM);
    ``remat`` checkpoints the transformer layers to trade FLOPs for
    activation memory (the jax analogue of gradient checkpointing)."""

    def forward(params, batch: Batch, step=None):
        rng = None
        if encoder_dropout > 0 and step is not None:
            rng = jax.random.fold_in(jax.random.PRNGKey(dropout_seed), step)
        logits = speech_llm.offline_forward(
            params,
            cfg,
            batch.speech,
            batch.input_ids,
            batch.patch_mask,
            block_frames * multiplier,
            max_cache_frames,
            frame_lengths=batch.frame_lengths,
            attention_mask=batch.attention_mask,
            remat=remat,
            dropout_rng=rng,
            dropout_rate=encoder_dropout,
        )
        return lm_loss(logits, batch.labels, cpo_beta)

    if freeze is None:

        def train_step(state: TrainState, batch: Batch):
            loss, grads = jax.value_and_grad(forward)(
                state.params, batch, state.step
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            return (
                TrainState(new_params, new_opt, state.step + 1),
                {"loss": loss, "grad_norm": gnorm},
            )

        return train_step

    # partitioned-grad path
    def train_step(state: TrainState, batch: Batch):
        mask = trainable_mask(state.params, freeze)

        trainable, frozen = _partition(state.params, mask)

        def loss_fn(tr):
            return forward(_combine(tr, frozen, mask), batch, state.step)

        loss, tr_grads = jax.value_and_grad(loss_fn)(trainable)
        zeros = jax.tree.map(jnp.zeros_like, frozen)
        grads = _combine(tr_grads, zeros, mask)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(tr_grads)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


def _partition(params, mask):
    flat_p, treedef = jax.tree.flatten(params)
    flat_m = jax.tree.leaves(mask)
    trainable = [p if m else None for p, m in zip(flat_p, flat_m)]
    frozen = [None if m else p for p, m in zip(flat_p, flat_m)]
    return (
        _PartialTree(treedef, trainable),
        _PartialTree(treedef, frozen),
    )


def _combine(trainable: "_PartialTree", frozen: "_PartialTree", mask):
    flat_m = jax.tree.leaves(mask)
    leaves = [
        t if m else f
        for t, f, m in zip(trainable.leaves, frozen.leaves, flat_m)
    ]
    return jax.tree.unflatten(trainable.treedef, leaves)


@jax.tree_util.register_pytree_node_class
class _PartialTree:
    """A flattened params tree with some leaves masked out (None) — lets
    jax.grad differentiate only the present leaves."""

    def __init__(self, treedef, leaves):
        self.treedef = treedef
        self.leaves = leaves

    def tree_flatten(self):
        present = [x for x in self.leaves if x is not None]
        mask = tuple(x is not None for x in self.leaves)
        return present, (self.treedef, mask)

    @classmethod
    def tree_unflatten(cls, aux, children):
        treedef, mask = aux
        it = iter(children)
        leaves = [next(it) if m else None for m in mask]
        return cls(treedef, leaves)


def eval_step_fn(
    cfg: ModelConfig, block_frames: int, max_cache_frames: int,
    multiplier: int = 1,
) -> Callable:
    def eval_step(params, batch: Batch):
        logits = speech_llm.offline_forward(
            params,
            cfg,
            batch.speech,
            batch.input_ids,
            batch.patch_mask,
            block_frames * multiplier,
            max_cache_frames,
            frame_lengths=batch.frame_lengths,
            attention_mask=batch.attention_mask,
        )
        return lm_loss(logits, batch.labels)

    return eval_step
