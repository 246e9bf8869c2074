"""Training orchestration: config, train state, jitted steps, Trainer loop.

TPU-native re-design of the reference trainer (trainer/trainer_torchrun.py):

  reference (torch/DDP)                    this framework (JAX/pjit)
  ---------------------------------------  --------------------------------
  torchrun env discovery (:31-33)          jax.distributed/process_index
  init_process_group NCCL (:67-76)         Mesh over all devices (GSPMD)
  DDP allreduce hooks (:116-121)           batch axis sharding → psum by XLA
  SyncBatchNorm (:112-113)                 global batch-stat means for free
  DistributedSampler (:130-136)            DataLoader(process_index/count)
  GradScaler AMP loop (:219, :293-301)     bf16 compute dtype (no scaler
                                           needed on TPU), fp32 params
  clip_grad_norm (:288)                    optax.clip_by_global_norm
  OneCycleLR (tests/train_torchrun.py:60)  optax.linear_onecycle_schedule
  torch.save rank-0 ckpt (:155-179)        orbax checkpoint (process 0)
  epoch-granular resume (:182-212)         epoch-granular resume
                                           (kill-tested, test_resume_concat)

The loss dispatch mirrors trainer_torchrun.py:264-301: models returning
``(init_disp, disp_preds)`` use the RAFT exp-weighted sequence loss
(:277-284); models returning a plain list use fixed multi-head weights.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core as flax_core
from flax import struct

from stereo_toolbox_tpu import losses, metrics
from stereo_toolbox_tpu.parallel import (batch_sharding, make_mesh,
                                         replicated)
from jax.sharding import NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class TrainConfig:
    """Typed config tree (replaces the reference's duck-typed `config` object
    read with hasattr defaults, trainer_torchrun.py:44-54)."""
    lr: float = 2e-4
    batch_size: int = 4           # global batch
    epochs: int = 20
    total_steps: int | None = None  # overrides epochs*len(loader) if set
    weight_decay: float = 1e-5
    clip_grad: float = 1.0
    loss: str = "sequence"        # 'sequence' | 'multihead' | 'selfsup'
    loss_gamma: float = 0.9
    loss_weights: Sequence[float] = (0.5, 0.7, 1.0)
    smooth_weight: float = 0.1    # selfsup: smoothness-term weight
    max_disp: int = 192
    seed: int = 0
    pct_start: float = 0.1        # OneCycle warmup fraction
    ckpt_dir: str = "checkpoints"
    save_every: int = 1           # epochs
    log_every: int = 50           # steps
    log_dir: str | None = None    # TensorBoard/JSONL scalar directory


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=params, opt_state=opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats))


def make_optimizer(config: TrainConfig, total_steps: int):
    """Adam + OneCycle linear schedule + global-norm clipping.

    Parity: tests/train_torchrun.py:57-65 (Adam, OneCycleLR linear anneal,
    pct_start 0.1) and trainer_torchrun.py:288 (clip_grad_norm).
    """
    # torch OneCycleLR(anneal_strategy='linear', pct_start) parity: linear
    # warmup lr/25 → lr over the first pct_start, then linear decay to
    # lr/(25*1e4) (div_factor/final_div_factor defaults).
    warm = max(int(total_steps * config.pct_start), 1)
    sched = optax.join_schedules(
        [optax.linear_schedule(config.lr / 25.0, config.lr, warm),
         optax.linear_schedule(config.lr, config.lr / 25.0e4,
                               max(total_steps - warm, 1))],
        [warm])
    chain = []
    if config.clip_grad:
        chain.append(optax.clip_by_global_norm(config.clip_grad))
    chain.append(optax.adam(sched))
    return optax.chain(*chain), sched


def init_train_state(model, config: TrainConfig, sample_batch,
                     total_steps: int, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(config.seed)
    left = jnp.asarray(sample_batch["left"][:1])
    right = jnp.asarray(sample_batch["right"][:1])
    variables = jax.jit(model.init, static_argnames="train")(
        rng, left, right, train=True)
    tx, _ = make_optimizer(config, total_steps)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", flax_core.freeze({})),
        opt_state=tx.init(params),
        tx=tx,
    )


def compute_loss(outputs, gt, mask, config: TrainConfig, batch=None):
    """Dispatch on the loss mode and model-output structure (trainer
    contract §0). ``loss='selfsup'`` trains without GT from the images
    alone (round-3 verdict item 6; SURVEY §3.5)."""
    if config.loss == "selfsup":
        assert batch is not None, "selfsup loss needs the image batch"
        return losses.selfsup_sequence_loss(
            outputs, batch["left"], batch["right"],
            smooth_weight=config.smooth_weight,
            loss_gamma=config.loss_gamma)
    if isinstance(outputs, tuple) and len(outputs) == 2:
        init_disp, preds = outputs
        return losses.sequence_loss(preds, gt, mask, init_disp=init_disp,
                                    loss_gamma=config.loss_gamma)
    if isinstance(outputs, tuple) and len(outputs) == 3:
        # MonSter contract: (init_disp, disp_preds, depth_mono) — the mono
        # branch is frozen (monster.py:317-320), so only the stereo
        # sequence is supervised
        init_disp, preds, _depth_mono = outputs
        return losses.sequence_loss(preds, gt, mask, init_disp=init_disp,
                                    loss_gamma=config.loss_gamma)
    if config.loss == "sequence":
        return losses.sequence_loss(list(outputs), gt, mask,
                                    loss_gamma=config.loss_gamma)
    return losses.multi_head_loss(list(outputs), gt, mask,
                                  config.loss_weights)


def make_train_step(model, config: TrainConfig,
                    mesh=None) -> Callable:
    """Build the jitted train step. With a mesh, the batch arrives sharded on
    the 'data' axis and XLA inserts the gradient all-reduce."""

    def step_fn(state: TrainState, batch):
        if "gt_disp" in batch:
            gt = batch["gt_disp"]
        else:  # no-GT data (Holopix50k-style) — selfsup ignores gt anyway
            gt = jnp.full(batch["left"].shape[:3], jnp.nan,
                          batch["left"].dtype)
        mask = metrics.valid_mask(gt, config.max_disp)

        def loss_fn(params):
            variables = {"params": params}
            has_bn = bool(jax.tree_util.tree_leaves(state.batch_stats))
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                outputs, updates = model.apply(
                    variables, batch["left"], batch["right"], train=True,
                    mutable=["batch_stats"])
                new_stats = updates["batch_stats"]
            else:
                outputs = model.apply(variables, batch["left"],
                                      batch["right"], train=True)
                new_stats = state.batch_stats
            loss = compute_loss(outputs, gt, mask, config, batch=batch)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    # State fully replicated; batch shardings are inherited from the arrays
    # (shard_batch puts B on 'data' and optionally H on 'spatial').
    return jax.jit(
        step_fn,
        in_shardings=(replicated(mesh), None),
        donate_argnums=0)


def make_eval_step(model) -> Callable:
    """Jitted eval forward (the trainer-side twin of evaluation.make_apply)."""
    def eval_fn(variables, left, right):
        return model.apply(variables, left, right, train=False)
    return jax.jit(eval_fn)


class Trainer:
    """Epoch-driven training loop (reference Trainer.train,
    trainer_torchrun.py:215-261)."""

    def __init__(self, model, config: TrainConfig, mesh=None,
                 lr_schedule: Callable | None = None):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.train_step = make_train_step(model, config, mesh=mesh)
        self.lr_schedule = lr_schedule
        from stereo_toolbox_tpu.utils.observability import ScalarWriter
        self.writer = ScalarWriter(config.log_dir)
        self._losses: list[float] = []

    # -- checkpointing ---------------------------------------------------
    def save_checkpoint(self, state: TrainState, epoch: int):
        if jax.process_index() != 0:
            return
        import orbax.checkpoint as ocp
        path = os.path.abspath(
            os.path.join(self.config.ckpt_dir, f"epoch_{epoch:04d}"))
        ckpt = {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "epoch": epoch}
        ocp.PyTreeCheckpointer().save(path, ckpt, force=True)

    def load_checkpoint(self, state: TrainState, path: str):
        import orbax.checkpoint as ocp
        target = {"step": state.step, "params": state.params,
                  "batch_stats": state.batch_stats,
                  "opt_state": state.opt_state, "epoch": 0}
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(path), item=target)
        return state.replace(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"]), restored["epoch"]

    # -- the loop --------------------------------------------------------
    def train(self, state: TrainState, loader, epochs: int | None = None,
              start_epoch: int = 0, log: Callable[[str], None] = print):
        """Run epochs ``[start_epoch, epochs)``. Pass the epoch returned by
        `load_checkpoint` + 1 as `start_epoch` to resume — epoch-granular,
        like the reference (trainer_torchrun.py:182-212, which restores
        `start_epoch = checkpoint['epoch'] + 1`)."""
        epochs = epochs or self.config.epochs
        for epoch in range(start_epoch, epochs):
            loader.set_epoch(epoch)
            t0 = time.time()
            n = 0
            running = 0.0
            for batch in loader:
                batch = {k: v for k, v in batch.items()
                         if k in ("left", "right", "gt_disp")}
                if self.mesh is not None:
                    from stereo_toolbox_tpu.parallel import shard_batch
                    batch = shard_batch(batch, self.mesh)
                else:
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                state, loss = self.train_step(state, batch)
                n += 1
                if n % self.config.log_every == 0:
                    running = float(loss)
                    step = int(state.step)
                    scalars = {"train/loss": running, "train/epoch": epoch,
                               "perf/steps_per_s": n / max(time.time() - t0,
                                                           1e-9)}
                    if self.lr_schedule is not None:
                        scalars["train/lr"] = float(self.lr_schedule(step - 1))
                    self.writer.scalars(step, **scalars)
                    log(f"epoch {epoch} step {n}: loss {running:.4f}")
            dt = time.time() - t0
            log(f"epoch {epoch} done: {n} steps in {dt:.1f}s "
                f"({n / max(dt, 1e-9):.2f} it/s)")
            self.writer.flush()
            if (epoch + 1) % self.config.save_every == 0:
                self.save_checkpoint(state, epoch)
        return state
