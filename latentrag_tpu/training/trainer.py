"""Generic jitted autoencoder trainer: Optax, early stopping, checkpoints.

Replaces the reference's three near-identical torch loops
(``training/train_vae.py:22-84``, ``train_dae.py:25-112``,
``train_cae.py:36-136``) with one functional trainer:

* per-variant jitted train/eval steps (donated state, fp32 loss accumulation);
* Adam (+ optional decoupled weight decay and global-norm clipping, the CAE
  extras, ``train_cae.py:23-30, 93-94``);
* ReduceLROnPlateau-style schedule via ``optax.inject_hyperparams`` (LR lives
  in the optimizer state and is scaled host-side between epochs);
* early stopping with absolute (VAE/DAE, ``train_vae.py:75-82``) or relative
  (CAE, ``train_cae.py:120-121``) min-delta and patience;
* Orbax checkpoints carrying params AND optimizer state + epoch counters, so
  training is resumable (the reference restarts from scratch — SURVEY §5);
* data parallelism: batches are sharded over the mesh ``data`` axis and
  params replicated, so the same step runs 1-device or N-device unchanged.
"""

from __future__ import annotations

import functools
import logging
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.autoencoders import init_autoencoder
from ..utils.config import TrainingConfig
from .losses import contrastive_loss, dae_loss, vae_loss

log = logging.getLogger("latentrag.train")


@dataclass
class TrainResult:
    params: Any
    best_val_loss: float
    epochs_ran: int
    history: list = field(default_factory=list)  # (epoch, train_loss, val_loss)
    stopped_early: bool = False


def _make_optimizer(cfg: TrainingConfig) -> optax.GradientTransformation:
    components = []
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        components.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay and cfg.weight_decay > 0:
        inner = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay
        )
    else:
        inner = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate
        )
    components.append(inner)
    return optax.chain(*components) if len(components) > 1 else inner


def _loss_fn(model, ae_type: str, cfg: TrainingConfig):
    if ae_type == "vae":

        def loss(params, batch, rng):
            recon, mu, logvar = model.apply(
                {"params": params}, batch["x"], train=True,
                rngs={"reparam": rng},
            )
            total, _aux = vae_loss(recon, batch["y"], mu, logvar, beta=cfg.beta)
            return total

    elif ae_type == "dae":

        def loss(params, batch, rng):
            recon = model.apply({"params": params}, batch["x"], train=True)
            return dae_loss(recon, batch["y"])

    elif ae_type == "cae":

        def loss(params, batch, rng):
            enc = lambda v: model.apply({"params": params}, v, method="encode")
            z_q, z_p = enc(batch["q"]), enc(batch["p"])
            # when mining in-batch hard negatives, dataset negatives are
            # unused — don't spend a third of the encode work on them
            z_n = (
                enc(batch["n"])
                if "n" in batch and not cfg.mine_hard_negatives
                else None
            )
            return contrastive_loss(
                z_q,
                z_p,
                z_n,
                margin=cfg.triplet_margin,
                mine_hard_negatives=cfg.mine_hard_negatives,
            )

    else:
        raise ValueError(f"unknown ae_type {ae_type!r}")
    return loss


class Trainer:
    """Train one autoencoder variant on host-resident numpy arrays."""

    def __init__(
        self,
        model,
        ae_type: str,
        cfg: TrainingConfig,
        mesh: Mesh | None = None,
    ):
        self.model = model
        self.ae_type = ae_type
        self.cfg = cfg
        self.mesh = mesh
        self.tx = _make_optimizer(cfg)
        loss = _loss_fn(model, ae_type, cfg)

        @jax.jit
        def train_step(params, opt_state, batch, rng):
            loss_val, grads = jax.value_and_grad(loss)(params, batch, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_val

        @jax.jit
        def eval_step(params, batch, rng):
            return loss(params, batch, rng)

        self._train_step = train_step
        self._eval_step = eval_step

    # -- data plumbing ------------------------------------------------------

    def _device_batch(self, arrays: Mapping[str, np.ndarray]) -> dict:
        batch = {k: jnp.asarray(v) for k, v in arrays.items()}
        if self.mesh is not None:
            p = self.mesh.shape["data"]
            n_rows = next(iter(batch.values())).shape[0]
            # a ragged tail batch (val with drop_last=False, or a tiny
            # dataset) can't be row-sharded evenly — replicate it instead of
            # crashing; the loss value is identical either way
            spec = P("data") if n_rows % p == 0 else P()
            sharding = NamedSharding(self.mesh, spec)
            batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return batch

    def _batches(self, data, batch_size, rng=None, drop_last=True):
        keys = list(data.keys())
        n = len(data[keys[0]])
        idx = np.arange(n)
        if rng is not None:
            rng.shuffle(idx)
        if self.mesh is not None:
            # keep batches divisible by the mesh for even sharding
            p = self.mesh.shape["data"]
            batch_size = batch_size - (batch_size % p) or p
        if drop_last and n < batch_size and n > 0:
            # batch_size > dataset: rather than silently yielding nothing
            # (and training a zero-step epoch), train on one full-data batch
            log.warning(
                "batch_size %d > dataset size %d; using one %d-row batch",
                batch_size, n, n,
            )
            yield self._device_batch({k: data[k][idx] for k in keys})
            return
        end = n - (n % batch_size) if drop_last else n
        for start in range(0, max(end, 0), batch_size):
            sel = idx[start : start + batch_size]
            if drop_last and len(sel) < batch_size:
                break
            yield self._device_batch({k: data[k][sel] for k in keys})

    # -- fitting ------------------------------------------------------------

    def fit(
        self,
        train_data: Mapping[str, np.ndarray],
        val_data: Mapping[str, np.ndarray],
        *,
        checkpoint_dir: str | None = None,
        init_params=None,
        seed: int | None = None,
        resume: bool = False,
    ) -> TrainResult:
        cfg = self.cfg
        seed = cfg.seed if seed is None else seed
        root = jax.random.PRNGKey(seed)
        shuffle_rng = np.random.default_rng(seed)

        input_dim = next(iter(train_data.values())).shape[1]
        params = (
            init_params
            if init_params is not None
            else init_autoencoder(self.model, root, input_dim)
        )
        opt_state = self.tx.init(params)

        best_val = float("inf")
        best_params = params
        start_epoch = 0
        if resume and checkpoint_dir and os.path.isdir(checkpoint_dir):
            # continue a preempted run from the last saved improvement
            # (params + optimizer state + epoch; the shuffle stream
            # restarts — statistically, not bitwise, continuous)
            params, opt_state, best_val, start_epoch = (
                restore_training_state(checkpoint_dir, self.tx, params)
            )
            best_params = params
            log.info(
                "[%s] resumed from %s at epoch %d (best val %.5f)",
                self.ae_type, checkpoint_dir, start_epoch, best_val,
            )
        patience_left = cfg.early_stop_patience
        plateau_left = cfg.lr_plateau_patience
        history: list = []
        stopped = False
        epochs_ran = start_epoch

        for epoch in range(start_epoch, cfg.epochs):
            epochs_ran = epoch + 1
            root, ek = jax.random.split(root)
            # train
            losses = []
            for bi, batch in enumerate(
                self._batches(train_data, cfg.batch_size, shuffle_rng)
            ):
                ek, sk = jax.random.split(ek)
                params, opt_state, lv = self._train_step(
                    params, opt_state, batch, sk
                )
                losses.append(lv)
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            # validate (deterministic rng for reproducible VAE KL sampling)
            vlosses = []
            vrng = jax.random.PRNGKey(seed + 1)
            for batch in self._batches(
                val_data, cfg.batch_size, rng=None, drop_last=False
            ):
                vrng, sk = jax.random.split(vrng)
                vlosses.append(self._eval_step(params, batch, sk))
            val_loss = float(jnp.mean(jnp.stack(vlosses))) if vlosses else train_loss
            history.append((epoch, train_loss, val_loss))
            log.info(
                "[%s] epoch %d train %.5f val %.5f", self.ae_type, epoch,
                train_loss, val_loss,
            )

            # early stopping: absolute or relative improvement
            if cfg.early_stop_relative:
                improved = val_loss < best_val * (1.0 - cfg.early_stop_min_delta)
            else:
                improved = val_loss < best_val - cfg.early_stop_min_delta
            if improved:
                best_val = val_loss
                best_params = params
                patience_left = cfg.early_stop_patience
                plateau_left = cfg.lr_plateau_patience
                if checkpoint_dir:
                    self.save_checkpoint(
                        checkpoint_dir, best_params, opt_state, epoch, best_val
                    )
            else:
                patience_left -= 1
                plateau_left -= 1
                if cfg.lr_plateau_factor and plateau_left <= 0:
                    opt_state = _scale_lr(opt_state, cfg.lr_plateau_factor)
                    plateau_left = cfg.lr_plateau_patience
                if patience_left <= 0:
                    stopped = True
                    log.info("[%s] early stop at epoch %d", self.ae_type, epoch)
                    break

        return TrainResult(
            params=best_params,
            best_val_loss=best_val,
            epochs_ran=epochs_ran,
            history=history,
            stopped_early=stopped,
        )

    # -- checkpointing ------------------------------------------------------

    def save_checkpoint(self, path, params, opt_state, epoch, best_val):
        save_checkpoint(path, {
            "params": params,
            "opt_state": opt_state,
            "epoch": epoch,
            "best_val": best_val,
        })

    def load_checkpoint(self, path):
        return load_checkpoint(path)


def _scale_lr(opt_state, factor: float):
    """Scale the injected learning_rate hyperparam inside the optax state.

    ``InjectHyperparamsState`` is itself a NamedTuple, so the node must be
    checked for ``hyperparams`` BEFORE recursing into its tuple fields —
    otherwise the un-chained plain-Adam state (the default optimizer) is
    walked straight past and the plateau schedule silently does nothing.
    """

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            node.hyperparams["learning_rate"] = (
                node.hyperparams["learning_rate"] * factor
            )
            return True
        if isinstance(node, tuple):
            for item in node:
                if visit(item):
                    return True
        return False

    visit(opt_state)
    return opt_state


def restore_training_state(checkpoint_dir: str, tx, params):
    """Restore (params, opt_state, best_val, start_epoch) from an Orbax
    training checkpoint — the shared resume primitive for every trainer.

    Orbax restores the optax state as plain dicts; the namedtuple
    structure is rebuilt from a fresh ``tx.init(params)`` template (leaf
    traversal order matches — adamw's count/mu/nu fields restore in field
    order). If structures ever diverge, training resumes with a fresh
    optimizer rather than failing (params/epoch are the valuable part).
    """
    st = load_checkpoint(checkpoint_dir)
    params = st["params"]
    opt_state = tx.init(params)
    raw_opt = st.get("opt_state")
    if raw_opt is not None:
        try:
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state), jax.tree.leaves(raw_opt)
            )
        except Exception as e:
            log.warning(
                "optimizer state restore failed (%s); resuming params/"
                "epoch with a fresh optimizer", e,
            )
    return params, opt_state, float(st["best_val"]), int(st["epoch"]) + 1


def save_checkpoint(path: str, payload: Mapping[str, Any]) -> None:
    """Orbax checkpoint (async-safe, atomic); overwrites existing."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, dict(payload))
    ckptr.wait_until_finished()


def load_checkpoint(path: str):
    """Restore every array as host numpy, ignoring saved shardings.

    Orbax bakes the writing process's device shardings into the checkpoint
    metadata; a default restore on a different platform fails with "Device
    TPU v5 lite0 was not found" — but train-on-TPU / serve-on-CPU is a
    normal workflow. Numpy leaves are placement-free; jit moves them to
    whatever device the consumer runs on.
    """
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta = ocp.PyTreeCheckpointer().metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

    def _abstract(leaf_meta):
        dtype = getattr(leaf_meta, "dtype", None) or np.float32
        return jax.ShapeDtypeStruct(leaf_meta.shape, dtype,
                                    sharding=sharding)

    restored = ocp.StandardCheckpointer().restore(
        path, jax.tree.map(_abstract, tree)
    )
    return jax.tree.map(np.asarray, restored)
