"""Trainers: epoch loop, fail-safe restart, checkpointing, stats.

Re-design of reference `ltr/trainers/base_trainer.py` (BaseTrainer:14, fail-safe
train:52-88, atomic checkpoints :95-125) and `ltr/trainers/ltr_trainer.py`
(LTRTrainer:54 cycle_dataset hot loop, AverageMeter stats :104-130).

TPU-first: the hot loop calls ONE jitted data-parallel train step (parallel/mesh.py);
the loader produces frame-major numpy batches which are device-put with the sequence
axis sharded over the mesh's data axis. Checkpoints are flax-serialized with a JSON
sidecar (constructor-carrying, like the reference's pickled NetConstructor).
"""

from __future__ import annotations

import glob
import json
import os
import time
import traceback
from collections import OrderedDict
from typing import Dict, List, Optional

import jax
import numpy as np
from flax import serialization


class AverageMeter:
    """(reference ltr/admin/stats.py:1-20)"""

    def __init__(self):
        self.reset()

    def reset(self):
        self.avg, self.sum, self.count = 0.0, 0.0, 0

    def update(self, val, n=1):
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count


class BaseTrainer:
    """Epoch loop with fail-safe auto-restart (reference base_trainer.py:52-88)."""

    def __init__(self, settings, checkpoint_dir: str):
        self.settings = settings
        self._checkpoint_dir = checkpoint_dir
        self.epoch = 0

    def train(self, max_epochs: int, load_latest: bool = False,
              fail_safe: bool = True):
        epoch = -1
        num_tries = 10 if fail_safe else 1
        for i in range(num_tries):
            try:
                if load_latest:
                    self.load_checkpoint()
                for epoch in range(self.epoch + 1, max_epochs + 1):
                    self.epoch = epoch
                    self.train_epoch()
                    self.save_checkpoint()
                break
            except Exception:
                print(f"Training crashed at epoch {epoch}")
                if not fail_safe or i == num_tries - 1:
                    raise
                self.epoch -= 1
                load_latest = True
                print(traceback.format_exc())
                print("Restarting training from last epoch ...")
        print("Finished training!")

    def train_epoch(self):
        raise NotImplementedError

    # ------------------------------------------------------------------ checkpoints

    def _state_dict(self) -> dict:
        raise NotImplementedError

    def _load_state_dict(self, state: dict):
        raise NotImplementedError

    def save_checkpoint(self):
        os.makedirs(self._checkpoint_dir, exist_ok=True)
        state = self._state_dict()
        state["epoch"] = self.epoch
        path = os.path.join(self._checkpoint_dir, f"ep{self.epoch:04d}.ckpt")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.tree_util.tree_map(np.asarray, state)))
        os.replace(tmp, path)  # atomic (reference base_trainer.py:120-125)

    def load_checkpoint(self, checkpoint: Optional[str] = None) -> bool:
        if checkpoint is None:
            ckpts = sorted(glob.glob(os.path.join(self._checkpoint_dir, "ep*.ckpt")))
            if not ckpts:
                return False
            checkpoint = ckpts[-1]
        with open(checkpoint, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        self.epoch = int(state.pop("epoch"))
        self._load_state_dict(state)
        print(f"Loaded checkpoint {checkpoint} (epoch {self.epoch})")
        return True


class LTRTrainer(BaseTrainer):
    """Cycle loaders each epoch, jitted train step, stats printing
    (reference ltr_trainer.py:54-152)."""

    def __init__(self, actor, loaders: List, optimizer, settings,
                 checkpoint_dir: str, params, batch_stats=None, mesh=None,
                 print_interval: int = 10):
        # LR schedules live inside the optax optimizer (training/optim.py), not as
        # a separate scheduler object like torch
        super().__init__(settings, checkpoint_dir)
        from pytracking_tpu.parallel.mesh import make_train_step

        self.actor = actor
        self.loaders = loaders
        self.optimizer = optimizer
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = optimizer.init(params)
        self.mesh = mesh
        self.print_interval = print_interval
        self._train_step = make_train_step(actor, optimizer)
        self.stats: Dict[str, Dict[str, AverageMeter]] = {}
        self._tb_writers: Dict[str, object] = {}

    def _tb_writer(self, loader_name: str):
        """One TensorBoard SummaryWriter per loader (reference
        ltr/admin/tensorboard.py:10-26); falls back to a JSONL stats log when
        tensorboardX is unavailable."""
        if loader_name not in self._tb_writers:
            import os
            log_dir = os.path.join(self._checkpoint_dir, "tensorboard", loader_name)
            os.makedirs(log_dir, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter
                self._tb_writers[loader_name] = SummaryWriter(log_dir)
            except Exception:
                self._tb_writers[loader_name] = _JsonlWriter(
                    os.path.join(log_dir, "stats.jsonl"))
        return self._tb_writers[loader_name]

    def _write_epoch_stats(self):
        """Epoch-averaged scalars per loader (reference ltr_trainer.py:150-152)."""
        for name, meters in self.stats.items():
            w = self._tb_writer(name)
            for k, m in meters.items():
                w.add_scalar(k, m.avg, self.epoch)

    def _state_dict(self):
        return {"params": self.params, "batch_stats": self.batch_stats or {},
                "opt_state": serialization.to_state_dict(self.opt_state)}

    def _load_state_dict(self, state):
        self.params = jax.tree_util.tree_map(lambda a, b: b, self.params,
                                             state["params"])
        if self.batch_stats is not None and state.get("batch_stats"):
            self.batch_stats = jax.tree_util.tree_map(lambda a, b: b,
                                                      self.batch_stats,
                                                      state["batch_stats"])
        self.opt_state = serialization.from_state_dict(self.opt_state,
                                                       state["opt_state"])

    def cycle_dataset(self, loader):
        """Hot loop (reference ltr_trainer.py:54-90)."""
        from pytracking_tpu.parallel.mesh import shard_batch

        meters = self.stats.setdefault(loader.name, {})
        start = time.time()
        num_frames = 0
        for i, batch in enumerate(loader, 1):
            # per-step dropout seed for actors whose nets use dropout (the
            # ToMP/TaMOs transformer); scalar, so it replicates under shard_batch
            batch["rng_seed"] = np.int32(self.epoch * 1_000_003 + i)
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch, batch_axis=1)
            else:
                batch = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x) if not isinstance(x, (str, list)) else x,
                    {k: v for k, v in batch.items() if k != "dataset"})
            if loader.training:
                (self.params, self.batch_stats, self.opt_state, loss,
                 stats) = self._train_step(self.params, self.batch_stats,
                                           self.opt_state, batch)
            else:
                loss, (stats, _) = self.actor(self.params, self.batch_stats, batch)

            bs = batch["train_images"].shape[1]
            num_frames += bs
            for k, v in stats.items():
                meters.setdefault(k, AverageMeter()).update(float(v), bs)

            if i % self.print_interval == 0:
                fps = num_frames / (time.time() - start)
                line = f"[{loader.name}: {self.epoch}, {i}/{len(loader)}] FPS: {fps:.1f}, " \
                    + ", ".join(f"{k}: {m.avg:.4f}" for k, m in meters.items())
                print(line)

    def train_epoch(self):
        for loader in self.loaders:
            if self.epoch % loader.epoch_interval == 0:
                for m in self.stats.get(loader.name, {}).values():
                    m.reset()
                self.cycle_dataset(loader)
        self._write_epoch_stats()


class _JsonlWriter:
    """Fallback scalar writer: one JSON line per (tag, value, step)."""

    def __init__(self, path: str):
        self.path = path

    def add_scalar(self, tag, value, step):
        import json

        with open(self.path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": value, "step": step}) + "\n")
