"""Task modules: bind a flax model + TrainState + jitted steps + schedulers.

Counterpart of reference src/base/module.py (BaseModule owning model, loss,
optimizers, schedulers, scalers) and the task modules
(src/classification/module.py, src/keypoints/module.py). The torch pieces
collapse: loss lives inside the jitted step, there is no GradScaler (bf16),
and optimizer state is part of the TrainState pytree.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import init_classification_weights, init_keypoints_weights
from ..parallel import local_batch_to_global
from .optim import LRScheduler, create_lr_scheduler, create_optimizer
from .state import TrainState
from .steps import (
    accumulated_classification_train_step,
    accumulated_keypoints_train_step,
    classification_train_step,
    classification_val_step,
    keypoints_train_step,
    keypoints_val_step,
)


class BaseModule:
    name: str = "base"

    def __init__(
        self,
        model,
        state: TrainState,
        schedulers: dict[str, LRScheduler],
        mesh=None,
        accumulate_grad_batches: int = 1,
    ):
        self.model = model
        self.state = state
        self.schedulers = schedulers
        self.mesh = mesh
        # >1: split each batch into that many microbatches inside the jitted
        # step, averaging grads (train/steps.py _accumulated_step) — the
        # memory route to reference-scale effective batches without remat
        self.accumulate_grad_batches = accumulate_grad_batches
        self.total_batches: dict[str, int] = {}

    # -- factory -------------------------------------------------------------
    @classmethod
    def create(
        cls,
        model,
        input_shape: tuple,
        optimizers_cfg: dict,
        lr_schedulers_cfg: dict,
        seed: int = 42,
        init_weights: Callable | None = None,
        mesh=None,
        accumulate_grad_batches: int = 1,
    ) -> "BaseModule":
        """Build state from config dicts shaped like the reference yaml
        (module.optimizers./module.lr_schedulers., single 'optim' entry)."""
        import jax.numpy as jnp

        rng = jax.random.PRNGKey(seed)
        dtype = getattr(model, "dtype", jnp.float32)
        variables = model.init(
            rng, jnp.zeros((1, *input_shape), dtype), train=False
        )
        params = variables["params"]
        if init_weights is not None:
            params = init_weights(params, rng)
        opt_cfg = optimizers_cfg["optim"]
        lr = float(opt_cfg.get("params", {}).get("lr", 1e-3))
        other = {k: v for k, v in opt_cfg.get("params", {}).items() if k != "lr"}
        # torch betas tuple arrives as a list from yaml
        if "betas" in other:
            other["betas"] = tuple(other["betas"])
        tx = create_optimizer(opt_cfg["name"], lr=lr, **other)
        state = TrainState.create(
            model.apply, params, variables.get("batch_stats"), tx
        )
        if mesh is not None:
            # place the freshly initialized state on the mesh: single-process
            # this is a plain replicating device_put; multi-host it builds
            # the explicitly-global arrays jit requires (every process holds
            # the same same-seed values, mirroring the reference's identical
            # per-rank init before the DDP broadcast, src/base/model.py:45-48)
            from ..parallel import replicate_global

            state = replicate_global(mesh, state)
        schedulers = {}
        for key, sch in (lr_schedulers_cfg or {}).items():
            schedulers[key] = create_lr_scheduler(
                lr, sch["name"], sch.get("interval", "epoch"), **(sch.get("params") or {})
            )
        if not schedulers:
            schedulers["optim"] = create_lr_scheduler(lr, "ConstantLR")
        return cls(
            model, state, schedulers, mesh=mesh,
            accumulate_grad_batches=accumulate_grad_batches,
        )

    # -- lr ------------------------------------------------------------------
    @property
    def lr(self) -> float:
        return next(iter(self.schedulers.values())).lr

    def on_step_end(self) -> None:
        for s in self.schedulers.values():
            if s.interval == "step":
                s.step()

    def on_epoch_end(self, val_metrics: dict | None = None) -> None:
        for s in self.schedulers.values():
            if s.interval == "epoch":
                metric = None
                if val_metrics is not None:
                    metric = val_metrics.get("loss")
                s.step(metric)

    # -- device placement ----------------------------------------------------
    def batch_to_device(self, batch: dict) -> dict:
        # Batches staged ahead by train/prefetch.DevicePrefetcher are fresh
        # transfers consumed exactly once — already on device (and sharded
        # under a mesh), no defensive copy needed.
        from .prefetch import DeviceBatch

        if isinstance(batch, DeviceBatch):
            # plain-dict view (same array refs): DeviceBatch itself is not a
            # registered pytree node, so it must not reach a jitted step
            return dict(batch)
        # The train steps donate the batch buffers. jnp.asarray is a no-op for
        # arrays already on device, so a datamodule yielding cached device
        # arrays (reused across steps/epochs) would hand the same buffer to a
        # donating jit twice -> deleted-buffer errors on TPU (invisible on the
        # CPU test backend, where donation is ignored). Copy committed
        # jax.Arrays defensively; host numpy stays the zero-copy fast path.
        def _to_device(x):
            if isinstance(x, jax.Array):
                return jax.numpy.copy(x)
            return jax.numpy.asarray(x)

        if self.mesh is not None:
            # device_put to an identical sharding can alias the same buffer,
            # so the mesh path needs the same committed-array copy guard
            batch = jax.tree_util.tree_map(
                lambda x: jax.numpy.copy(x) if isinstance(x, jax.Array) else x, batch
            )
            # multi-host: the loader yields this process's LOCAL shard
            # (data/loader.py process_index/process_count); assemble the
            # global sharded batch from per-process locals. Single-process
            # this is exactly shard_batch.
            return local_batch_to_global(self.mesh, batch)
        return jax.tree_util.tree_map(_to_device, batch)

    # -- steps (overridden) ----------------------------------------------------
    def training_step(self, batch: dict) -> dict:
        raise NotImplementedError

    def validation_step(self, batch: dict):
        raise NotImplementedError

    # -- checkpoint ------------------------------------------------------------
    def schedulers_state_dict(self) -> dict:
        return {k: s.state_dict() for k, s in self.schedulers.items()}

    def load_schedulers_state_dict(self, state: dict) -> None:
        for k, st in state.items():
            if k in self.schedulers:
                self.schedulers[k].load_state_dict(st)


class ClassificationModule(BaseModule):
    name = "classification"

    def make_results(self, batch: dict, outputs, max_results: int = 8) -> list:
        from ..inference.results import ClassificationResult

        logits = np.asarray(outputs)
        n = min(max_results, logits.shape[0])
        e = np.exp(logits[:n] - logits[:n].max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        labels = [str(i) for i in range(logits.shape[-1])]
        return [
            ClassificationResult(
                image=np.asarray(batch["images"][i]), probs=probs[i],
                labels=labels, target=int(batch["labels"][i]),
            )
            for i in range(n)
        ]

    @classmethod
    def create(cls, model, input_shape=(224, 224, 3), optimizers_cfg=None,
               lr_schedulers_cfg=None, seed=42, mesh=None, **kw):
        return super().create(
            model, input_shape,
            optimizers_cfg or {"optim": {"name": "SGD", "params": {"lr": 0.1}}},
            lr_schedulers_cfg or {},
            seed=seed, init_weights=init_classification_weights, mesh=mesh,
            accumulate_grad_batches=kw.get("accumulate_grad_batches", 1),
        )

    def training_step(self, batch: dict) -> dict:
        batch = self.batch_to_device(batch)
        if self.accumulate_grad_batches > 1:
            step = accumulated_classification_train_step(self.accumulate_grad_batches)
        else:
            step = classification_train_step
        self.state, metrics = step(
            self.state, batch["images"], batch["labels"], self.lr
        )
        self.on_step_end()
        return metrics

    def validation_step(self, batch: dict):
        batch = self.batch_to_device(batch)
        metrics, logits = classification_val_step(
            self.state, batch["images"], batch["labels"]
        )
        return metrics, logits


class KeypointsModule(BaseModule):
    name = "keypoints"

    @classmethod
    def create(cls, model, input_shape=(512, 512, 3), optimizers_cfg=None,
               lr_schedulers_cfg=None, seed=42, mesh=None, **kw):
        return super().create(
            model, input_shape,
            optimizers_cfg or {"optim": {"name": "Adam", "params": {"lr": 1e-3}}},
            lr_schedulers_cfg or {},
            seed=seed, init_weights=init_keypoints_weights, mesh=mesh,
            accumulate_grad_batches=kw.get("accumulate_grad_batches", 1),
        )

    def training_step(self, batch: dict) -> dict:
        batch = self.batch_to_device(batch)
        if self.accumulate_grad_batches > 1:
            step = accumulated_keypoints_train_step(self.accumulate_grad_batches)
        else:
            step = keypoints_train_step
        self.state, metrics = step(self.state, batch, self.lr)
        self.on_step_end()
        return metrics

    def validation_step(self, batch: dict):
        batch = self.batch_to_device(batch)
        metrics, outputs = keypoints_val_step(self.state, batch)
        return metrics, outputs

    def make_results(self, batch: dict, outputs, max_results: int = 4) -> list:
        """Decode one val batch into plottable results (the reference builds
        KeypointsResult for one random batch per epoch, trainer.py:122-128;
        val-time thresholds det 0.1 / tag 1.0, keypoints/module.py:95-99)."""
        from ..inference.results import KeypointsResult
        from ..ops.decode import decode_batch
        from ..ops.heatmaps import average_stages, resize_bilinear

        stages_hms, tags = outputs
        n = min(max_results, stages_hms[0].shape[0])
        stages_hms = [jnp.asarray(h[:n], jnp.float32) for h in stages_hms]
        tags = jnp.asarray(tags[:n], jnp.float32)
        h, w = batch["images"].shape[1:3]
        joints, scores, valid = decode_batch(
            stages_hms, [tags], input_hw=(h, w),
            max_num_people=batch["joints"].shape[1], det_thr=0.1, tag_thr=1.0,
        )
        avg = resize_bilinear(average_stages(stages_hms), h, w)
        tags_big = resize_bilinear(tags, h, w)
        results = []
        for i in range(n):
            v = np.asarray(valid[i])
            j = np.asarray(joints[i])
            results.append(
                KeypointsResult(
                    model_input_image=np.asarray(batch["images"][i]),
                    kpts_heatmaps=np.asarray(avg[i]),
                    tags_heatmaps=np.asarray(tags_big[i]),
                    kpts_coords=j[v][..., :2],
                    kpts_scores=j[v][..., 2],
                    kpts_tags=j[v][..., 3:],
                    obj_scores=np.asarray(scores[i])[v],
                    det_thr=0.1,
                )
            )
        return results


def metrics_to_host(metrics: dict) -> dict:
    return {k: float(np.asarray(v)) for k, v in metrics.items()}
