"""Classification task config (counterpart of reference
src/classification/config.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..data.imagenet import ImagenetClassificationDataset, collate_classification
from ..data.loader import DataLoader
from ..data.transforms import ClassificationTransform
from ..loggers.pylogger import log
from ..utils.utils import get_rank
from .base import BaseConfig, TransformConfig
from .keypoints import unstruct_optims


@dataclass
class ClassificationTransformConfig(TransformConfig):
    out_size: int = 224


@dataclass
class ClassificationConfig(BaseConfig):
    transform: ClassificationTransformConfig = field(
        default_factory=ClassificationTransformConfig
    )

    def create_net(self, bn_groups: int = 1):
        import jax.numpy as jnp

        from ..models import ClassificationHRNet

        params = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in dict(self.net.params).items()
        }
        dtype = jnp.bfloat16 if self.trainer.accelerator == "tpu" else jnp.float32
        return ClassificationHRNet(**params, bn_groups=bn_groups, dtype=dtype)

    def create_datamodule(self):
        import jax

        from ..train.trainer import DataModule

        t = ClassificationTransform(
            out_size=self._out_size(),
            normalize=not self.dataloader.compact_batches,
        )
        dl_cfg = self.dataloader
        try:
            train_ds = ImagenetClassificationDataset(
                dl_cfg.train_ds.root, dl_cfg.train_ds.split, t.train
            )
            val_ds = ImagenetClassificationDataset(
                dl_cfg.val_ds.root, dl_cfg.val_ds.split, t.inference
            )
        except FileNotFoundError as e:
            log.warning(f"dataset unavailable: {e}")
            return DataModule(None, None)
        kw = dict(
            batch_size=dl_cfg.batch_size,
            collate_fn=collate_classification,
            num_workers=dl_cfg.num_workers,
            seed=self.setup.seed,
            process_index=get_rank(),
            process_count=jax.process_count(),
        )
        train_dl = DataLoader(train_ds, shuffle=True, **kw)
        val_dl = DataLoader(val_ds, shuffle=False, drop_last=False, **kw)
        return DataModule(train_dl, val_dl, train_ds, val_ds)

    def _out_size(self) -> int:
        s = self.transform.out_size
        return s[0] if isinstance(s, (list, tuple)) else int(s)

    def create_module(self, mesh=None):
        from ..train.module import ClassificationModule

        model = self.create_net(bn_groups=self.bn_groups(mesh))
        size = self._out_size()
        return ClassificationModule.create(
            model,
            input_shape=(size, size, 3),
            optimizers_cfg=unstruct_optims(self.module.optimizers),
            lr_schedulers_cfg=unstruct_optims(self.module.lr_schedulers),
            seed=self.setup.seed,
            mesh=mesh,
            accumulate_grad_batches=self.module.accumulate_grad_batches,
        )

    def create_inference_model(self, ckpt_path: str | None = None, labels=None, device=None):
        from ..inference.models import (
            InferenceClassificationModel,
            load_variables_from_ckpt,
        )

        model = self.create_net()
        ckpt = ckpt_path or self.inference.ckpt_path
        if ckpt:
            variables = load_variables_from_ckpt(model, ckpt)
        else:
            import jax
            import jax.numpy as jnp

            log.warning("no inference ckpt_path given — using random weights")
            dtype = getattr(model, "dtype", jnp.float32)
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), dtype), train=False
            )
        return InferenceClassificationModel(
            model, dict(variables), labels=labels,
            input_size=self.inference.input_size,
            compact_inputs=self.inference.compact_inputs,
        )
