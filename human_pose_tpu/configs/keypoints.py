"""Keypoints task config (counterpart of reference src/keypoints/config.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..data.coco import CocoKeypointsDataset, collate
from ..data.loader import DataLoader
from ..data.transforms import KeypointsTransform
from ..utils.utils import get_rank
from .base import BaseConfig, TransformConfig
from ..loggers.pylogger import log

ARCHITECTURES = ("HigherHRNet", "Hourglass", "SimpleBaseline", "HRNet")


@dataclass
class KeypointsTransformConfig(TransformConfig):
    out_size: int = 512
    hm_resolutions: list = field(default_factory=lambda: [0.25, 0.5])
    max_rotation: float = 30
    min_scale: float = 0.7
    max_scale: float = 1.6
    scale_type: str = "short"
    max_translate: int = 40


@dataclass
class KeypointsConfig(BaseConfig):
    transform: KeypointsTransformConfig = field(default_factory=KeypointsTransformConfig)

    def create_net(self, bn_groups: int = 1):
        import jax.numpy as jnp

        arch = self.setup.architecture or "HigherHRNet"
        params = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in dict(self.net.params).items()
        }
        dtype = jnp.bfloat16 if self.trainer.accelerator == "tpu" else jnp.float32
        if arch == "HigherHRNet":
            from ..models import HigherHRNet

            return HigherHRNet(**params, bn_groups=bn_groups, dtype=dtype)
        if arch == "Hourglass":
            from ..models.hourglass import AEHourglassNet

            return AEHourglassNet(
                num_kpts=params.get("num_kpts", 17),
                num_stages=params.get("num_stages", 2),
                bn_groups=bn_groups,
                dtype=dtype,
            )
        if arch == "SimpleBaseline":
            from ..models.simple_baseline import SimpleBaseline

            return SimpleBaseline(
                num_kpts=params.get("num_kpts", 17),
                backbone=params.get("backbone", "resnet50"),
                bn_groups=bn_groups,
                dtype=dtype,
            )
        if arch == "HRNet":
            from ..models import HRNetSPPE

            params["num_keypoints"] = params.pop("num_kpts", 17)
            return HRNetSPPE(**params, bn_groups=bn_groups, dtype=dtype)
        raise ValueError(f"unknown keypoints architecture {arch!r} (expected one of {ARCHITECTURES})")

    def _make_transform(self) -> KeypointsTransform:
        t = self.transform
        if self.dataloader.compact_batches and (
            list(t.mean) != [0.485, 0.456, 0.406] or list(t.std) != [0.229, 0.224, 0.225]
        ):
            raise ValueError(
                "dataloader.compact_batches requires the default ImageNet "
                "mean/std — the device-side normalize (train/steps._prep_images) "
                "uses those constants"
            )
        return KeypointsTransform(
            normalize=not self.dataloader.compact_batches,
            out_size=t.out_size,
            hm_resolutions=t.hm_resolutions,
            max_rotation=t.max_rotation,
            min_scale=t.min_scale,
            max_scale=t.max_scale,
            scale_type=t.scale_type,
            max_translate=t.max_translate,
            mean=t.mean,
            std=t.std,
        )

    def create_datamodule(self):
        import jax

        from ..train.trainer import DataModule

        t = self._make_transform()
        dl_cfg = self.dataloader
        common = dict(
            out_size=dl_cfg.train_ds.out_size,
            hm_resolutions=dl_cfg.train_ds.hm_resolutions,
            num_kpts=dl_cfg.train_ds.num_kpts,
            max_num_people=dl_cfg.train_ds.max_num_people,
            sigma=dl_cfg.train_ds.sigma,
            compact=dl_cfg.compact_batches,
        )
        train_ds = CocoKeypointsDataset(
            dl_cfg.train_ds.root, dl_cfg.train_ds.split, t.train,
            mosaic_probability=dl_cfg.train_ds.mosaic_probability, **common,
        )
        val_ds = CocoKeypointsDataset(
            dl_cfg.val_ds.root, dl_cfg.val_ds.split, t.inference, **common
        )
        kw = dict(
            batch_size=dl_cfg.batch_size,
            collate_fn=collate,
            num_workers=dl_cfg.num_workers,
            seed=self.setup.seed,
            process_index=get_rank(),
            process_count=jax.process_count(),
        )
        train_dl = DataLoader(train_ds, shuffle=True, **kw) if len(train_ds) else None
        val_dl = DataLoader(val_ds, shuffle=False, drop_last=False, **kw) if len(val_ds) else None
        if train_dl is None:
            log.warning("empty train dataset — datamodule has no train loader")
        return DataModule(train_dl, val_dl, train_ds, val_ds)

    def create_module(self, mesh=None):
        from ..train.module import KeypointsModule

        model = self.create_net(bn_groups=self.bn_groups(mesh))
        size = self.transform.out_size
        return KeypointsModule.create(
            model,
            input_shape=(size, size, 3),
            optimizers_cfg=unstruct_optims(self.module.optimizers),
            lr_schedulers_cfg=unstruct_optims(self.module.lr_schedulers),
            seed=self.setup.seed,
            mesh=mesh,
            accumulate_grad_batches=self.module.accumulate_grad_batches,
        )

    def create_inference_model(self, ckpt_path: str | None = None, device=None):
        from ..inference.models import (
            InferenceKeypointsModel,
            InferenceSPPEModel,
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
        arch = self.setup.architecture or "HigherHRNet"
        if arch in ("HRNet", "SimpleBaseline"):
            # single-person models: no AE tags -> argmax parser
            return InferenceSPPEModel(
                model,
                dict(variables),
                det_thr=self.inference.det_thr,
                input_size=self.inference.input_size,
                compact_inputs=self.inference.compact_inputs,
            )
        return InferenceKeypointsModel(
            model,
            dict(variables),
            det_thr=self.inference.det_thr,
            tag_thr=self.inference.tag_thr,
            use_flip=self.inference.use_flip,
            input_size=self.inference.input_size,
            pad_multiple=self.resolved_pad_multiple(),
            scales=tuple(self.inference.scales or (1.0,)),
            pipeline_devices=self.inference.pipeline_devices,
            compact_inputs=self.inference.compact_inputs,
        )


def unstruct_optims(cfg: dict) -> dict:
    """module.optimizers / module.lr_schedulers arrive as plain dicts from
    yaml; pass through unchanged."""
    return cfg or {}
