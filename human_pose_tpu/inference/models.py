"""Inference models: host preprocess + device forward/decode wrappers.

Counterparts of reference src/keypoints/model.py:43-111
(InferenceKeypointsModel: 64-aligned resize, flip TTA, parse, inverse affine)
and the classification inference model. All device work — forward, optional
flip forward, heatmap aggregation, AE decode — is one jitted function per
input shape (jax caches compiles per 64-aligned bucket).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.affine import resize_align_multi_scale
from ..data.coco import COCO_LIMBS
from ..data.transforms import (
    ClassificationTransform,
    inverse_normalize,
    normalize,
)
from ..ops.decode import decode_batch
from ..ops.flip import flip_back, merge_flip_heatmaps
from ..ops.heatmaps import average_stages, resize_bilinear
from ..ops.images import PAD_PIXEL_U8, prep_images
from ..ops.sppe import sppe_parse
from ..train.checkpoint import load_checkpoint, load_train_state
from .results import ClassificationResult, InferenceKeypointsResult


def load_variables_from_ckpt(model, ckpt_path: str, input_shape=(64, 64, 3)):
    """Build variables and restore from a trainer checkpoint
    (reference BaseInferenceModel, src/base/model.py:152-181)."""
    from ..train.optim import create_optimizer
    from ..train.state import TrainState

    rng = jax.random.PRNGKey(0)
    dtype = getattr(model, "dtype", jnp.float32)
    variables = model.init(rng, jnp.zeros((1, *input_shape), dtype), train=False)
    from ..utils.torch_interop import is_torch_checkpoint

    if is_torch_checkpoint(ckpt_path):
        # a reference torch .pt checkpoint: convert weights AND BatchNorm
        # running stats into the flax tree (utils/torch_interop.py)
        from ..utils.torch_interop import load_torch_state_dict, variables_from_torch

        sd = load_torch_state_dict(ckpt_path)
        return variables_from_torch(sd, jax.device_get(dict(variables)))
    # native checkpoint: deserialize against a full TrainState template
    state = TrainState.create(
        model.apply, variables["params"], variables.get("batch_stats"),
        create_optimizer("SGD", lr=0.0),
    )
    ckpt = load_checkpoint(ckpt_path)
    # optimizer state in the checkpoint may belong to a different optimizer;
    # restore params/batch_stats only
    from flax import serialization

    template = jax.device_get(
        {"step": state.step, "params": state.params,
         "batch_stats": state.batch_stats, "opt_state": None}
    )
    try:
        tree = serialization.from_bytes(template, ckpt["module"])
    except Exception:
        full = load_train_state(state, ckpt)
        return {"params": full.params, "batch_stats": full.batch_stats}
    return {"params": tree["params"], "batch_stats": tree["batch_stats"]}


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _prep_images_jit(x, out_dtype):
    return prep_images(x, out_dtype)


def _pipeline_microbatch(total: int, n_segments: int) -> int:
    """Largest divisor of ``total`` that is <= ceil(total / n_segments):
    enough equal-size (jit-static) microbatches to fill all pipeline
    segments, so fill/drain actually overlaps — one whole-batch microbatch
    would run the segments strictly serially (bubble = (S-1)/S)."""
    target = max(1, -(-total // n_segments))
    for m in range(target, 0, -1):
        if total % m == 0:
            return m
    return 1


class InferenceKeypointsModel:
    limbs = COCO_LIMBS

    def __init__(
        self,
        model,
        variables: dict,
        det_thr: float = 0.05,
        tag_thr: float = 0.5,
        use_flip: bool = False,
        input_size: int = 512,
        max_num_people: int = 30,
        pad_multiple: int = 64,
        scales: tuple = (1.0,),
        pipeline_devices: int = 0,
        compact_inputs: bool = False,
    ):
        """``pad_multiple`` > 64 buckets the 64-aligned input shapes into
        coarser shape classes by zero-padding bottom/right (the decode masks
        the pad region), trading a little wasted compute for far fewer jit
        recompilations over a varied-shape eval set. APPROXIMATE: zero input
        padding alters activations within a receptive field of the pad edge
        (the network sees pad pixels instead of SAME-conv zero activations),
        so boundary detections can shift slightly vs the exact 64-aligned
        path; default 64 = exact reference behavior."""
        self.model = model
        self.variables = variables
        self.det_thr = det_thr
        self.tag_thr = tag_thr
        self.use_flip = use_flip
        self.input_size = input_size
        self.max_num_people = max_num_people
        self.pad_multiple = pad_multiple
        self.scales = tuple(scales)
        # compact_inputs: ship uint8 pixels to the device and normalize
        # inside the jitted forward (4x less host->device transfer + no host
        # normalize pass). Shape-bucket padding uses PAD_PIXEL_U8 (the uint8
        # pixel closest to normalized zero) instead of exact normalized zero
        # — the pad>64 bucket path is approximate either way (see above).
        self.compact_inputs = compact_inputs
        self.model_input_shape: tuple | None = None
        # pipeline parallelism (parallel/pipeline.py): the forward is split
        # over pipeline_devices local devices, GPipe-style microbatched; the
        # flip pass rides the same pipeline walk as the plain pass (one
        # concatenated batch = two microbatches, so the pipeline overlaps
        # them). 0 = monolithic single-device forward (default).
        self._pipe = None
        if pipeline_devices:
            from ..parallel.pipeline import PipelinedModel, partition_for

            self._pipe = PipelinedModel(
                model, variables, partition=partition_for(pipeline_devices)
            )

    def forward_scale(self, x, hw):
        """One multi-scale pass: forward (+flip), aggregate stages, resize to
        the common decode size. Returns (avg_hms [N,H,W,K], tags list).
        Dispatches to the monolithic jitted path or, when constructed with
        ``pipeline_devices``, the pipeline-parallel path (identical outputs —
        eval-mode BN makes results per-sample deterministic, so batching the
        flip pass through the pipeline changes nothing)."""
        if self._pipe is None:
            return self._forward_scale(self.variables, x, hw)
        # the pipeline walks raw model segments, so normalize before entry
        # (jitted — one cached tiny graph per input shape; no-op for floats)
        if jnp.issubdtype(x.dtype, jnp.integer):
            x = _prep_images_jit(x, getattr(self.model, "dtype", jnp.float32))
        n_seg = len(self._pipe.segments)
        if self.use_flip:
            both = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
            mb = _pipeline_microbatch(both.shape[0], n_seg)
            stages_hms, tags = self._pipe(both, microbatch_size=mb)
            return self._merge_resize_flip(stages_hms, tags, hw)
        mb = _pipeline_microbatch(x.shape[0], n_seg)
        stages_hms, tags = self._pipe(x, microbatch_size=mb)
        return self._merge_resize(stages_hms, tags, hw)

    @functools.partial(jax.jit, static_argnames=("self", "hw"))
    def _merge_resize_flip(self, stages_hms, tags, hw):
        """Post-pipeline glue for a [plain; flipped] concatenated forward."""
        n = tags.shape[0] // 2
        stages_hms = [
            merge_flip_heatmaps(h[:n], h[n:]) for h in stages_hms
        ]
        tags_list = [tags[:n], flip_back(tags[n:])]
        avg = resize_bilinear(average_stages(stages_hms), *hw)
        return avg, [resize_bilinear(t, *hw) for t in tags_list]

    @functools.partial(jax.jit, static_argnames=("self", "hw"))
    def _merge_resize(self, stages_hms, tags, hw):
        avg = resize_bilinear(average_stages(stages_hms), *hw)
        return avg, [resize_bilinear(tags, *hw)]

    @functools.partial(jax.jit, static_argnames=("self", "hw"))
    def _forward_scale(self, variables, x, hw):
        """Monolithic forward (+flip), aggregate stages, resize — one jit."""
        x = prep_images(x, getattr(self.model, "dtype", jnp.float32))
        stages_hms, tags = self.model.apply(variables, x, train=False)
        if self.use_flip:
            f_hms, f_tags = self.model.apply(variables, x[:, :, ::-1, :], train=False)
            stages_hms = [
                merge_flip_heatmaps(h, fh) for h, fh in zip(stages_hms, f_hms)
            ]
            tags_list = [tags, flip_back(f_tags)]
        else:
            tags_list = [tags]
        avg = resize_bilinear(average_stages(stages_hms), *hw)
        tags_resized = [resize_bilinear(t, *hw) for t in tags_list]
        return avg, tags_resized

    @functools.partial(jax.jit, static_argnames=("self", "hw", "n_scales", "valid_hw"))
    def _decode_aggregated(self, avg_sum, tags_list, hw, n_scales, valid_hw=None):
        avg = avg_sum / n_scales
        if valid_hw is not None and valid_hw != hw:
            # shape-bucketing padding: suppress detections in the pad region
            vh, vw = valid_hw
            yy = jnp.arange(hw[0])[None, :, None, None]
            xx = jnp.arange(hw[1])[None, None, :, None]
            inside = (yy < vh) & (xx < vw)
            avg = jnp.where(inside, avg, -1e4)
        joints, scores, valid = decode_batch(
            [avg], tags_list, input_hw=hw,
            max_num_people=self.max_num_people,
            det_thr=self.det_thr, tag_thr=self.tag_thr,
        )
        tags_stacked = jnp.stack(tags_list, axis=-1)
        return joints, scores, valid, avg, tags_stacked

    def prepare_input(self, image: np.ndarray, current_scale: float = 1.0, min_scale: float = 1.0):
        resized, center, scale = resize_align_multi_scale(
            image, self.input_size, current_scale, min_scale
        )
        if self.compact_inputs:
            if resized.dtype != np.uint8:
                # prep_images passes floats through UN-normalized — fail loud
                # instead of silently feeding raw pixels to the network
                raise ValueError(
                    f"compact_inputs requires uint8 images, got {resized.dtype} "
                    "(float inputs would skip normalization entirely)"
                )
            x = resized[None]
        else:
            x = normalize(resized)[None]
        if self.pad_multiple > 64:
            m = self.pad_multiple
            h, w = x.shape[1:3]
            ph, pw = -(-h // m) * m, -(-w // m) * m
            if self.compact_inputs:
                # pad with the uint8 pixel closest to normalized zero so the
                # bucket pad region matches the fp32 path's zero-padding
                padded = np.empty((1, ph, pw, 3), np.uint8)
                padded[:] = np.asarray(PAD_PIXEL_U8, np.uint8)
                padded[:, :h, :w] = x
                x = padded
            else:
                x = np.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        return x, center, scale

    def to_device(self, xs: np.ndarray):
        """Transfer a host batch: uint8 stays uint8 (the jitted forward
        normalizes + casts on device), floats pre-cast to the model dtype."""
        if xs.dtype == np.uint8:
            return jnp.asarray(xs)
        return jnp.asarray(xs, getattr(self.model, "dtype", jnp.float32))

    def __call__(
        self, raw_image: np.ndarray, annot=None, scales=None
    ) -> InferenceKeypointsResult:
        """Single- or multi-scale (e.g. scales=(0.5, 1, 2)) TTA inference.
        Heatmaps are averaged across scales at the scale-1 decode size; tag
        maps come from scale 1 (the HigherHRNet multi-scale protocol).
        ``scales`` defaults to the constructor's (``inference.scales``)."""
        scales = tuple(scales) if scales is not None else self.scales
        if 1.0 not in scales:
            # tags (and the decode geometry) always come from the scale-1 pass
            raise ValueError(f"scales must include 1.0, got {scales}")
        min_scale = min(scales)

        # decode size / inverse-affine params come from the scale-1 pass;
        # valid_hw is the pre-bucketing 64-aligned size (pad region masked)
        resized1, center, scale_wh = resize_align_multi_scale(
            raw_image, self.input_size, 1.0, min_scale
        )
        valid_hw = resized1.shape[:2]
        x1, _, _ = self.prepare_input(raw_image, 1.0, min_scale)
        h, w = x1.shape[1:3]
        self.model_input_shape = (h, w)

        avg_sum = None
        tags_list = None
        for s in sorted(scales, reverse=True):
            if s == 1.0:
                xs = x1
            else:
                xs, _, _ = self.prepare_input(raw_image, s, min_scale)
            avg, tags_s = self.forward_scale(self.to_device(xs), (h, w))
            avg_sum = avg if avg_sum is None else avg_sum + avg
            if s == 1.0:
                tags_list = tags_s
        joints, scores, valid, avg, tags = self._decode_aggregated(
            avg_sum, tags_list, (h, w), float(len(scales)), valid_hw=tuple(valid_hw)
        )
        vh, vw = valid_hw
        return InferenceKeypointsResult.from_decoded(
            raw_image=raw_image,
            annot=annot,
            model_input_image=(
                np.asarray(x1[0, :vh, :vw])  # uint8 compact input, displayable as-is
                if x1.dtype == np.uint8
                else inverse_normalize(np.asarray(x1[0, :vh, :vw], np.float32))
            ),
            avg_heatmaps=np.asarray(avg[0, :vh, :vw]),
            tags_heatmaps=np.asarray(tags[0, :vh, :vw]),
            joints=joints[0],
            obj_scores=scores[0],
            valid=valid[0],
            center=center,
            scale=scale_wh,
            det_thr=self.det_thr,
            tag_thr=self.tag_thr,
            limbs=self.limbs,
        )


class InferenceSPPEModel:
    """Single-person inference: forward + argmax decode (the SPPE analog of
    InferenceKeypointsModel, reference grouping.py:10-52 SPPEHeatmapParser).

    Drives HRNetSPPE / SimpleBaseline / HourglassNet — models returning a list
    of heatmap stages and no AE tags. One person per image; joints are decoded
    at input size and mapped back to raw-image coordinates via the same
    inverse affine as the bottom-up path."""

    limbs = COCO_LIMBS

    def __init__(
        self,
        model,
        variables: dict,
        det_thr: float = 0.2,
        input_size: int = 512,
        compact_inputs: bool = False,
    ):
        self.model = model
        self.variables = variables
        self.det_thr = det_thr
        self.tag_thr = 0.0  # unused; kept for result/CLI interface parity
        self.input_size = input_size
        # uint8 to device, normalize in the jitted forward (ops/images.py)
        self.compact_inputs = compact_inputs
        self.model_input_shape: tuple | None = None

    @functools.partial(jax.jit, static_argnames=("self", "hw"))
    def _forward_decode(self, variables, x, hw):
        x = prep_images(x, getattr(self.model, "dtype", jnp.float32))
        out = self.model.apply(variables, x, train=False)
        stages_hms = out[0] if isinstance(out, tuple) else out
        avg = resize_bilinear(average_stages(stages_hms), *hw)
        joints = sppe_parse(avg)  # [N, 1, K, 3]
        return avg, joints

    def __call__(self, raw_image: np.ndarray, annot=None) -> InferenceKeypointsResult:
        dtype = getattr(self.model, "dtype", jnp.float32)
        resized, center, scale_wh = resize_align_multi_scale(
            raw_image, self.input_size, 1.0, 1.0
        )
        if self.compact_inputs:
            if resized.dtype != np.uint8:
                raise ValueError(
                    f"compact_inputs requires uint8 images, got {resized.dtype}"
                )
            x = jnp.asarray(resized[None])  # uint8; normalized on device
        else:
            x = jnp.asarray(normalize(resized)[None], dtype)
        h, w = x.shape[1:3]
        self.model_input_shape = (h, w)
        avg, joints = self._forward_decode(self.variables, x, (h, w))
        joints = np.asarray(joints[0])  # [1, K, 3]
        # zero tag column so the result layout matches the AE path ([..., 3:])
        joints = np.concatenate([joints, np.zeros_like(joints[..., :1])], axis=-1)
        obj_scores = joints[..., 2].mean(axis=-1)  # [1]
        return InferenceKeypointsResult.from_decoded(
            raw_image=raw_image,
            annot=annot,
            model_input_image=(
                np.asarray(x[0]) if x.dtype == jnp.uint8
                else inverse_normalize(np.asarray(x[0], np.float32))
            ),
            avg_heatmaps=np.asarray(avg[0]),
            tags_heatmaps=np.zeros((*avg.shape[1:3], avg.shape[-1], 1), np.float32),
            joints=joints,
            obj_scores=obj_scores,
            valid=np.ones((1,), bool),
            center=center,
            scale=scale_wh,
            det_thr=self.det_thr,
            tag_thr=self.tag_thr,
            limbs=self.limbs,
        )


class InferenceClassificationModel:
    def __init__(self, model, variables: dict, labels: list[str] | None = None,
                 input_size: int = 224, compact_inputs: bool = False):
        """``compact_inputs``: uint8 crop to device, normalize inside the
        jitted apply (same contract as InferenceKeypointsModel)."""
        self.model = model
        self.variables = variables
        self.labels = labels or [str(i) for i in range(1000)]
        self.transform = ClassificationTransform(
            out_size=input_size, normalize=not compact_inputs
        )
        dt = getattr(model, "dtype", jnp.float32)
        self._apply = jax.jit(
            lambda v, x: jax.nn.softmax(
                self.model.apply(v, prep_images(x, dt), train=False), axis=-1
            )
        )

    def to_device(self, xs: np.ndarray):
        """uint8 stays uint8 (normalized on device); floats pre-cast."""
        if xs.dtype == np.uint8:
            return jnp.asarray(xs)
        return jnp.asarray(xs, getattr(self.model, "dtype", jnp.float32))

    def __call__(self, raw_image: np.ndarray, target: int | None = None) -> ClassificationResult:
        x = self.transform.inference(raw_image)
        probs = np.asarray(self._apply(self.variables, self.to_device(x[None]))[0])
        return ClassificationResult(image=x, probs=probs, labels=self.labels, target=target)
