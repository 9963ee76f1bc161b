"""Batched (and optionally mesh-sharded) COCO keypoints evaluation.

The reference evaluates val2017 strictly one image at a time
(/root/reference/src/keypoints/bin/eval.py:18-49): per-image forward,
per-image CPU Munkres decode, and a full-heatmap device->host transfer for
every image. On TPU that serialization wastes the chip — a bs-1 dispatch
leaves most of the MXU idle and every dispatch pays a host round-trip.

This runner keeps the exact per-image math (same jitted forward / flip TTA /
multi-scale aggregation / AE decode as ``InferenceKeypointsModel``) but:

1. **buckets** images by their jit compile shape — the 64-aligned
   multi-scale input size is a pure function of the raw image size, so the
   bucket key is the tuple of padded input shapes across the requested TTA
   scales;
2. runs forward + decode for whole fixed-size batches (padding the tail of a
   bucket by repeating its last image and dropping the padded outputs);
3. fetches ONLY the decoded joints/scores/valid (a few KB per batch) instead
   of the full heatmap stack — eval never plots, so the [H, W, K(+E)] arrays
   the single-image path materializes for visualization stay on device;
4. optionally shards the batch dim over a ``jax.sharding`` data mesh so a
   multi-chip host evaluates the val split data-parallel (the reference has
   no distributed eval at all).

Exactness: convolutions, eval-mode BatchNorm, resizes, and the whole decode
are per-image independent, so batched detections match the serial path
(pinned by tests/test_batched_eval.py). Per-image pad-region masking is done
with a *dynamic* [B, 2] valid-size array so shape-bucketed runs
(``pad_multiple`` > 64) do not recompile per exact image size.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..data.affine import get_multi_scale_size
from ..loggers.pylogger import log
from ..ops.decode import decode_batch
from .models import InferenceKeypointsModel
from .results import InferenceKeypointsResult


@dataclass
class _Pending:
    """Host-side metadata for one image waiting in a bucket."""

    image_id: int
    annot: list | None
    center: tuple
    scale: tuple
    valid_hw: tuple  # exact 64-aligned size at scale 1 (pre-bucket-padding)
    xs: dict  # scale -> [H, W, 3] float32 normalized input


@dataclass
class _InFlight:
    """One dispatched batch: device outputs + the metadata to emit them."""

    joints: jax.Array
    scores: jax.Array
    valid: jax.Array
    metas: list  # n_real entries


@functools.partial(
    jax.jit,
    static_argnames=("hw", "n_scales", "max_num_people", "det_thr", "tag_thr"),
)
def _decode_dynamic(
    avg_sum, tags_list, valid_hw, hw, n_scales, max_num_people, det_thr, tag_thr
):
    """Decode with a per-image dynamic pad mask (vs the single-image path's
    static ``valid_hw`` — dynamic avoids one recompile per exact 64-aligned
    size inside a coarser ``pad_multiple`` bucket). Module-level so the jit
    cache never pins an evaluator instance (and its accumulated detections)
    via a static ``self``."""
    avg = avg_sum / n_scales
    vh = valid_hw[:, 0][:, None, None, None]
    vw = valid_hw[:, 1][:, None, None, None]
    yy = jnp.arange(hw[0])[None, :, None, None]
    xx = jnp.arange(hw[1])[None, None, :, None]
    avg = jnp.where((yy < vh) & (xx < vw), avg, -1e4)
    return decode_batch(
        [avg], tags_list, input_hw=hw,
        max_num_people=max_num_people, det_thr=det_thr, tag_thr=tag_thr,
    )


def image_id_from_path(path, fallback: int) -> int:
    """COCO filenames are zero-padded image ids; tolerate non-numeric stems
    (shared by the serial and batched evaluators so the id rule can never
    diverge between them)."""
    from pathlib import Path

    digits = "".join(c for c in Path(path).stem if c.isdigit())
    return int(digits) if digits else fallback


class BatchedKeypointsEvaluator:
    """Batched val-split evaluation driver around ``InferenceKeypointsModel``.

    ``mesh``: optional 1-D data mesh (``parallel.mesh.make_mesh``); the batch
    dim is sharded over it and ``batch_size`` must be a multiple of its size
    (the model's variables are re-placed as mesh-replicated). ``max_pending``:
    cap on images buffered across partially-filled buckets (bounds host
    memory on shape-diverse sets); the fullest bucket is flushed early (as a
    padded partial batch) when the cap is hit.

    Plain class (not a dataclass): instances are ``jit`` static args, so the
    default identity ``__hash__`` must survive.
    """

    def __init__(
        self,
        model: InferenceKeypointsModel,
        batch_size: int = 8,
        mesh=None,
        max_pending: int | None = None,
        compute_oks: bool = True,
    ):
        if 1.0 not in model.scales:
            # the same contract the serial path enforces per call
            # (models.py: tags/decode geometry come from the scale-1 pass)
            raise ValueError(f"scales must include 1.0, got {model.scales}")
        if getattr(model, "_pipe", None) is not None:
            # this evaluator batches through the monolithic jitted forward;
            # silently ignoring the pipeline would misreport the measured path
            raise ValueError(
                "inference.pipeline_devices is for the serial/serving path; "
                "batched eval parallelizes over the data mesh (--sharded) "
                "instead — unset one of the two"
            )
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh
        self.max_pending = max_pending
        self.compute_oks = compute_oks
        self._buckets: dict = {}
        self._in_flight: list = []
        self._detections: list = []
        self._oks_values: list = []
        self._n_images = 0
        self._variables = model.variables
        if self.max_pending is None:
            self.max_pending = 4 * self.batch_size
        if self.mesh is not None:
            n = self.mesh.devices.size
            if self.batch_size % n:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"{n}-device mesh"
                )
            from ..parallel.mesh import replicate

            # params replicated once, kept evaluator-local so the injected
            # model is not committed to this mesh's device set
            self._variables = replicate(self.mesh, model.variables)

    # -- bucket key ---------------------------------------------------------

    def _scales(self) -> tuple:
        return tuple(sorted(self.model.scales, reverse=True))

    def _padded_hw(self, raw_hw: tuple, current_scale: float) -> tuple:
        """Compile-shape (h, w) of the model input for one TTA scale — a pure
        function of the raw image size (no pixel work)."""
        m = self.model
        (w, h), _, _ = get_multi_scale_size(
            np.empty((*raw_hw, 0)), m.input_size, current_scale, min(m.scales)
        )
        if m.pad_multiple > 64:
            p = m.pad_multiple
            h, w = -(-h // p) * p, -(-w // p) * p
        return (h, w)

    def _bucket_key(self, raw_hw: tuple) -> tuple:
        return tuple(self._padded_hw(raw_hw, s) for s in self._scales())

    # -- device work --------------------------------------------------------

    def _dispatch(self, key: tuple) -> None:
        metas = self._buckets.pop(key)
        m = self.model
        n_real = len(metas)
        pad = self.batch_size - n_real
        hw = key[self._scales().index(1.0)]

        valid_hw = np.array(
            [p.valid_hw for p in metas] + [metas[-1].valid_hw] * pad, np.int32
        )
        avg_sum = None
        tags_list = None
        for s in self._scales():
            xs = np.stack([p.xs[s] for p in metas] + [metas[-1].xs[s]] * pad)
            xs = m.to_device(xs)  # uint8 stays uint8 (compact_inputs)
            if self.mesh is not None:
                from ..parallel.mesh import batch_sharding

                xs = jax.device_put(xs, batch_sharding(self.mesh))
            avg, tags_s = m._forward_scale(self._variables, xs, hw)
            avg_sum = avg if avg_sum is None else avg_sum + avg
            if s == 1.0:
                tags_list = tags_s
        joints, scores, valid = _decode_dynamic(
            avg_sum, tags_list, jnp.asarray(valid_hw), hw,
            float(len(self._scales())), m.max_num_people, m.det_thr, m.tag_thr,
        )
        # async dispatch: keep outputs on device so host prep of the next
        # batch overlaps device compute; drain keeps at most 2 in flight
        self._in_flight.append(_InFlight(joints, scores, valid, metas))
        self._drain(keep=2)
        for p in metas:
            p.xs = {}  # release pixel buffers immediately

    def _drain(self, keep: int = 0) -> None:
        while len(self._in_flight) > keep:
            out = self._in_flight.pop(0)
            joints = np.asarray(out.joints)
            scores = np.asarray(out.scores)
            valid = np.asarray(out.valid)
            for i, meta in enumerate(out.metas):
                vh, vw = meta.valid_hw
                res = InferenceKeypointsResult.from_decoded(
                    raw_image=None,
                    annot=meta.annot,
                    # only .shape[:2] is used (inverse-affine output size);
                    # eval never plots, so heatmaps stay off-host entirely
                    model_input_image=np.zeros((vh, vw, 0), np.float32),
                    avg_heatmaps=np.zeros((1, 1, 1), np.float32),
                    tags_heatmaps=np.zeros((1, 1, 1, 1), np.float32),
                    joints=joints[i],
                    obj_scores=scores[i],
                    valid=valid[i],
                    center=meta.center,
                    scale=meta.scale,
                    det_thr=self.model.det_thr,
                    tag_thr=self.model.tag_thr,
                )
                if self.compute_oks and meta.annot is not None:
                    try:
                        oks = res.calculate_OKS()
                    except Exception:
                        oks = -1.0
                    if oks >= 0:
                        self._oks_values.append(oks)
                self._detections.extend(res.to_coco_detections(meta.image_id))
                self._n_images += 1

    # -- public API ---------------------------------------------------------

    def add(self, image: np.ndarray, image_id: int, annot: list | None = None) -> None:
        m = self.model
        scales = self._scales()
        min_scale = min(scales)
        xs = {}
        center = scale_wh = None
        for s in scales:
            x, c, sc = m.prepare_input(image, s, min_scale)
            xs[s] = x[0]
            if s == 1.0:
                center, scale_wh = c, sc
                (w1, h1), _, _ = get_multi_scale_size(image, m.input_size, 1.0, min_scale)
                valid_hw = (h1, w1)
        key = self._bucket_key(image.shape[:2])
        self._buckets.setdefault(key, []).append(
            _Pending(image_id, annot, center, scale_wh, valid_hw, xs)
        )
        if len(self._buckets[key]) == self.batch_size:
            self._dispatch(key)
        elif sum(len(v) for v in self._buckets.values()) >= self.max_pending:
            fullest = max(self._buckets, key=lambda k: len(self._buckets[k]))
            self._dispatch(fullest)

    def finish(self) -> tuple[list[dict], list[float]]:
        """Flush partial buckets and drain all in-flight batches."""
        for key in sorted(self._buckets, key=lambda k: -len(self._buckets[k])):
            if key in self._buckets:
                self._dispatch(key)
        self._drain(keep=0)
        return self._detections, self._oks_values


def evaluate_dataset_batched(
    model: InferenceKeypointsModel,
    ds,
    batch_size: int,
    limit: int = -1,
    mesh=None,
    progress: bool = True,
) -> list[dict]:
    """Batched counterpart of ``bin.eval_keypoints.evaluate_dataset`` —
    identical detections (and the same per-image OKS logging), batched
    device work."""
    from tqdm.auto import tqdm

    runner = BatchedKeypointsEvaluator(model, batch_size=batch_size, mesh=mesh)
    n = len(ds) if limit <= 0 else min(limit, len(ds))
    t0 = time.perf_counter()
    it = tqdm(range(n), desc=f"evaluating (batched bs{batch_size})") if progress else range(n)
    for idx in it:
        image = ds.load_image(idx)
        annot = ds.load_annot(idx)
        image_id = image_id_from_path(ds.images_filepaths[idx], fallback=idx)
        runner.add(image, image_id, annot)
    detections, oks_values = runner.finish()
    dt = time.perf_counter() - t0
    if oks_values:
        log.info(
            f"mean image OKS over {len(oks_values)} images: {np.mean(oks_values):.4f}"
        )
    log.info(f"batched eval: {n} images in {dt:.1f}s ({n / dt:.1f} img/s)")
    return detections
