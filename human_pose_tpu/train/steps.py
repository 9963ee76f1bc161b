"""Pure jitted train / validation steps.

Counterparts of the reference per-task modules:
* classification (src/classification/module.py:15-54): CE loss + top-1/top-5
  error metrics, plain fp32 (the flax model's dtype policy decides bf16).
* keypoints (src/keypoints/module.py:43-111): masked heatmap MSE per stage +
  AE push/pull at the 1/4 stage. The reference's fp16 autocast + GradScaler
  becomes a bf16 compute policy — no scaler needed on TPU (SURVEY.md §7).

Each step takes the learning rate as a traced scalar (host-side schedulers,
see train/optim.py) and returns (new_state, metrics). Metrics are global-batch
means: under a data mesh XLA inserts the cross-chip reductions automatically,
which subsumes the reference's AverageMeter.all_reduce (src/base/meters.py:28-39).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

# Compact host batches ship uint8 images (4x less host->device bandwidth);
# the step normalizes on device, where XLA fuses the multiply-add into the
# stem conv (ops/images.py). No-op on the fp32 path (dtype is jit-static).
from ..ops.images import prep_images as _prep_images
from .losses import ae_keypoints_loss, classification_loss
from .optim import set_learning_rate
from .state import TrainState


def _apply_train(state: TrainState, images):
    out, mutated = state.apply_fn(
        state.variables(), _prep_images(images), train=True, mutable=["batch_stats"]
    )
    return out, mutated["batch_stats"]


def _update(state: TrainState, grads, lr):
    opt_state = set_learning_rate(state.opt_state, lr)
    updates, opt_state = state.tx.update(grads, opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return params, opt_state


def topk_error(logits, labels, k):
    topk = jax.lax.top_k(logits, min(k, logits.shape[-1]))[1]  # [N, k]
    correct = (topk == labels[:, None]).any(axis=1)
    return 1.0 - correct.mean()


# ---------------------------------------------------------------------------
# classification
# ---------------------------------------------------------------------------


def _classification_grads(state: TrainState, images, labels):
    """(grads, new batch_stats, metrics) for one (micro)batch."""

    def loss_fn(params):
        out, new_stats = _apply_train(state.replace(params=params), images)
        loss = classification_loss(out, labels)
        return loss, (out, new_stats)

    (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    metrics = {
        "loss": loss,
        "top-1_error": topk_error(logits, labels, 1),
        "top-5_error": topk_error(logits, labels, 5),
    }
    return grads, new_stats, metrics


def classification_train_step_body(state: TrainState, images, labels, lr):
    """Unjitted step body — used by the jitted step below and by benchmark
    harnesses that trace it inside a fori_loop."""
    grads, new_stats, metrics = _classification_grads(state, images, labels)
    params, opt_state = _update(state, grads, lr)
    new_state = state.replace(
        step=state.step + 1, params=params, batch_stats=new_stats, opt_state=opt_state
    )
    return new_state, metrics


@functools.partial(jax.jit, donate_argnames=("state", "images"))
def classification_train_step(state: TrainState, images, labels, lr):
    return classification_train_step_body(state, images, labels, lr)


@jax.jit
def classification_val_step(state: TrainState, images, labels):
    logits = state.apply_fn(state.variables(), _prep_images(images), train=False)
    return {
        "loss": classification_loss(logits, labels),
        "top-1_error": topk_error(logits, labels, 1),
        "top-5_error": topk_error(logits, labels, 5),
    }, logits


# ---------------------------------------------------------------------------
# keypoints (HigherHRNet + AE loss)
# ---------------------------------------------------------------------------


def _keypoints_losses(out, batch):
    stages_hms, tags = out
    total, metrics = ae_keypoints_loss(
        stages_hms, tags, batch["heatmaps"], batch["masks"], batch["joints"]
    )
    return total, metrics


def _keypoints_grads(state: TrainState, batch: dict):
    """(grads, new batch_stats, metrics) for one (micro)batch."""

    def loss_fn(params):
        out, new_stats = _apply_train(state.replace(params=params), batch["images"])
        total, metrics = _keypoints_losses(out, batch)
        return total, (metrics, new_stats)

    (_, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return grads, new_stats, metrics


def keypoints_train_step_body(state: TrainState, batch: dict, lr):
    """Unjitted step body — used by the jitted step below and by benchmark
    harnesses that trace it inside a fori_loop."""
    grads, new_stats, metrics = _keypoints_grads(state, batch)
    params, opt_state = _update(state, grads, lr)
    new_state = state.replace(
        step=state.step + 1, params=params, batch_stats=new_stats, opt_state=opt_state
    )
    return new_state, metrics


@functools.partial(jax.jit, donate_argnames=("state", "batch"))
def keypoints_train_step(state: TrainState, batch: dict, lr):
    """batch: images [N,H,W,3], heatmaps list([N,h,w,K] per stage),
    masks list([N,h,w]), joints [N,P,K,3] int32 (1/4-res coords).

    The batch buffers are DONATED: each training batch is freshly transferred
    from the host loader, and releasing its ~360 MB (bs36 @512) during the
    step is what lets the no-remat backward fit in v5e HBM. Do not reuse a
    batch dict across calls."""
    return keypoints_train_step_body(state, batch, lr)


@jax.jit
def keypoints_val_step(state: TrainState, batch: dict):
    out = state.apply_fn(state.variables(), _prep_images(batch["images"]), train=False)
    _, metrics = _keypoints_losses(out, batch)
    return metrics, out


# ---------------------------------------------------------------------------
# gradient accumulation
# ---------------------------------------------------------------------------


def _accumulated_step(grad_fn, state: TrainState, micro_batches, lr, n_micro: int):
    """lax.scan over microbatches: grads average, BatchNorm running stats
    thread sequentially (each microbatch sees the previous one's stats, like
    n_micro consecutive reference steps), metrics average. One optimizer
    update at the end. Activation memory is that of ONE microbatch — the
    TPU-idiomatic route to reference-scale effective batches on small-HBM
    chips, complementary to remat (which re-computes instead of splitting)."""

    def body(carry, mb):
        stats, acc = carry
        grads, new_stats, metrics = grad_fn(state.replace(batch_stats=stats), mb)
        acc = jax.tree_util.tree_map(jnp.add, acc, grads)
        return (new_stats, acc), metrics

    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    (new_stats, acc), metrics = jax.lax.scan(
        body, (state.batch_stats, zeros), micro_batches
    )
    grads = jax.tree_util.tree_map(lambda g: g / n_micro, acc)
    params, opt_state = _update(state, grads, lr)
    metrics = jax.tree_util.tree_map(lambda m: m.mean(axis=0), metrics)
    new_state = state.replace(
        step=state.step + 1, params=params, batch_stats=new_stats, opt_state=opt_state
    )
    return new_state, metrics


def _split_micro(tree, n_micro: int):
    def split(x):
        n = x.shape[0]
        if n % n_micro:
            raise ValueError(f"batch {n} not divisible by {n_micro} microbatches")
        return x.reshape((n_micro, n // n_micro) + x.shape[1:])

    return jax.tree_util.tree_map(split, tree)


@functools.lru_cache(maxsize=None)
def accumulated_keypoints_train_step(n_micro: int):
    """Jitted keypoints step averaging grads over ``n_micro`` microbatches.
    Semantics match ``keypoints_train_step`` on the full batch exactly for
    everything except BatchNorm batch statistics (computed per microbatch —
    the same deviation the reference would have running smaller batches)."""

    @functools.partial(jax.jit, donate_argnames=("state", "batch"))
    def step(state: TrainState, batch: dict, lr):
        return _accumulated_step(
            _keypoints_grads, state, _split_micro(batch, n_micro), lr, n_micro
        )

    return step


@functools.lru_cache(maxsize=None)
def accumulated_classification_train_step(n_micro: int):
    """Jitted classification step averaging grads over ``n_micro``
    microbatches (see accumulated_keypoints_train_step)."""

    @functools.partial(jax.jit, donate_argnames=("state", "images"))
    def step(state: TrainState, images, labels, lr):
        micro = _split_micro({"images": images, "labels": labels}, n_micro)

        def grad_fn(st, mb):
            return _classification_grads(st, mb["images"], mb["labels"])

        return _accumulated_step(grad_fn, state, micro, lr, n_micro)

    return step
