"""Optimizer / LR-scheduler factories.

Counterpart of reference src/utils/optim.py:13-62 (7 torch optimizers, 7
schedulers by name) and src/base/lr_scheduler.py (interval "epoch"|"step").

Design: the optimizer is an optax transformation whose learning rate is a
*traced scalar argument* of the jitted train step; schedules are tiny host-side
python objects (exactly like torch's scheduler.step() driving an lr value), so
epoch/step interval semantics, ReduceLROnPlateau's metric dependence, and
checkpoint/resume of scheduler counters all stay trivially correct without
recompilation (the lr is data, not a constant baked into the graph).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import optax


# ---------------------------------------------------------------------------
# optimizers: factories return optax transforms that expect the learning rate
# to be injected via optax.inject_hyperparams
# ---------------------------------------------------------------------------


def _sgd(learning_rate, momentum: float = 0.0, weight_decay: float = 0.0, nesterov: bool = False, dampening: float = 0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def _adam(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    if weight_decay:
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(learning_rate),
        )
    return optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)


def _adamw(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01):
    return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def _adamax(learning_rate, betas=(0.9, 0.999), eps=1e-8):
    return optax.adamax(learning_rate, b1=betas[0], b2=betas[1], eps=eps)


def _adadelta(learning_rate, rho=0.9, eps=1e-6, weight_decay=0.0):
    return optax.adadelta(learning_rate, rho=rho, eps=eps, weight_decay=weight_decay)


def _adagrad(learning_rate, eps=1e-10):
    return optax.adagrad(learning_rate, eps=eps)


def _rmsprop(learning_rate, alpha=0.99, eps=1e-8, momentum=0.0):
    return optax.rmsprop(learning_rate, decay=alpha, eps=eps, momentum=momentum or None)


OPTIMIZERS: dict[str, Callable[..., optax.GradientTransformation]] = {
    "SGD": _sgd,
    "Adam": _adam,
    "AdamW": _adamw,
    "Adamax": _adamax,
    "Adadelta": _adadelta,
    "Adagrad": _adagrad,
    "RMSprop": _rmsprop,
}


def create_optimizer(
    name: str, lr: float, clip_norm: float | None = None, **params
) -> optax.GradientTransformation:
    """Build a named optimizer with the lr exposed as an injectable
    hyperparameter (``opt_state.hyperparams['learning_rate']``).

    ``clip_norm``: optional global-gradient-norm clip applied before the
    update (the torch ``clip_grad_norm_`` idiom; the reference doesn't clip,
    so the default is off — useful for stabilizing runs near the lr edge,
    e.g. ``--module.optimizer.params.clip_norm=1.0``)."""
    import inspect

    factory = OPTIMIZERS[name]
    # only the learning rate is injected (traced); every other factory arg —
    # passed or defaulted — stays a static python value baked in
    static = tuple(
        a for a in inspect.signature(factory).parameters if a != "learning_rate"
    )
    inject = optax.inject_hyperparams(factory, static_args=static)
    tx = inject(learning_rate=lr, **params)
    if clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(float(clip_norm)), tx)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Functionally set the injected learning rate on an inject_hyperparams
    state (jit-safe: lr may be a traced scalar). Handles the plain state and
    the optax.chain state produced by ``clip_norm`` (a tuple whose second
    element carries the hyperparams)."""
    if hasattr(opt_state, "hyperparams"):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = lr
        return opt_state._replace(hyperparams=hp)
    assert isinstance(opt_state, tuple), type(opt_state)
    done = False
    out = []
    for s in opt_state:
        if not done and hasattr(s, "hyperparams"):
            hp = dict(s.hyperparams)
            hp["learning_rate"] = lr
            s = s._replace(hyperparams=hp)
            done = True
        out.append(s)
    assert done, "no inject_hyperparams state found in optimizer chain"
    return tuple(out)


# ---------------------------------------------------------------------------
# LR schedulers: host-side counters, torch-equivalent formulas
# ---------------------------------------------------------------------------


class LRScheduler:
    """lr = f(counter); counter advances per 'epoch' or per 'step'
    (reference src/base/lr_scheduler.py:6-35)."""

    def __init__(self, base_lr: float, interval: str = "epoch"):
        assert interval in ("epoch", "step")
        self.base_lr = base_lr
        self.interval = interval
        self.last_count = 0

    def get_lr(self, count: int) -> float:
        raise NotImplementedError

    @property
    def lr(self) -> float:
        return self.get_lr(self.last_count)

    def step(self, metric: float | None = None) -> float:
        self.last_count += 1
        return self.lr

    def state_dict(self) -> dict:
        return {"last_count": self.last_count}

    def load_state_dict(self, state: dict) -> None:
        self.last_count = int(state["last_count"])


class ConstantLR(LRScheduler):
    def get_lr(self, count):
        return self.base_lr


class MultiStepLR(LRScheduler):
    def __init__(self, base_lr, milestones, gamma=0.1, interval="epoch"):
        super().__init__(base_lr, interval)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def get_lr(self, count):
        passed = sum(1 for m in self.milestones if count >= m)
        return self.base_lr * self.gamma**passed


class ExponentialLR(LRScheduler):
    def __init__(self, base_lr, gamma, interval="epoch"):
        super().__init__(base_lr, interval)
        self.gamma = gamma

    def get_lr(self, count):
        return self.base_lr * self.gamma**count


class CosineAnnealingLR(LRScheduler):
    def __init__(self, base_lr, T_max, eta_min=0.0, interval="epoch"):
        super().__init__(base_lr, interval)
        self.T_max = T_max
        self.eta_min = eta_min

    def get_lr(self, count):
        t = min(count, self.T_max)
        return self.eta_min + (self.base_lr - self.eta_min) * (1 + math.cos(math.pi * t / self.T_max)) / 2


class CosineAnnealingWarmRestarts(LRScheduler):
    def __init__(self, base_lr, T_0, T_mult=1, eta_min=0.0, interval="epoch"):
        super().__init__(base_lr, interval)
        self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min

    def get_lr(self, count):
        t, T_i = count, self.T_0
        while t >= T_i:
            t -= T_i
            T_i *= self.T_mult
        return self.eta_min + (self.base_lr - self.eta_min) * (1 + math.cos(math.pi * t / T_i)) / 2


class PolynomialLR(LRScheduler):
    def __init__(self, base_lr, total_iters=5, power=1.0, interval="epoch"):
        super().__init__(base_lr, interval)
        self.total_iters = total_iters
        self.power = power

    def get_lr(self, count):
        t = min(count, self.total_iters)
        return self.base_lr * (1 - t / self.total_iters) ** self.power


class OneCycleLR(LRScheduler):
    """Cosine-annealed one-cycle policy (warmup to max_lr then anneal)."""

    def __init__(self, base_lr, total_steps, max_lr=None, pct_start=0.3,
                 div_factor=25.0, final_div_factor=1e4, interval="step"):
        max_lr = max_lr if max_lr is not None else base_lr
        super().__init__(max_lr, interval)
        self.total_steps = total_steps
        self.pct_start = pct_start
        self.initial_lr = max_lr / div_factor
        self.min_lr = self.initial_lr / final_div_factor

    def get_lr(self, count):
        t = min(count, self.total_steps)
        up = self.pct_start * self.total_steps
        if t <= up:
            frac = t / max(up, 1)
            return self.initial_lr + (self.base_lr - self.initial_lr) * (1 - math.cos(math.pi * frac)) / 2
        frac = (t - up) / max(self.total_steps - up, 1)
        return self.min_lr + (self.base_lr - self.min_lr) * (1 + math.cos(math.pi * frac)) / 2


class ReduceLROnPlateau(LRScheduler):
    def __init__(self, base_lr, mode="min", factor=0.1, patience=10,
                 threshold=1e-4, min_lr=0.0, interval="epoch"):
        super().__init__(base_lr, interval)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.current_lr = base_lr
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad = 0

    def get_lr(self, count):
        return self.current_lr

    def step(self, metric: float | None = None) -> float:
        self.last_count += 1
        if metric is None:
            return self.current_lr
        improved = (
            metric < self.best - self.threshold
            if self.mode == "min"
            else metric > self.best + self.threshold
        )
        if improved:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.current_lr = max(self.current_lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.current_lr

    def state_dict(self):
        return {
            "last_count": self.last_count,
            "current_lr": self.current_lr,
            "best": self.best,
            "num_bad": self.num_bad,
        }

    def load_state_dict(self, state):
        self.last_count = int(state["last_count"])
        self.current_lr = float(state["current_lr"])
        self.best = float(state["best"])
        self.num_bad = int(state["num_bad"])


LR_SCHEDULERS: dict[str, Any] = {
    "ConstantLR": ConstantLR,
    "MultiStepLR": MultiStepLR,
    "ExponentialLR": ExponentialLR,
    "CosineAnnealingLR": CosineAnnealingLR,
    "CosineAnnealingWarmRestarts": CosineAnnealingWarmRestarts,
    "PolynomialLR": PolynomialLR,
    "OneCycleLR": OneCycleLR,
    "ReduceLROnPlateau": ReduceLROnPlateau,
}


def create_lr_scheduler(base_lr: float, name: str, interval: str = "epoch", **params) -> LRScheduler:
    return LR_SCHEDULERS[name](base_lr, interval=interval, **params)
