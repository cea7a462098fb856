"""Optimizer and LR-scheduler factories from config strings.

The reference builds torch optimizers/schedulers from their class names
(``src/multivae/trainers/base/base_trainer.py:231-263``), with eager
validation in the trainer config (``base_trainer_config.py:99-149``). Here
the names map to optax transforms (torch param names like ``betas`` are
translated), and schedulers are small host-side objects that recompute the
learning rate each epoch — matching torch's per-epoch ``scheduler.step()``
semantics — feeding an ``optax.inject_hyperparams`` learning-rate slot so
the jitted train step never retraces.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def _translate_torch_params(params: dict) -> dict:
    out = dict(params)
    if "betas" in out:
        b1, b2 = out.pop("betas")
        out["b1"] = b1
        out["b2"] = b2
    return out


_OPTIMIZERS = {
    "Adam": (optax.adam, {"b1", "b2", "eps", "eps_root", "nesterov"}),
    "AdamW": (optax.adamw, {"b1", "b2", "eps", "eps_root", "weight_decay",
                            "nesterov"}),
    "Adagrad": (optax.adagrad, {"eps", "initial_accumulator_value"}),
    "Adadelta": (optax.adadelta, {"rho", "eps", "weight_decay"}),
    "SGD": (optax.sgd, {"momentum", "nesterov"}),
    "RMSprop": (optax.rmsprop, {"decay", "eps", "momentum", "centered",
                                "initial_scale"}),
    "Adamax": (optax.adamax, {"b1", "b2", "eps"}),
    "RAdam": (optax.radam, {"b1", "b2", "eps", "eps_root", "threshold"}),
}


def make_optimizer(optimizer_cls: str, learning_rate: float,
                   optimizer_params: Optional[dict] = None):
    """Build an ``optax.inject_hyperparams``-wrapped optimizer.

    Raises AttributeError on unknown names and TypeError on bad params,
    mirroring reference config validation (``base_trainer_config.py:99-127``).
    """
    if optimizer_cls not in _OPTIMIZERS:
        raise AttributeError(
            f"Unable to build `{optimizer_cls}` optimizer. Available "
            f"optimizers: {sorted(_OPTIMIZERS)}"
        )
    ctor, allowed = _OPTIMIZERS[optimizer_cls]
    params = _translate_torch_params(optimizer_params or {})
    # torch spells AMSGrad as Adam(amsgrad=True); optax has a separate ctor
    if optimizer_cls == "Adam" and params.pop("amsgrad", False):
        ctor = optax.amsgrad
    unknown = set(params) - allowed
    if unknown:
        raise TypeError(
            f"Error in optimizer's parameters. Unknown parameters {unknown} "
            f"for `{optimizer_cls}` (allowed: {sorted(allowed)})."
        )
    try:
        return optax.inject_hyperparams(ctor)(
            learning_rate=learning_rate, **params
        )
    except TypeError as e:
        raise TypeError(
            f"Error in optimizer's parameters for `{optimizer_cls}`: {e}"
        ) from e


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in place-of-value (no retrace)."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class LRScheduler:
    """Base epoch-wise scheduler (host-side); subclasses mirror torch."""

    needs_metric = False

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.last_epoch = 0
        self.current_lr = base_lr

    def step(self, metric: Optional[float] = None) -> float:
        self.last_epoch += 1
        self.current_lr = self._compute_lr(metric)
        return self.current_lr

    @property
    def deterministic(self) -> bool:
        """True when the LR trajectory is a pure function of the epoch
        number (every scheduler except ReduceLROnPlateau): the trainer's
        pipelined/fused-block paths can then precompute each epoch's LR
        at DISPATCH time (``lr_at``) instead of waiting for the epoch
        loss, so an LR schedule no longer forces the synchronous loop."""
        return not self.needs_metric

    def lr_at(self, last_epoch: int) -> float:
        """Pure evaluation: the LR in force after ``last_epoch`` steps —
        i.e. the LR epoch ``last_epoch + 1`` trains under. Identical to
        the value the stateful ``step()`` sequence produces (every
        deterministic ``_compute_lr`` reads only ``self.last_epoch`` and
        constructor constants)."""
        if not self.deterministic:  # pragma: no cover - guarded by callers
            raise RuntimeError(
                f"{type(self).__name__} depends on the epoch metric; its "
                "LR cannot be computed ahead of the epoch.")
        saved = self.last_epoch
        self.last_epoch = last_epoch
        try:
            return self._compute_lr(None)
        finally:
            self.last_epoch = saved

    def _compute_lr(self, metric) -> float:
        return self.current_lr

    def state_dict(self) -> dict:
        return {"last_epoch": self.last_epoch, "current_lr": self.current_lr}

    def load_state_dict(self, d: dict):
        self.last_epoch = d["last_epoch"]
        self.current_lr = d["current_lr"]


class StepLR(LRScheduler):
    def __init__(self, base_lr, step_size: int, gamma: float = 0.1):
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma

    def _compute_lr(self, metric):
        return self.base_lr * self.gamma ** (self.last_epoch // self.step_size)


class MultiStepLR(LRScheduler):
    def __init__(self, base_lr, milestones, gamma: float = 0.1):
        super().__init__(base_lr)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def _compute_lr(self, metric):
        n = sum(1 for m in self.milestones if m <= self.last_epoch)
        return self.base_lr * self.gamma ** n


class ExponentialLR(LRScheduler):
    def __init__(self, base_lr, gamma: float):
        super().__init__(base_lr)
        self.gamma = gamma

    def _compute_lr(self, metric):
        return self.base_lr * self.gamma ** self.last_epoch


class LinearLR(LRScheduler):
    def __init__(self, base_lr, start_factor: float = 1.0 / 3,
                 end_factor: float = 1.0, total_iters: int = 5):
        super().__init__(base_lr)
        self.start_factor = start_factor
        self.end_factor = end_factor
        self.total_iters = total_iters
        self.current_lr = base_lr * start_factor

    def _compute_lr(self, metric):
        t = min(self.last_epoch, self.total_iters) / self.total_iters
        factor = self.start_factor + (self.end_factor - self.start_factor) * t
        return self.base_lr * factor


class CosineAnnealingLR(LRScheduler):
    def __init__(self, base_lr, T_max: int, eta_min: float = 0.0):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min

    def _compute_lr(self, metric):
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.last_epoch / self.T_max)
        ) / 2


class ConstantLR(LRScheduler):
    """torch.optim.lr_scheduler.ConstantLR: base_lr * factor until
    ``total_iters`` epochs have passed, then base_lr."""

    def __init__(self, base_lr, factor: float = 1.0 / 3,
                 total_iters: int = 5):
        super().__init__(base_lr)
        self.factor = factor
        self.total_iters = total_iters
        self.current_lr = base_lr * factor

    def _compute_lr(self, metric):
        if self.last_epoch < self.total_iters:
            return self.base_lr * self.factor
        return self.base_lr


class PolynomialLR(LRScheduler):
    """torch.optim.lr_scheduler.PolynomialLR (closed form): base_lr *
    (1 - min(e, total_iters)/total_iters) ** power."""

    def __init__(self, base_lr, total_iters: int = 5, power: float = 1.0):
        super().__init__(base_lr)
        self.total_iters = total_iters
        self.power = power

    def _compute_lr(self, metric):
        t = min(self.last_epoch, self.total_iters) / self.total_iters
        return self.base_lr * (1.0 - t) ** self.power


class CosineAnnealingWarmRestarts(LRScheduler):
    """torch.optim.lr_scheduler.CosineAnnealingWarmRestarts (closed
    form): cosine annealing restarting every ``T_0 * T_mult**n``
    epochs."""

    def __init__(self, base_lr, T_0: int, T_mult: int = 1,
                 eta_min: float = 0.0):
        super().__init__(base_lr)
        if T_0 <= 0 or not isinstance(T_0, int):
            raise TypeError(f"Expected positive integer T_0, but got {T_0}")
        if T_mult < 1 or not isinstance(T_mult, int):
            raise TypeError(f"Expected integer T_mult >= 1, but got {T_mult}")
        self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min

    def _compute_lr(self, metric):
        e = self.last_epoch
        if self.T_mult == 1:
            t_cur = e % self.T_0
            t_i = self.T_0
        else:
            n = int(math.log(e / self.T_0 * (self.T_mult - 1) + 1,
                             self.T_mult)) if e >= self.T_0 else 0
            t_i = self.T_0 * self.T_mult ** n
            t_cur = e - self.T_0 * (self.T_mult ** n - 1) // (self.T_mult - 1)
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * t_cur / t_i)
        ) / 2


class ReduceLROnPlateau(LRScheduler):
    """Torch-semantics plateau scheduler (the reference's default choice for
    the PolyMNIST benchmark, ``global_config.py``)."""

    needs_metric = True

    def __init__(self, base_lr, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0, eps: float = 1e-8,
                 verbose: bool = False):
        super().__init__(base_lr)
        if mode not in ("min", "max"):
            raise TypeError(f"mode must be 'min' or 'max', got {mode}")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        # torch semantics: a triggered reduction is IGNORED when the lr
        # delta is <= eps (torch.optim.lr_scheduler._reduce_lr)
        self.eps = eps
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, metric):
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return metric < self.best * (1 - self.threshold)
            return metric < self.best - self.threshold
        if self.threshold_mode == "rel":
            return metric > self.best * (1 + self.threshold)
        return metric > self.best + self.threshold

    def _compute_lr(self, metric):
        # Exact mirror of torch.optim.lr_scheduler.ReduceLROnPlateau.step:
        # better/cooldown are INDEPENDENT updates (the cooldown counter
        # decrements every in-cooldown epoch, improving or not), then the
        # patience check fires on the resulting bad-epoch count.
        if metric is None:
            return self.current_lr
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            self.cooldown_counter = self.cooldown
            new_lr = max(self.current_lr * self.factor, self.min_lr)
            if self.current_lr - new_lr > self.eps:
                return new_lr
        return self.current_lr

    def state_dict(self):
        d = super().state_dict()
        d.update(best=self.best, num_bad_epochs=self.num_bad_epochs,
                 cooldown_counter=self.cooldown_counter)
        return d

    def load_state_dict(self, d):
        super().load_state_dict(d)
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
        self.cooldown_counter = d["cooldown_counter"]


_SCHEDULERS = {
    "StepLR": StepLR,
    "MultiStepLR": MultiStepLR,
    "ExponentialLR": ExponentialLR,
    "LinearLR": LinearLR,
    "ConstantLR": ConstantLR,
    "PolynomialLR": PolynomialLR,
    "CosineAnnealingLR": CosineAnnealingLR,
    "CosineAnnealingWarmRestarts": CosineAnnealingWarmRestarts,
    "ReduceLROnPlateau": ReduceLROnPlateau,
}


def make_scheduler(scheduler_cls: Optional[str], base_lr: float,
                   scheduler_params: Optional[dict] = None):
    """Build a scheduler by torch class name, or None."""
    if scheduler_cls is None:
        return None
    if scheduler_cls not in _SCHEDULERS:
        raise AttributeError(
            f"Unable to build `{scheduler_cls}` scheduler. Available "
            f"schedulers: {sorted(_SCHEDULERS)}"
        )
    try:
        return _SCHEDULERS[scheduler_cls](base_lr, **(scheduler_params or {}))
    except TypeError as e:
        raise TypeError(
            f"Error in scheduler's parameters for `{scheduler_cls}`: {e}"
        ) from e
