"""Host-side parameter initialization.

The reference initializes on CPU by torch default; here, on an
accelerator backend every flax ``Module.init`` is its own compiled
program, and on tunneled/remote TPUs those per-module compiles dominate
model CONSTRUCTION (measured on the v5e tunnel: ~14 s per conv
module initialized on-device vs ~6 s compiling the same init on the host
CPU backend — the 10-network conv MVTCAE constructs in ~26 s idle, and
several minutes on-device under host load). ``init_on_host`` runs an ``init_params``-style
method under the host CPU device and transfers the finished pytree to
the default device in one ``device_put``. Results are bit-identical:
``jax.random`` is backend-invariant.
"""

from __future__ import annotations

import functools
import logging

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def _host_cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except (RuntimeError, IndexError):  # pragma: no cover - no cpu backend
        return None


def init_on_host(init_fn):
    """Decorator for ``init_params`` methods: run the init computation on
    the host CPU backend, then move the result to the default device.

    Falls back to the undecorated behavior when the default device IS the
    CPU (tests, CPU runs) or when host-side init fails (e.g. the inputs
    are already committed to an accelerator)."""

    @functools.wraps(init_fn)
    def wrapped(self, *args, **kwargs):
        # the device params should land on: the user-configured default
        # if any, else the first LOCAL device (jax.devices()[0] may be
        # non-addressable on processes > 0 in multi-host runs)
        default = getattr(jax.config, "jax_default_device", None)
        if default is None or not hasattr(default, "platform"):
            default = jax.local_devices()[0]
        cpu = _host_cpu_device()
        if cpu is None or default.platform == "cpu":
            return init_fn(self, *args, **kwargs)
        try:
            with jax.default_device(cpu):
                params = init_fn(self, *args, **kwargs)
        except Exception:  # pragma: no cover - committed-input edge cases
            logger.info(
                "host-side init failed; retrying on the default device")
            return init_fn(self, *args, **kwargs)
        if params is None:
            return params
        # UNCOMMITTED transfer to the default device. An explicit
        # jax.device_put(..., device) commits the arrays, and on the
        # axon TPU plugin committed donated-state inputs fall off the
        # fast execution path (measured: 53 vs 4,184 steps/s on the SAME
        # jitted train step) — jnp.asarray reproduces the placement
        # semantics of on-device init outputs.
        params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), params)
        self.params = params
        return params

    return wrapped
