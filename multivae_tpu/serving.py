"""Serving utilities: fixed-shape compiled predictors.

The reference has no serving layer (inference is ad-hoc ``model.predict``
calls); on TPU, production inference wants ONE pre-compiled program per
(conditioning set, generation set, batch size) with static shapes, so
requests never trigger a retrace. ``Predictor`` wraps a trained model's
encode+decode into such a program:

- requests of any size up to ``batch_size`` are zero-padded to the
  compiled shape and the padding rows are dropped from the response;
- the RNG is threaded explicitly so repeated calls produce fresh samples
  (or pass ``deterministic=True`` to use posterior means);
- ``warmup()`` forces compilation before the first request.

Example::

    pred = Predictor(model, cond_mod=["m0"], gen_mod="all", batch_size=64)
    pred.warmup()
    out = pred({"m0": images})   # ModelOutput of numpy arrays
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Union

import numpy as np

import jax
import jax.numpy as jnp

from .data.batch import MultimodalBatch
from .utils.model_output import ModelOutput


class Predictor:
    """A fixed-shape compiled cross-modal generation endpoint."""

    def __init__(self, model, cond_mod: Union[str, List[str]] = "all",
                 gen_mod: Union[str, List[str]] = "all",
                 batch_size: int = 64, deterministic: bool = False,
                 seed: int = 0):
        self.model = model
        if cond_mod == "all":
            cond_mod = list(model.encoders.keys())
        elif isinstance(cond_mod, str):
            cond_mod = [cond_mod]
        self.cond_mod = tuple(model._normalize_cond_mod(list(cond_mod)))
        if gen_mod == "all":
            gen_mod = list(model.decoders.keys())
        elif isinstance(gen_mod, str):
            gen_mod = [gen_mod]
        self.gen_mod = tuple(gen_mod)
        self.batch_size = int(batch_size)
        self.deterministic = bool(deterministic)
        self._rng = jax.random.key(seed)
        self._call = jax.jit(partial(self._predict_fn))

    def _predict_fn(self, params, data, rng):
        b = self.batch_size
        batch = MultimodalBatch(
            data=data,
            masks={m: jnp.ones((b,), jnp.float32) for m in data},
            weights=jnp.ones((b,), jnp.float32),
            labels=None,
            incomplete=False,
        )
        enc = self.model._encode_subset(
            params, batch, rng, cond_mod=self.cond_mod, N=1,
            return_mean=self.deterministic, flatten=True,
        )
        return self.model._decode_mods(
            params, enc["z"], self.gen_mod,
            modalities_z=enc.get("modalities_z"),
        )

    def export(self, path: str) -> str:
        """Serialize the compiled program (StableHLO via ``jax.export``) so
        a serving process can run it without the model's Python code::

            pred.export("endpoint.bin")
            ...
            call = Predictor.load_exported("endpoint.bin")
            out = call(params, {"m0": x}, jax.random.key(0))

        The artifact bakes in the platform (cpu/tpu) and the fixed shapes.
        """
        from jax import export as jexport

        dummy = {
            m: jnp.zeros((self.batch_size,
                          *self.model.model_config.input_dims[m]),
                         jnp.float32)
            for m in self.cond_mod
        }
        exp = jexport.export(self._call)(
            self.model.params, dummy, jax.random.key(0))
        with open(path, "wb") as f:
            f.write(exp.serialize())
        return path

    @staticmethod
    def load_exported(path: str):
        """Load a serialized endpoint; returns ``fn(params, data, rng)``."""
        from jax import export as jexport

        with open(path, "rb") as f:
            exp = jexport.deserialize(f.read())
        return exp.call

    def warmup(self):
        """Compile now instead of on the first request."""
        dummy = {
            m: np.zeros((self.batch_size,
                         *self.model.model_config.input_dims[m]), np.float32)
            for m in self.cond_mod
        }
        self(dummy)
        return self

    def __call__(self, data: Dict[str, np.ndarray]) -> ModelOutput:
        n = next(iter(data.values())).shape[0]
        if n > self.batch_size:
            raise ValueError(
                f"Request batch {n} exceeds compiled batch_size "
                f"{self.batch_size}; split the request or build a bigger "
                "Predictor."
            )
        padded = {}
        for m in self.cond_mod:
            x = np.asarray(data[m], np.float32)
            pad = self.batch_size - n
            if pad:
                x = np.concatenate(
                    [x, np.zeros((pad, *x.shape[1:]), np.float32)])
            padded[m] = x
        self._rng, rng = jax.random.split(self._rng)
        out = self._call(self.model.params, padded, rng)
        return ModelOutput(
            **{m: np.asarray(v)[:n] for m, v in out.items()})
