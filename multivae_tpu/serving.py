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


def _request_batch_size(data):
    """Validate a request dict: non-empty, consistent leading dims."""
    if not data:
        raise ValueError("Empty request: provide at least one modality.")
    sizes = {m: np.asarray(v).shape[0] for m, v in data.items()}
    if len(set(sizes.values())) != 1:
        raise ValueError(
            f"All request modalities must share the leading batch "
            f"dimension, got {sizes}."
        )
    return next(iter(sizes.values()))


def _pad_rows(x, batch_size):
    """Zero-pad a (n, ...) array to (batch_size, ...)."""
    pad = batch_size - x.shape[0]
    if pad:
        x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)])
    return x


def _unshard(x):
    """Strip an example arg down to its aval so the exported program
    carries NO device shardings. An endpoint exported from a model
    trained on an N-device mesh must not bake the TRAINING topology into
    the serving artifact — and jax.export mis-records a typed PRNG key's
    rank-0 sharding against its rank-1 key-data tensor when any arg
    carries a mesh (``sdy.sharding_constraint ... 0 != 1`` at load
    time). ``jax.export`` only needs shapes/dtypes, so this returns a
    ``ShapeDtypeStruct`` (sharding unset) rather than host-materializing
    the array — a ``np.asarray`` per param leaf would fetch the whole
    model device->host at export time (one round trip per buffer)."""
    if isinstance(x, jax.Array) or hasattr(x, "dtype"):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x


def _export_serialized(call, path, *example_args):
    from jax import export as jexport

    example_args = jax.tree.map(_unshard, example_args)
    exp = jexport.export(call)(*example_args)
    with open(path, "wb") as f:
        f.write(exp.serialize())
    return path


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
        dummy = {
            m: jnp.zeros((self.batch_size,
                          *self.model.model_config.input_dims[m]),
                         jnp.float32)
            for m in self.cond_mod
        }
        return _export_serialized(self._call, path, self.model.params,
                                  dummy, jax.random.key(0))

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
        n = _request_batch_size(data)
        missing = set(self.cond_mod) - set(data)
        if missing:
            raise ValueError(
                f"Request is missing the compiled conditioning modalities "
                f"{sorted(missing)} (endpoint conditions on "
                f"{list(self.cond_mod)}).")
        if n > self.batch_size:
            raise ValueError(
                f"Request batch {n} exceeds compiled batch_size "
                f"{self.batch_size}; split the request or build a bigger "
                "Predictor."
            )
        padded = {m: _pad_rows(np.asarray(data[m], np.float32),
                               self.batch_size)
                  for m in self.cond_mod}
        self._rng, rng = jax.random.split(self._rng)
        out = self._call(self.model.params, padded, rng)
        return ModelOutput(
            **{m: np.asarray(v)[:n] for m, v in out.items()})


class AnySubsetPredictor:
    """ONE fixed-shape compiled endpoint serving ANY conditioning pattern —
    per request row.

    Models whose masked-subset encoding is fully per-sample
    (``supports_per_sample_conditioning``: the PoE families — MVTCAE,
    CRMVAE, MVAE, DMVAE, MHVAE) aggregate experts with per-sample
    multiplicative precision masks, so a single compiled program can serve
    a batch where row 0 conditions on {image}, row 1 on {image, audio} and
    row 2 on {audio}: absent modalities are zero-filled and their mask row
    zeroed, exactly the models' incomplete-data semantics. A per-subset
    endpoint fleet (2^M - 1 ``Predictor``s) collapses to one program, and
    requests never need to be grouped by conditioning pattern.

    Example::

        pred = AnySubsetPredictor(model, batch_size=64)
        out = pred({"image": imgs})                      # whole batch: {image}
        out = pred({"image": imgs, "audio": wavs},
                   masks={"audio": audio_present})       # mixed per-row

    Rows must have at least one available modality. ``deterministic=True``
    uses posterior means.
    """

    def __init__(self, model, gen_mod: Union[str, List[str]] = "all",
                 batch_size: int = 64, deterministic: bool = False,
                 seed: int = 0):
        if not getattr(model, "supports_per_sample_conditioning", False):
            raise TypeError(
                f"{type(model).__name__} does not support per-sample "
                "conditioning (its subset encoding draws one mixture "
                "expert per batch); use per-subset Predictor endpoints."
            )
        self.model = model
        self.mods = list(model.encoders.keys())
        if gen_mod == "all":
            gen_mod = list(model.decoders.keys())
        elif isinstance(gen_mod, str):
            gen_mod = [gen_mod]
        self.gen_mod = tuple(gen_mod)
        self.batch_size = int(batch_size)
        self.deterministic = bool(deterministic)
        self._rng = jax.random.key(seed)
        # models with a per-row posterior-vs-prior select (DMVAE) take an
        # explicit flag: the public encode keeps reference semantics, the
        # per-row endpoint opts in
        self._encode_kwargs = {}
        if getattr(model, "masked_encode_per_sample_flag", False):
            self._encode_kwargs["per_sample"] = True
        self._call = jax.jit(self._predict_fn)

    def _predict_fn(self, params, data, masks, rng):
        b = self.batch_size
        batch = MultimodalBatch(
            data=data, masks=masks,
            weights=jnp.ones((b,), jnp.float32), labels=None,
            incomplete=True,
        )
        enc = self.model._encode_masked(
            params, batch, rng, jnp.ones((len(self.mods),), jnp.float32),
            N=1, return_mean=self.deterministic, flatten=True,
            **self._encode_kwargs,
        )
        return self.model._decode_mods(
            params, enc["z"], self.gen_mod,
            modalities_z=enc.get("modalities_z"),
        )

    def warmup(self):
        dummy = {self.mods[0]: np.zeros(
            (self.batch_size,
             *self.model.model_config.input_dims[self.mods[0]]), np.float32)}
        self(dummy)
        return self

    def export(self, path: str) -> str:
        """Serialize the endpoint (StableHLO via ``jax.export``); the loaded
        ``fn(params, data, masks, rng)`` takes full data/mask dicts."""
        dummy = {
            m: jnp.zeros((self.batch_size,
                          *self.model.model_config.input_dims[m]),
                         jnp.float32)
            for m in self.mods
        }
        masks = {m: jnp.ones((self.batch_size,), jnp.float32)
                 for m in self.mods}
        return _export_serialized(self._call, path, self.model.params,
                                  dummy, masks, jax.random.key(0))

    def __call__(self, data: Dict[str, np.ndarray],
                 masks: Dict[str, np.ndarray] = None) -> ModelOutput:
        masks = masks or {}
        unknown = (set(data) | set(masks)) - set(self.mods)
        if unknown:
            raise ValueError(
                f"Unknown modalities in the request: {sorted(unknown)}; "
                f"this model has {self.mods}.")
        orphan = set(masks) - set(data)
        if orphan:
            raise ValueError(
                f"masks provided for modalities absent from data: "
                f"{sorted(orphan)}. A mask qualifies rows of a provided "
                "modality; to mark a modality absent, omit it from data "
                "(and from masks).")
        n = _request_batch_size(data)
        for m, v in masks.items():
            if np.asarray(v).shape[0] != n:
                raise ValueError(
                    f"masks[{m!r}] has {np.asarray(v).shape[0]} rows but "
                    f"the request has {n}.")
        if n > self.batch_size:
            raise ValueError(
                f"Request batch {n} exceeds compiled batch_size "
                f"{self.batch_size}; split the request or build a bigger "
                "AnySubsetPredictor."
            )
        full_data, full_masks = {}, {}
        row_has_mod = np.zeros((n,), bool)
        for m in self.mods:
            shape = self.model.model_config.input_dims[m]
            if m in data:
                x = np.asarray(data[m], np.float32)
                mk = np.asarray(masks.get(m, np.ones((n,))), np.float32)
            else:
                x = np.zeros((n, *shape), np.float32)
                mk = np.zeros((n,), np.float32)
            row_has_mod |= mk > 0
            # zero the data of per-row-absent modalities (defensive: the
            # mask already removes them from every aggregation)
            x = x * mk.reshape((n,) + (1,) * (x.ndim - 1))
            full_data[m] = _pad_rows(x, self.batch_size)
            full_masks[m] = _pad_rows(mk, self.batch_size)
        if not row_has_mod.all():
            raise ValueError(
                "Every request row must have at least one available "
                f"modality; rows {np.nonzero(~row_has_mod)[0].tolist()} "
                "have none."
            )
        self._rng, rng = jax.random.split(self._rng)
        out = self._call(self.model.params, full_data, full_masks, rng)
        return ModelOutput(
            **{m: np.asarray(v)[:n] for m, v in out.items()})
