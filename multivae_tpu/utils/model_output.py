"""Attribute-accessible output container used across the framework.

Equivalent in role to pythae's ``ModelOutput`` (the reference imports it in 21
modules, e.g. reference ``src/multivae/models/base/base_utils.py``), but
registered as a JAX pytree so it can flow through ``jax.jit`` / ``jax.vmap`` /
``jax.lax.scan`` boundaries.
"""

from __future__ import annotations

import jax


class ModelOutput(dict):
    """A dict with attribute access, usable as a JAX pytree.

    Keys are pytree aux data (static), values are children. Keep static
    Python values (bools, strings, lists of names) out of jitted return
    values; set them at the API boundary instead.
    """

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __repr__(self):
        inner = ", ".join(f"{k}={type(v).__name__}" for k, v in self.items())
        return f"ModelOutput({inner})"


def _flatten(mo: ModelOutput):
    keys = sorted(mo.keys())
    return tuple(mo[k] for k in keys), tuple(keys)


def _flatten_with_keys(mo: ModelOutput):
    keys = sorted(mo.keys())
    return tuple((jax.tree_util.DictKey(k), mo[k]) for k in keys), tuple(keys)


def _unflatten(keys, children):
    return ModelOutput(zip(keys, children))


jax.tree_util.register_pytree_with_keys(
    ModelOutput, _flatten_with_keys, _unflatten, _flatten
)
