"""InceptionV3 (FID variant) in Flax + torch-weights converter.

Port of the FID-specific InceptionV3 used by the reference
(``src/multivae/metrics/fids/inception_networks.py:18-357``, itself the
pytorch-fid / mseitzer variant). Differences of the FID variant vs stock
torchvision InceptionV3: InceptionA/C and the first E block (Mixed_7b) use
average pooling with ``count_include_pad=False`` semantics, while the final
E block (Mixed_7c, ``FIDInceptionE_2`` at reference ``:294-322``) uses MAX
pooling in the pool branch.

Weights: no network egress here, so the pretrained weights must be provided
as a converted msgpack file (``convert_torch_state_dict`` maps a torch
state_dict — e.g. pt_inception-2015-12-05 — to this module's params).
Data layout: inputs are (B, 3, 299, 299) in [0, 1], scaled to [-1, 1]
internally like pytorch-fid.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.model_output import ModelOutput


class ConvBN(nn.Module):
    """Conv2d + BatchNorm(eps=1e-3, no scale-free) + ReLU, torch layout."""

    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _pad(k):
    return ((k, k), (k, k))


def _avg_pool_cip_false(x, window, strides, padding):
    """Average pooling with count_include_pad=False (torch semantics)."""
    summed = nn.pooling.pool(x, 0.0, jax.lax.add, (window, window),
                             (strides, strides),
                             ((padding, padding), (padding, padding)))
    ones = jnp.ones_like(x[..., :1])
    counts = nn.pooling.pool(ones, 0.0, jax.lax.add, (window, window),
                             (strides, strides),
                             ((padding, padding), (padding, padding)))
    return summed / jnp.maximum(counts, 1.0)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_cip_false(x, 3, 1, 1)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7dbl_5")(bd)
        bp = _avg_pool_cip_false(x, 3, 1, 1)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)),
                    name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)),
                    name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # FID variant: avg in Mixed_7b, MAX in Mixed_7c

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)),
                     name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)),
                     name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)),
                     name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)),
                     name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "max":
            bp = nn.max_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))
        else:
            bp = _avg_pool_cip_false(x, 3, 1, 1)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """FID InceptionV3 up to the 2048-dim pool3 features."""

    @nn.compact
    def __call__(self, x):
        # x: (B, 3, H, W) in [0, 1] -> NHWC in [-1, 1]
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = 2.0 * x - 1.0
        x = ConvBN(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool_type="max", name="Mixed_7c")(x)
        x = x.mean(axis=(1, 2))  # adaptive avg pool -> (B, 2048)
        return ModelOutput(embedding=x)


def convert_torch_state_dict(state_dict: dict) -> dict:
    """Map a pytorch-fid InceptionV3 state_dict to InceptionV3FID params.

    Accepts a dict of numpy arrays keyed by torch parameter names
    (e.g. 'Mixed_5b.branch1x1.conv.weight').
    """
    params = {}
    batch_stats = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked" or parts[0] == "fc":
            continue
        *module_path, layer, kind = parts
        path = module_path + [layer]
        value = np.asarray(value)
        if layer == "conv" and kind == "weight":
            # torch OIHW -> flax HWIO
            put(params, path + ["kernel"], value.transpose(2, 3, 1, 0))
        elif layer == "bn":
            if kind == "weight":
                put(params, path + ["scale"], value)
            elif kind == "bias":
                put(params, path + ["bias"], value)
            elif kind == "running_mean":
                put(batch_stats, path + ["mean"], value)
            elif kind == "running_var":
                put(batch_stats, path + ["var"], value)
    return {"params": params, "batch_stats": batch_stats}


def wrapper_inception(dims: int = 2048, path_weights: str = None):
    """Return a callable (B,3,H,W) in [0,1] -> (B, 2048) embeddings.

    Loads converted weights from ``path_weights`` (msgpack produced by
    serializing ``convert_torch_state_dict`` output).
    """
    import os

    from flax import serialization

    if path_weights is None or not os.path.exists(path_weights):
        raise FileNotFoundError(
            "InceptionV3 FID weights not found at "
            f"{path_weights}. Convert the pytorch-fid weights with "
            "convert_torch_state_dict + flax msgpack, or pass "
            "custom_encoders to the FIDEvaluator."
        )
    with open(path_weights, "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    variables = jax.tree.map(jnp.asarray, variables)
    model = InceptionV3FID()

    @jax.jit
    def embed(x):
        return model.apply(variables, jnp.asarray(x))["embedding"]

    return lambda x: ModelOutput(embedding=embed(x))
