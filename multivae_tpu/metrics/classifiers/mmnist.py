"""PolyMNIST digit classifier + pretrained-checkpoint loader.

Reference: ``src/multivae/metrics/classifiers/mmnist.py``. Same conv
architecture in Flax; ``load_mmnist_classifiers`` loads either converted
msgpack weights or (when torch checkpoint files are present, as shipped
with the PolyMNIST download) converts the torch state dicts on the fly.
Inputs are (B, 3, 28, 28) images.
"""

from __future__ import annotations

import os

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


class ClassifierPolyMNIST(nn.Module):
    """(B, 3, 28, 28) -> (B, 10) logits (eval mode: dropout disabled)."""

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        x = nn.Conv(10, (4, 4), (2, 2), padding=((1, 1), (1, 1)),
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(20, (4, 4), (2, 2), padding=((1, 1), (1, 1)),
                    name="conv2")(x)
        x = nn.relu(x)
        # torch flattens NCHW; match that ordering for weight conversion
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        return nn.Dense(10, name="fc2")(x)


def convert_torch_classifier_state_dict(state_dict: dict) -> dict:
    """Map the reference torch classifier state_dict to flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return {
        "conv1": {"kernel": sd["encoder.0.weight"].transpose(2, 3, 1, 0),
                  "bias": sd["encoder.0.bias"]},
        "conv2": {"kernel": sd["encoder.3.weight"].transpose(2, 3, 1, 0),
                  "bias": sd["encoder.3.bias"]},
        "fc1": {"kernel": sd["encoder.7.weight"].T,
                "bias": sd["encoder.7.bias"]},
        "fc2": {"kernel": sd["encoder.10.weight"].T,
                "bias": sd["encoder.10.bias"]},
    }


def load_mmnist_classifiers(data_path: str = ".data/clf", device=None):
    """Load the five pretrained PolyMNIST classifiers as callables.

    Reference: ``metrics/classifiers/mmnist.py:47-65``. Accepts either
    converted msgpack files (``pretrained_img_to_digit_clf_m{i}.msgpack``)
    or the original torch checkpoints (requires torch).
    """
    from flax import serialization

    model = ClassifierPolyMNIST()
    clfs = {}
    for i in range(5):
        msgpack_path = os.path.join(
            data_path, f"pretrained_img_to_digit_clf_m{i}.msgpack")
        torch_path = os.path.join(
            data_path, f"pretrained_img_to_digit_clf_m{i}")
        if os.path.exists(msgpack_path):
            with open(msgpack_path, "rb") as f:
                params = serialization.msgpack_restore(f.read())
        elif os.path.exists(torch_path):
            import torch

            sd = torch.load(torch_path, map_location="cpu")
            params = convert_torch_classifier_state_dict(
                {k: v.numpy() for k, v in sd.items()}
            )
        else:
            raise FileNotFoundError(
                f"No classifier checkpoint found for modality m{i} under "
                f"{data_path}."
            )
        params = jax.tree.map(jnp.asarray, params)

        def make_clf(p):
            @jax.jit
            def clf(x):
                return model.apply({"params": p}, jnp.asarray(x))

            return clf

        clfs[f"m{i}"] = make_clf(params)
    return clfs
