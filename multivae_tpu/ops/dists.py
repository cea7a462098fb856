"""Decoder reconstruction distributions as elementwise log-prob closures.

Re-implements ``set_decoder_dist`` / ``cross_entropy`` from the reference ops
layer (``src/multivae/models/base/base_utils.py:28-87``) on jnp. Each
returned callable maps (reconstruction, target) -> elementwise log-probs with
the same shape semantics as the torch.distributions versions, so model code
can ``.reshape(B, -1).sum(-1)`` identically.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def normal_log_prob(recon, target, scale: float = 1.0):
    """log N(target; recon, scale^2), elementwise."""
    var = scale * scale
    return -0.5 * ((target - recon) ** 2 / var + _LOG_2PI) - math.log(scale)


def bernoulli_logits_log_prob(logits, target):
    """log Bernoulli(target; sigmoid(logits)), elementwise.

    Valid for continuous targets in [0, 1] (matches
    torch.distributions.Bernoulli(logits=...).log_prob which uses
    -BCEWithLogits).
    """
    return target * jax.nn.log_sigmoid(logits) + (1.0 - target) * jax.nn.log_sigmoid(
        -logits
    )


def laplace_log_prob(recon, target, scale: float = 1.0):
    """log Laplace(target; recon, scale), elementwise."""
    return -jnp.abs(target - recon) / scale - math.log(2.0 * scale)


def cross_entropy_(logits, target_probs, eps: float = 1e-6):
    """K-class cross-entropy contribution, elementwise over the class axis.

    Mirrors reference ``cross_entropy_`` (``base_utils.py:28-38``): returns
    ``target * log_softmax(logits + eps)`` with the *same shape as logits*
    (per-class contributions, not reduced). Note: adding a scalar eps to all
    logits leaves log_softmax unchanged; kept for doc parity.
    """
    log_input = jax.nn.log_softmax(logits + eps, axis=-1)
    return target_probs * log_input


def cross_entropy(logits, target, eps: float = 1e-6):
    """Wrapper handling dict inputs/targets for text modalities.

    Reference: ``base_utils.py:41-59``. ``logits`` may be a dict with key
    'one_hot'; ``target`` may carry 'one_hot' probabilities or integer
    'tokens' (converted to one-hot over the logits' class axis).
    """
    _logits = logits
    _target = target
    if isinstance(logits, dict):
        if "one_hot" in logits:
            _logits = logits["one_hot"]
        else:
            raise NotImplementedError(
                "dict logits must contain a 'one_hot' field"
            )
    if isinstance(target, dict):
        if "one_hot" in target:
            _target = target["one_hot"]
        elif "tokens" in target:
            _target = jax.nn.one_hot(
                target["tokens"], _logits.shape[-1], dtype=_logits.dtype
            )
    return cross_entropy_(_logits, _target, eps)


def set_decoder_dist(dist_name: str, dist_params: dict):
    """Build an elementwise log-prob callable from a distribution name.

    Reference: ``base_utils.py:62-87``. Supported: 'normal', 'bernoulli'
    (decoder outputs logits), 'laplace', 'categorical'.
    """
    dist_params = dict(dist_params or {})
    if dist_name == "normal":
        scale = float(dist_params.pop("scale", 1.0))

        def log_prob(recon, target):
            return normal_log_prob(recon, target, scale)

    elif dist_name == "bernoulli":

        def log_prob(recon, target):
            return bernoulli_logits_log_prob(recon, target)

    elif dist_name == "laplace":
        scale = float(dist_params.pop("scale", 1.0))

        def log_prob(recon, target):
            return laplace_log_prob(recon, target, scale)

    elif dist_name == "categorical":
        log_prob = cross_entropy

    else:
        raise ValueError(f"The distribution type '{dist_name}' is not supported")

    return log_prob
