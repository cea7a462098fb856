"""DReG (doubly-reparameterized gradient) support.

The reference implements DReG by registering a backward hook on the latent
samples that multiplies their incoming gradient by the normalized importance
weights w_k (``src/multivae/models/mmvae/mmvae_model.py:262-266``). JAX has
no mutable hooks; ``scale_grad`` is the equivalent: identity in the forward
pass, cotangent multiplied by w in the backward pass (SURVEY §7.1).
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def scale_grad(x, w):
    """Identity on ``x``; backward multiplies the cotangent by ``w``.

    ``w`` must broadcast against ``x`` and receives no gradient.
    """
    return x


def _scale_grad_fwd(x, w):
    return x, w


def _scale_grad_bwd(w, g):
    # keep the cotangent in the primal dtype (w may be f32 under bf16
    # mixed precision; a promoted cotangent breaks bf16 transpose rules)
    return ((g * w).astype(g.dtype), None)


scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)
