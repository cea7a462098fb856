"""MultiVae-TPU: a TPU-native multimodal Variational Autoencoder framework.

A ground-up JAX/Flax/XLA rebuild of the capabilities of the MultiVae library
(multimodal VAEs: PoE/MoE/MoPoE aggregation, incomplete-data support via
per-modality masks, epoch trainers, post-hoc latent samplers and evaluation
metrics), designed TPU-first:

- All model math (modality encoders, posterior aggregation, ELBO/IWAE losses)
  compiles to single fused XLA programs; modality subsets are expressed as
  precomputed mask matrices instead of Python loops; importance-sample axes
  (K) map to ``jax.vmap`` / ``lax.scan``.
- Missing modalities are handled with multiplicative *precision masks*
  (mask * exp(-log_var)) rather than infinite log-variances, which is
  numerically safe under XLA and preserves zero gradients to missing
  modalities' encoders.
- Training is a jitted, donated train step over a ``jax.sharding.Mesh``
  (data-parallel by default), replacing the reference's PyTorch DDP.

Reference behavior parity is tracked against AgatheSenellart/MultiVae
(see SURVEY.md); file:line citations in docstrings point into that repo.
"""

__version__ = "0.1.0"

from .utils.model_output import ModelOutput

__all__ = ["ModelOutput"]
