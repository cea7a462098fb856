"""Network contracts (Flax equivalents of the reference ABCs).

Reference: ``src/multivae/models/nn/base_architectures.py`` (joint /
multi-latent / conditional encoders-decoders) and pythae's
``BaseEncoder``/``BaseDecoder``. In Flax these are thin ``nn.Module``
subclasses used as isinstance markers and to document the output contract:

- encoder(x)            -> ModelOutput(embedding, log_covariance)
- multilatent encoder   -> + style_embedding, style_log_covariance
- joint encoder(dict x) -> ModelOutput(embedding, log_covariance)
- decoder(z)            -> ModelOutput(reconstruction)
- conditional decoder(z, cond_mods) -> ModelOutput(reconstruction)
"""

from __future__ import annotations

import flax.linen as nn


class BaseEncoder(nn.Module):
    """Unimodal encoder: x -> ModelOutput(embedding, log_covariance)."""


class BaseDecoder(nn.Module):
    """Unimodal decoder: z -> ModelOutput(reconstruction)."""


class BaseJointEncoder(nn.Module):
    """Joint encoder over a dict of modalities.

    Reference: ``src/multivae/models/nn/base_architectures.py:7-49``.
    """


class BaseMultilatentEncoder(BaseEncoder):
    """Encoder with shared + private (style) latent heads.

    Reference: ``src/multivae/models/nn/base_architectures.py:52-99``.
    """


class BaseConditionalDecoder(nn.Module):
    """Decoder conditioned on other modalities: (z, cond_mods) -> recon.

    Reference: ``src/multivae/models/nn/base_architectures.py:102-143``.
    """
