"""BaseJointModel: models with a joint encoder over all modalities.

Reference: ``src/multivae/models/joint_models/joint_model.py``. Adds a
``joint_encoder`` network group and the shared Gaussian-joint-posterior
IWAE joint NLL. Incomplete datasets are rejected (parity: ``:69-81``).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...nn.base_architectures import BaseJointEncoder
from ...nn.default_architectures import BaseAEConfig, MultipleHeadJointEncoder
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE
from .joint_model_config import BaseJointModelConfig


class BaseJointModel(BaseMultiVAE):
    """Base class for models using a joint encoder."""

    model_name = "BaseJointModel"

    def __init__(self, model_config: BaseJointModelConfig,
                 encoders: dict = None, decoders: dict = None,
                 joint_encoder=None, seed: int = 0, **kwargs):
        super().__init__(model_config, encoders, decoders, seed=seed)

        if joint_encoder is None:
            joint_encoder = self.default_joint_encoder(model_config)
        else:
            self.model_config.custom_architectures.append("joint_encoder")
        self.set_joint_encoder(joint_encoder)

    def default_joint_encoder(self, model_config):
        return MultipleHeadJointEncoder(
            dict_encoders=self.encoders,
            args=BaseAEConfig(latent_dim=model_config.latent_dim),
        )

    def set_joint_encoder(self, joint_encoder):
        import flax.linen as nn

        if not isinstance(joint_encoder, nn.Module):
            raise AttributeError(
                "The joint encoder must be a flax.linen.Module implementing "
                "the BaseJointEncoder contract (dict of modalities -> "
                "ModelOutput(embedding, log_covariance))."
            )
        self.joint_encoder = joint_encoder

    def _init_extra_modules(self, rng) -> dict:
        dummy = {m: self._dummy_input(m) for m in self.encoders}
        return {
            "joint_encoder": self.joint_encoder.init(rng, dummy)["params"]
        }

    def apply_joint_encoder(self, params, data: dict) -> ModelOutput:
        return self.joint_encoder.apply(
            {"params": params["joint_encoder"]}, data
        )

    def _reject_incomplete(self, inputs):
        incomplete = (
            inputs.incomplete if isinstance(inputs, MultimodalBatch)
            else getattr(inputs, "masks", None) is not None
        )
        if incomplete:
            raise AttributeError(
                "The inputs have masks but this model is not compatible with "
                "incomplete datasets."
            )

    def encode(self, inputs, cond_mod="all", N: int = 1,
               return_mean: bool = False, **kwargs):
        self._reject_incomplete(inputs)
        return super().encode(inputs, cond_mod, N, return_mean=return_mean,
                              **kwargs)

    def forward(self, inputs, epoch: int = 1, rng=None, **kwargs):
        self._reject_incomplete(inputs)
        return super().forward(inputs, epoch=epoch, rng=rng, **kwargs)

    def compute_joint_nll(self, inputs, K: int = 1000,
                          batch_size_K: int = 100, rng=None):
        """Shared IWAE joint NLL from the joint-encoder posterior.

        Reference: ``joint_model.py:82-154``.
        """
        batch = as_batch(inputs)
        self._reject_incomplete(inputs)
        params = self._ensure_params()
        if rng is None:
            rng = self.next_rng()
        fn = self._jit(
            ("joint_nll", K, batch_size_K),
            partial(self._joint_nll, K=K, batch_size_K=batch_size_K),
        )
        return fn(params, batch, rng)

    def _joint_nll(self, params, batch, rng, *, K, batch_size_K):
        out = self.apply_joint_encoder(params, batch.data)
        return self._gaussian_iwae_joint_nll(
            params, batch, out["embedding"], out["log_covariance"], rng, K,
            batch_size_K,
        )
