"""Training an MHVAE (mirrors the reference tutorial
``examples/tutorial_notebooks/training_a_MHVAE_model.ipynb``).

The MHVAE is an L-level hierarchical multimodal VAE: the user supplies
per-modality bottom-up blocks, shared top-down blocks, and the
posterior/prior heads (PoE with a prior expert happens at every level)::

    python examples/tutorials/training_a_mhvae_model.py
"""

import os
import sys

import flax.linen as nn
import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

# %% 1. The user supplies every block of the hierarchy.
from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MHVAE, MHVAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig
from multivae_tpu.utils.model_output import ModelOutput

LATENT, N_LATENT = 4, 3
DIMS = {"m0": (10,), "m1": (1, 6, 6)}


class InputEncoder(nn.Module):
    hidden: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden)(x.reshape(x.shape[0], -1)))
        return ModelOutput(embedding=h)


class BottomUp(nn.Module):
    hidden: int = 32

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Dense(self.hidden)(x))


class BottomUpLast(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(32)(x))
        return ModelOutput(embedding=nn.Dense(LATENT)(h),
                           log_covariance=nn.Dense(LATENT)(h))


class TopDown(nn.Module):
    hidden: int = 32

    @nn.compact
    def __call__(self, z):
        return nn.relu(nn.Dense(self.hidden)(z))


class LatentHead(nn.Module):
    @nn.compact
    def __call__(self, h):
        hh = nn.relu(nn.Dense(32)(h))
        return ModelOutput(embedding=nn.Dense(LATENT)(hh),
                           log_covariance=nn.Dense(LATENT)(hh))


class OutputDecoder(nn.Module):
    out_shape: tuple

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(32)(z))
        r = nn.Dense(int(np.prod(self.out_shape)))(h)
        return ModelOutput(
            reconstruction=r.reshape(r.shape[0], *self.out_shape))


# %% 2. Assemble the hierarchical model from the blocks.
model = MHVAE(
    MHVAEConfig(n_modalities=2, latent_dim=LATENT, input_dims=DIMS,
                n_latent=N_LATENT, beta=1.0),
    encoders={m: InputEncoder() for m in DIMS},
    decoders={m: OutputDecoder(out_shape=DIMS[m]) for m in DIMS},
    bottom_up_blocks={m: [BottomUp() for _ in range(N_LATENT - 2)]
                      + [BottomUpLast()] for m in DIMS},
    top_down_blocks=[TopDown() for _ in range(N_LATENT - 1)],
    posterior_blocks=[LatentHead() for _ in range(N_LATENT - 1)],
    prior_blocks=[LatentHead() for _ in range(N_LATENT - 1)],
)

rng = np.random.default_rng(0)
train_data = MultimodalBaseDataset({
    "m0": rng.normal(size=(128, 10)).astype(np.float32),
    "m1": rng.uniform(size=(128, 1, 6, 6)).astype(np.float32),
})

# %% 3. Train and cross-generate.
trainer = BaseTrainer(model, train_data, training_config=BaseTrainerConfig(
    output_dir="./tutorial_out_mhvae", num_epochs=2,
    per_device_train_batch_size=32, learning_rate=1e-3,
))
trainer.train()

pred = model.predict(train_data[:4], cond_mod="m0", gen_mod="m1")
print("m1 from m0:", pred.m1.shape)
