"""Train a 3-level MHVAE on PolyMNIST with convolutional latents
(reference ``examples/mhvae/training_mmnist.py`` +
``architectures_mmnist.py``): z_1 and z_2 are conv feature maps with
1x1-conv prior/posterior heads; z_3 is a vector latent::

    python examples/mhvae_polymnist.py --seed 0
"""

import argparse
import os
import sys

import flax.linen as nn
import jax.numpy as jnp

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data.datasets import MMNISTDataset
from multivae_tpu.models import MHVAE, MHVAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig
from multivae_tpu.utils.model_output import ModelOutput

DATA_PATH = os.environ.get("MULTIVAE_DATA_PATH", ".data")
SAVE_PATH = os.environ.get("MULTIVAE_SAVE_PATH", "experiments")

parser = argparse.ArgumentParser()
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--num_epochs", type=int, default=200)
args = parser.parse_args()

LATENT = 64  # deepest (vector) latent


class InputEncoder(nn.Module):
    """images (NCHW) -> 14x14x32 feature map (skip for level 1)."""

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1))
        h = nn.silu(nn.Conv(32, (3, 3))(x))
        h = nn.silu(nn.Conv(32, (3, 3), strides=2)(h))      # (B,14,14,32)
        return ModelOutput(embedding=h)


class BottomUpMid(nn.Module):
    """level-1 feature -> 7x7x64 feature (skip for level 2)."""

    @nn.compact
    def __call__(self, h):
        return nn.silu(nn.Conv(64, (3, 3), strides=2)(h))   # (B,7,7,64)


class BottomUpLast(nn.Module):
    """level-2 feature -> deepest vector posterior params."""

    @nn.compact
    def __call__(self, h):
        h = nn.silu(nn.Conv(128, (3, 3), strides=2)(h))     # (B,4,4,128)
        h = nn.silu(nn.Dense(512)(h.reshape(h.shape[0], -1)))
        return ModelOutput(embedding=nn.Dense(LATENT)(h),
                           log_covariance=nn.Dense(LATENT)(h))


class TopDown2(nn.Module):
    """z_3 vector -> 7x7x64 hidden for level 2."""

    @nn.compact
    def __call__(self, z):
        h = nn.silu(nn.Dense(512)(z))
        h = nn.silu(nn.Dense(7 * 7 * 64)(h))
        return h.reshape(z.shape[0], 7, 7, 64)


class TopDown1(nn.Module):
    """z_2 (7x7x64) -> 14x14x32 hidden for level 1."""

    @nn.compact
    def __call__(self, z):
        return nn.silu(nn.ConvTranspose(32, (3, 3), strides=(2, 2))(z))


class ConvHead(nn.Module):
    """1x1-conv (mu, log_var) head over a feature map."""

    channels: int

    @nn.compact
    def __call__(self, h):
        h = nn.silu(nn.Conv(self.channels, (3, 3))(h))
        return ModelOutput(
            embedding=nn.Conv(self.channels, (1, 1))(h),
            log_covariance=nn.Conv(self.channels, (1, 1))(h),
        )


class OutputDecoder(nn.Module):
    """z_1 (14x14x32) -> 28x28x3 image (NCHW out)."""

    @nn.compact
    def __call__(self, z):
        h = nn.silu(nn.ConvTranspose(32, (3, 3), strides=(2, 2))(z))
        r = nn.Conv(3, (3, 3))(h)
        return ModelOutput(reconstruction=jnp.transpose(r, (0, 3, 1, 2)))


modalities = [f"m{i}" for i in range(5)]
model = MHVAE(
    MHVAEConfig(
        n_modalities=5, latent_dim=LATENT,
        input_dims={m: (3, 28, 28) for m in modalities},
        n_latent=3, beta=1.0,
        decoders_dist={m: "laplace" for m in modalities},
        decoder_dist_params={m: {"scale": 0.75} for m in modalities},
    ),
    encoders={m: InputEncoder() for m in modalities},
    decoders={m: OutputDecoder() for m in modalities},
    bottom_up_blocks={m: [BottomUpMid(), BottomUpLast()]
                      for m in modalities},
    top_down_blocks=[TopDown1(), TopDown2()],
    posterior_blocks=[ConvHead(32), ConvHead(64)],
    prior_blocks=[ConvHead(32), ConvHead(64)],
)

train_data = MMNISTDataset(data_path=DATA_PATH, split="train")

trainer_config = BaseTrainerConfig(
    output_dir=os.path.join(SAVE_PATH, "mhvae_polymnist",
                            f"seed_{args.seed}"),
    per_device_train_batch_size=128,
    num_epochs=args.num_epochs,
    learning_rate=1e-3,
    optimizer_cls="Adam",
    # device-resident data pipeline (dataset fits HBM); falls back
    # to the host loader automatically when it doesn't
    cache_on_device=True,
    steps_per_execution=25,
    steps_predict=5,
    seed=args.seed,
)
BaseTrainer(model, train_data, training_config=trainer_config).train()
