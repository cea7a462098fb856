"""Tiny MLP block architectures for testing MHVAE (analogous to reference
tests/mhvae_test_architectures.py, but idiomatic flax)."""

import flax.linen as nn
import jax.numpy as jnp

from multivae_tpu.utils.model_output import ModelOutput


class InputEncoder(nn.Module):
    """First-layer encoder: x -> hidden feature (embedding only)."""

    hidden: int = 16

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden)(x.reshape(x.shape[0], -1)))
        return ModelOutput(embedding=h)


class BottomUpMid(nn.Module):
    """Intermediate bottom-up block: feature -> feature."""

    hidden: int = 16

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Dense(self.hidden)(x))


class BottomUpLast(nn.Module):
    """Deepest bottom-up block: feature -> (mu, log_var)."""

    latent_dim: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(16)(x))
        return ModelOutput(
            embedding=nn.Dense(self.latent_dim)(h),
            log_covariance=nn.Dense(self.latent_dim)(h),
        )


class TopDown(nn.Module):
    """Top-down block: z_{l+1} -> hidden h."""

    hidden: int = 16

    @nn.compact
    def __call__(self, z):
        return nn.relu(nn.Dense(self.hidden)(z))


class LatentHead(nn.Module):
    """Prior / posterior block: features -> (mu, log_var)."""

    latent_dim: int = 4

    @nn.compact
    def __call__(self, h):
        hh = nn.relu(nn.Dense(16)(h))
        return ModelOutput(
            embedding=nn.Dense(self.latent_dim)(hh),
            log_covariance=nn.Dense(self.latent_dim)(hh),
        )


class OutputDecoder(nn.Module):
    """Last decoder: z_1 -> reconstruction of the modality."""

    out_dim: int = 2

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(16)(z))
        return ModelOutput(reconstruction=nn.Dense(self.out_dim)(h))


def build_mhvae_blocks(dims: dict, n_latent: int = 3, latent_dim: int = 4,
                       shared_posteriors: bool = True):
    """All block groups for an MHVAE over the given modality dims."""
    import numpy as np

    encoders = {m: InputEncoder() for m in dims}
    decoders = {m: OutputDecoder(out_dim=int(np.prod(dims[m])))
                for m in dims}
    bottom_up = {
        m: [BottomUpMid() for _ in range(n_latent - 2)]
        + [BottomUpLast(latent_dim=latent_dim)]
        for m in dims
    }
    top_down = [TopDown() for _ in range(n_latent - 1)]
    prior = [LatentHead(latent_dim=latent_dim) for _ in range(n_latent - 1)]
    if shared_posteriors:
        posterior = [LatentHead(latent_dim=latent_dim)
                     for _ in range(n_latent - 1)]
    else:
        posterior = {m: [LatentHead(latent_dim=latent_dim)
                         for _ in range(n_latent - 1)] for m in dims}
    return encoders, decoders, bottom_up, top_down, posterior, prior
