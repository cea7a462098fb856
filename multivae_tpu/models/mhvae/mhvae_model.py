"""MHVAE: hierarchical (L-level) multimodal VAE, TPU-native.

Behavior parity with reference ``src/multivae/models/mhvae/mhvae_model.py``:
per-modality bottom-up blocks with skip connections; shared top-down blocks;
PoE (including a prior expert) at every level; the loss is averaged over all
non-empty modality subsets (``mhvae_model.py:241-262``). The user must
supply every block architecture (flax modules).

Layout note: skip connections are concatenated with the top-down hidden
state on the LAST axis (channels-last, the native JAX/flax convolution
layout) — the reference concatenates on torch's channel axis 1.
"""

from __future__ import annotations

from typing import List, Union

import jax
import jax.numpy as jnp

from ...data.batch import MultimodalBatch, as_batch
from ...ops.gaussian import kl_divergence, masked_poe, rsample_from_gaussian


def _sum_trailing(x):
    """Sum all non-batch dims: intermediate latents may be conv feature
    maps (reference mhvae example uses 1x1-conv prior/posterior blocks over
    (C, H, W) latents, ``examples/mhvae/architectures_mmnist.py``)."""
    return x.reshape(x.shape[0], -1).sum(-1, dtype=jnp.float32)
from ...ops.subsets import all_subsets
from ...utils.host_init import init_on_host
from ...utils.model_output import ModelOutput
from ..base.base_ae_model import BaseMultiVAE, sum_except_batch
from ..base.step import StepInfo
from .mhvae_config import MHVAEConfig


def _embedding_of(out):
    if isinstance(out, dict):
        return out["embedding"]
    return out


class MHVAE(BaseMultiVAE):
    """Multimodal Hierarchical VAE. All block architectures are required."""

    model_name = "MHVAE"
    supports_per_sample_conditioning = True

    def __init__(self, model_config: MHVAEConfig, encoders: dict,
                 decoders: dict, bottom_up_blocks: dict,
                 top_down_blocks: list,
                 posterior_blocks: Union[list, dict],
                 prior_blocks: list, seed: int = 0):
        super().__init__(model_config, encoders, decoders, seed=seed)
        self.n_latent = model_config.n_latent
        self.beta = model_config.beta

        self.sanity_check_bottom_up(encoders, bottom_up_blocks)
        self.bottom_up_blocks = {m: list(v)
                                 for m, v in bottom_up_blocks.items()}
        self.sanity_check_top_down_blocks(top_down_blocks)
        self.top_down_blocks = list(top_down_blocks)
        self.sanity_check_prior_blocks(prior_blocks)
        self.prior_blocks = list(prior_blocks)
        self.check_and_set_posterior_blocks(posterior_blocks)

        self.model_config.custom_architectures.extend(
            ["bottom_up_blocks", "top_down_blocks", "prior_blocks",
             "posterior_blocks"]
        )
        self.subsets = all_subsets(list(self.encoders.keys()))
        # params are initialized lazily (shapes depend on user blocks and
        # real inputs); call init_params_with_batch or forward once.
        self._initialized = False

    # ------------------------------------------------------------ san checks
    def sanity_check_bottom_up(self, encoders, bottom_up_blocks):
        if self.n_modalities != len(bottom_up_blocks.keys()):
            raise AttributeError(
                f"The provided number of bottom_up_blocks "
                f"{len(bottom_up_blocks.keys())} doesn't match the number of "
                f"modalities ({self.n_modalities}) in model config"
            )
        if encoders.keys() != bottom_up_blocks.keys():
            raise AttributeError(
                "The names of the modalities in the encoders dict don't "
                "match the names in the bottom_up_blocks dict."
            )
        for mod in bottom_up_blocks:
            if len(bottom_up_blocks[mod]) != self.model_config.n_latent - 1:
                raise AttributeError(
                    f"There must be {self.model_config.n_latent - 1} "
                    f"bottom_up_blocks for modality {mod} but you provided "
                    f"{len(bottom_up_blocks[mod])} layers."
                )

    def sanity_check_top_down_blocks(self, top_down_blocks):
        if len(top_down_blocks) != self.model_config.n_latent - 1:
            raise AttributeError(
                f"There must be {self.model_config.n_latent - 1} modules in "
                "top_down_blocks."
            )

    def sanity_check_prior_blocks(self, prior_blocks):
        if len(prior_blocks) != self.model_config.n_latent - 1:
            raise AttributeError(
                f"There must be {self.model_config.n_latent - 1} modules in "
                "prior."
            )

    def check_and_set_posterior_blocks(self, posterior_blocks):
        if isinstance(posterior_blocks, list):
            self.share_posterior_weights = True
            if len(posterior_blocks) != self.model_config.n_latent - 1:
                raise AttributeError(
                    f"There must be {self.model_config.n_latent - 1} modules "
                    "in posterior_blocks."
                )
            self.posterior_blocks = list(posterior_blocks)
            return
        if isinstance(posterior_blocks, dict):
            self.share_posterior_weights = False
            if posterior_blocks.keys() != self.encoders.keys():
                raise AttributeError(
                    "The keys of posterior_blocks must match the keys of "
                    "encoders."
                )
            for m, p in posterior_blocks.items():
                if len(p) != self.model_config.n_latent - 1:
                    raise AttributeError(
                        f"There must be {self.model_config.n_latent - 1} "
                        f"modules in posterior_blocks[{m}]."
                    )
            self.posterior_blocks = {m: list(v)
                                     for m, v in posterior_blocks.items()}
            return
        raise AttributeError("posterior_blocks must be a list or a dict")

    # ------------------------------------------------------- initialization
    def init_params(self, rng=None):
        """MHVAE params require a real batch; defer (see
        ``init_params_with_batch``)."""
        return None

    @init_on_host
    def init_params_with_batch(self, batch: MultimodalBatch, rng=None):
        if rng is None:
            rng = self.next_rng()
        keys = iter(jax.random.split(rng, 1024))
        params = {"encoders": {}, "decoders": {}, "bottom_up": {},
                  "top_down": {}, "prior": {}, "posterior": {}}

        # trace the bottom-up pass to get intermediate shapes
        skips = {}
        z_l_params = {}
        for m in self.encoders:
            x = batch.data[m]
            params["encoders"][m] = self.encoders[m].init(next(keys), x)[
                "params"]
            out = self.encoders[m].apply(
                {"params": params["encoders"][m]}, x
            )
            z = _embedding_of(out)
            mod_skips = [z]
            params["bottom_up"][m] = {}
            for i in range(self.n_latent - 2):
                block = self.bottom_up_blocks[m][i]
                params["bottom_up"][m][str(i)] = block.init(next(keys), z)[
                    "params"]
                z = _embedding_of(block.apply(
                    {"params": params["bottom_up"][m][str(i)]}, z
                ))
                mod_skips.append(z)
            last = self.bottom_up_blocks[m][-1]
            params["bottom_up"][m][str(self.n_latent - 2)] = last.init(
                next(keys), z
            )["params"]
            out = last.apply(
                {"params": params["bottom_up"][m][str(self.n_latent - 2)]}, z
            )
            z_l_params[m] = out
            skips[m] = mod_skips

        # top-down chain shapes
        z = z_l_params[list(self.encoders.keys())[0]]["embedding"]
        for i in range(self.n_latent - 1, 0, -1):
            td = self.top_down_blocks[i - 1]
            params["top_down"][str(i - 1)] = td.init(next(keys), z)["params"]
            h = _embedding_of(td.apply(
                {"params": params["top_down"][str(i - 1)]}, z
            ))
            pr = self.prior_blocks[i - 1]
            params["prior"][str(i - 1)] = pr.init(next(keys), h)["params"]
            prior_out = pr.apply({"params": params["prior"][str(i - 1)]}, h)

            if self.share_posterior_weights:
                d = skips[list(self.encoders.keys())[0]][i - 1]
                concat = jnp.concatenate([h, d], axis=-1)
                po = self.posterior_blocks[i - 1]
                params["posterior"][str(i - 1)] = po.init(next(keys), concat)[
                    "params"]
            else:
                params["posterior"][str(i - 1)] = {}
                for m in self.encoders:
                    d = skips[m][i - 1]
                    concat = jnp.concatenate([h, d], axis=-1)
                    po = self.posterior_blocks[m][i - 1]
                    params["posterior"][str(i - 1)][m] = po.init(
                        next(keys), concat
                    )["params"]
            z = prior_out["embedding"]

        for m in self.decoders:
            z1 = z  # level-1 latent
            params["decoders"][m] = self.decoders[m].init(next(keys), z1)[
                "params"]
        self.params = params
        self._initialized = True
        return params

    def _ensure_params(self):
        if self.params is None:
            raise RuntimeError(
                "MHVAE parameters are not initialized. Call "
                "init_params_with_batch(batch) (or forward) with a real "
                "batch first."
            )
        return self.params

    # ------------------------------------------------------------ pure apply
    def _apply_bottom_up(self, params, mod, i, z):
        return self.bottom_up_blocks[mod][i].apply(
            {"params": params["bottom_up"][mod][str(i)]}, z
        )

    def _apply_top_down(self, params, i, z):
        return _embedding_of(self.top_down_blocks[i].apply(
            {"params": params["top_down"][str(i)]}, z
        ))

    def _apply_prior(self, params, i, h):
        return self.prior_blocks[i].apply(
            {"params": params["prior"][str(i)]}, h
        )

    def _apply_posterior(self, params, mod, i, concat):
        if self.share_posterior_weights:
            return self.posterior_blocks[i].apply(
                {"params": params["posterior"][str(i)]}, concat
            )
        return self.posterior_blocks[mod][i].apply(
            {"params": params["posterior"][str(i)][mod]}, concat
        )

    def modality_encode(self, params, data: dict):
        """Bottom-up passes with skip collection
        (reference ``mhvae_model.py:313-344``)."""
        skips = {}
        z_l_params = {}
        for m in data:
            out = self.encoders[m].apply(
                {"params": params["encoders"][m]}, data[m]
            )
            z = _embedding_of(out)
            mod_skips = [z]
            for i in range(self.n_latent - 2):
                z = _embedding_of(self._apply_bottom_up(params, m, i, z))
                mod_skips.append(z)
            z_l_params[m] = self._apply_bottom_up(
                params, m, self.n_latent - 2, z
            )
            skips[m] = mod_skips
        return z_l_params, skips

    def subset_encode(self, params, z_l_params, skips, subset, batch, rng,
                      return_mean: bool = False, subset_vec=None):
        """Top-down sampling with per-level PoE over the subset's experts +
        the prior expert (reference ``subset_encode`` ``:103-194``).

        With ``subset_vec`` (a traced (len(subset),) indicator), experts are
        additionally zeroed by the indicator — used by ``_encode_masked`` to
        serve every conditioning subset from one compiled program."""
        subset = list(subset)
        mus = jnp.stack([z_l_params[m]["embedding"] for m in subset])
        lvs = jnp.stack([z_l_params[m]["log_covariance"] for m in subset])
        mask = jnp.stack([batch.masks[m] for m in subset])
        if subset_vec is not None:
            mask = mask * subset_vec[:, None]
        # PoE with standard-normal prior expert
        B = mus.shape[1]
        mus = jnp.concatenate([mus, jnp.zeros_like(mus[:1])], axis=0)
        lvs = jnp.concatenate([lvs, jnp.zeros_like(lvs[:1])], axis=0)
        mask = jnp.concatenate([mask, jnp.ones((1, B))], axis=0)
        joint_mu, joint_lv = masked_poe(mus, lvs, mask)

        rng, z_rng = jax.random.split(rng)
        z_deepest = rsample_from_gaussian(z_rng, joint_mu, joint_lv,
                                          return_mean=return_mean)
        kl_deepest = (_sum_trailing(kl_divergence(
            joint_mu, joint_lv, jnp.zeros_like(joint_mu),
            jnp.zeros_like(joint_lv),
        )) * batch.weights).sum()

        z_dict = {f"z_{self.n_latent}": z_deepest}
        kl_dict = {f"kl_{self.n_latent}": kl_deepest}

        for i in range(self.n_latent - 1, 0, -1):
            h = self._apply_top_down(params, i - 1, z_dict[f"z_{i + 1}"])
            prior_out = self._apply_prior(params, i - 1, h)

            sub_mus, sub_lvs, sub_mask = [], [], []
            for j, m in enumerate(subset):
                d = skips[m][i - 1]
                concat = jnp.concatenate([h, d], axis=-1)
                post = self._apply_posterior(params, m, i - 1, concat)
                sub_mus.append(post["embedding"])
                sub_lvs.append(post["log_covariance"])
                m_mask = batch.masks[m]
                if subset_vec is not None:
                    m_mask = m_mask * subset_vec[j]
                sub_mask.append(m_mask)
            sub_mus.append(prior_out["embedding"])
            sub_lvs.append(prior_out["log_covariance"])
            sub_mask.append(jnp.ones((B,)))

            level_mu, level_lv = masked_poe(
                jnp.stack(sub_mus), jnp.stack(sub_lvs), jnp.stack(sub_mask)
            )
            rng, z_rng = jax.random.split(rng)
            z_dict[f"z_{i}"] = rsample_from_gaussian(
                z_rng, level_mu, level_lv, return_mean=return_mean
            )
            kl_dict[f"kl_{i}"] = (_sum_trailing(kl_divergence(
                level_mu, level_lv, prior_out["embedding"],
                prior_out["log_covariance"],
            )) * batch.weights).sum()

        return z_dict, kl_dict

    # ----------------------------------------------------------------- loss
    def _loss_subset(self, params, batch, z_l_params, skips, subset, rng):
        """Reference ``_loss_subset`` (``mhvae_model.py:197-239``)."""
        z_dict, kl_dict = self.subset_encode(
            params, z_l_params, skips, subset, batch, rng
        )
        recon_loss = 0.0
        for mod in self.decoders:
            recon = self.decode_mod(params, mod, z_dict["z_1"])
            mod_loss = sum_except_batch(
                -self.recon_log_probs[mod](recon, batch.data[mod])
                * self.rescale_factors[mod]
            )
            mod_loss = mod_loss * batch.masks[mod] * batch.weights
            recon_loss = recon_loss + mod_loss.sum()
        kl = sum(kl_dict[f"kl_{i}"] for i in range(1, self.n_latent + 1))
        return recon_loss + self.beta * kl, kl_dict

    def loss_function(self, params, batch: MultimodalBatch, rng,
                      step: StepInfo) -> ModelOutput:
        """Average the negative ELBO over all non-empty subsets
        (reference ``forward`` ``:241-262``)."""
        rng, e_rng = jax.random.split(rng)
        z_l_params, skips = self.modality_encode(params, batch.data)
        losses = []
        kl_dict = {}
        sub_rngs = jax.random.split(rng, len(self.subsets))
        for i, subset in enumerate(self.subsets):
            loss, kl_dict = self._loss_subset(
                params, batch, z_l_params, skips, subset, sub_rngs[i]
            )
            losses.append(loss)
        loss = jnp.stack(losses).mean()
        return ModelOutput(loss=loss, loss_sum=loss, metrics=kl_dict)

    def forward(self, inputs, epoch: int = 1, rng=None, **kwargs):
        batch = as_batch(inputs)
        if self.params is None:
            self.init_params_with_batch(batch)
        return super().forward(batch, epoch=epoch, rng=rng, **kwargs)

    # --------------------------------------------------------------- encode
    def encode(self, inputs, cond_mod="all", N: int = 1,
               return_mean: bool = False, flatten: bool = False, rng=None,
               ignore_incomplete: bool = False, **kwargs):
        batch = as_batch(inputs)
        if self.params is None:
            self.init_params_with_batch(batch)
        return super().encode(batch, cond_mod, N, return_mean=return_mean,
                              flatten=flatten, rng=rng,
                              ignore_incomplete=ignore_incomplete, **kwargs)

    def _encode_subset(self, params, batch: MultimodalBatch, rng, *,
                       cond_mod: tuple, N: int, return_mean: bool,
                       flatten: bool, subset_vec=None) -> dict:
        """Reference ``encode`` (``mhvae_model.py:264-311``): replicate
        per-modality posteriors N times, then run the top-down chain.
        ``subset_vec`` threads the traced indicator of ``_encode_masked``
        down to every level's PoE."""
        z_l_params, skips = self.modality_encode(params, batch.data)
        n_data = batch.n_samples
        if N > 1:
            z_l_params = {
                m: ModelOutput(
                    embedding=jnp.concatenate([v["embedding"]] * N, axis=0),
                    log_covariance=jnp.concatenate(
                        [v["log_covariance"]] * N, axis=0),
                ) for m, v in z_l_params.items()
            }
            skips = {m: [jnp.concatenate([t] * N, axis=0) for t in v]
                     for m, v in skips.items()}
            batch = MultimodalBatch(
                data=batch.data,
                masks={m: jnp.concatenate([v] * N)
                       for m, v in batch.masks.items()},
                weights=jnp.concatenate([batch.weights] * N),
                labels=None, incomplete=batch.incomplete,
            )
        z_dict, _ = self.subset_encode(
            params, z_l_params, skips, cond_mod, batch, rng,
            return_mean=return_mean, subset_vec=subset_vec,
        )
        out = {}
        z = z_dict["z_1"]
        if not flatten and N > 1:
            z = z.reshape(N, n_data, *z.shape[1:])
            z_dict = {k: v.reshape(N, n_data, *v.shape[1:])
                      for k, v in z_dict.items()}
        out["z"] = z
        out["all_z"] = z_dict
        return out

    def _encode_masked(self, params, batch: MultimodalBatch, rng, subset, *,
                       N: int, return_mean: bool, flatten: bool) -> dict:
        """Subset as a traced (M,) indicator: every level's PoE zeroes the
        excluded experts' precisions, so ONE compiled program serves all
        conditioning subsets (see ``BaseMultiVAE._encode_masked``)."""
        return self._encode_subset(
            params, batch, rng, cond_mod=tuple(self.encoders), N=N,
            return_mean=return_mean, flatten=flatten, subset_vec=subset,
        )
