"""Base-model error/validation contracts, mirroring the reference's
``tests/test_basemodel.py`` raise semantics (VERDICT r1 item 4/8: close the
error-path coverage gap vs the reference's test suite)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.models import AutoConfig, AutoModel, MVTCAE, MVTCAEConfig
from multivae_tpu.models.base import BaseMultiVAE, BaseMultiVAEConfig
from multivae_tpu.nn.default_architectures import (
    BaseAEConfig,
    BaseDictDecoders,
    BaseDictEncoders,
    Decoder_AE_MLP,
    Encoder_VAE_MLP,
)
from multivae_tpu.utils.model_output import ModelOutput

DIMS = {"mod1": (2,), "mod2": (3, 4, 4)}


class _ConcreteVAE(MVTCAE):
    """BaseMultiVAE is abstract (loss_function); use MVTCAE to exercise the
    shared constructor validation (reference instantiates BaseMultiVAE
    directly; the contracts are the same, ``base_ae_model.py:55-152``)."""


def _nets(dims=DIMS, latent=4):
    return (BaseDictEncoders(dims, latent), BaseDictDecoders(dims, latent))


# ------------------------------------------------------------ raise contracts
def test_raise_missing_input_dim():
    """No (or incomplete) input_dims without architectures -> AttributeError
    (reference ``test_basemodel.py:120-169``)."""
    with pytest.raises(AttributeError):
        _ConcreteVAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                                  input_dims={"mod2": (3, 4, 4)}))
    with pytest.raises(AttributeError):
        _ConcreteVAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                                  input_dims=None))
    enc, _ = _nets()
    with pytest.raises(AttributeError):
        _ConcreteVAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                                  input_dims=None), encoders=enc)


def test_raise_rescaling_needs_input_dims():
    """uses_likelihood_rescaling needs input_dims even with custom nets."""
    enc, dec = _nets()
    with pytest.raises(AttributeError):
        _ConcreteVAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4, input_dims=None,
            uses_likelihood_rescaling=True), encoders=enc, decoders=dec)


def test_raises_wrong_encoder_types():
    """Encoders/decoders must be BaseEncoder/BaseDecoder instances
    (reference ``test_basemodel.py:171-186``)."""
    _, dec = _nets()
    bad = {"mod1": ModelOutput(), "mod2": ModelOutput()}
    with pytest.raises(AttributeError):
        _ConcreteVAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                                  input_dims=DIMS),
                     encoders=bad, decoders=dec)
    enc, _ = _nets()
    with pytest.raises(AttributeError):
        _ConcreteVAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                                  input_dims=DIMS),
                     encoders=enc, decoders=bad)


def test_raises_key_error_on_name_mismatch():
    """Architectures' modality names must match input_dims
    (reference ``test_basemodel.py:188-203``)."""
    cfg = BaseAEConfig(input_dim=(10, 2), latent_dim=4)
    encoders = {"mod1": Encoder_VAE_MLP(cfg)}
    decoders = {"mod1": Decoder_AE_MLP(cfg)}
    with pytest.raises(KeyError):
        _ConcreteVAE(MVTCAEConfig(n_modalities=1, latent_dim=4,
                                  input_dims={"wrong_name": (3, 4, 4)}),
                     encoders=encoders, decoders=decoders)


def test_raises_n_modalities_mismatch():
    enc, dec = _nets()
    with pytest.raises(AttributeError):
        _ConcreteVAE(MVTCAEConfig(n_modalities=3, latent_dim=4,
                                  input_dims=DIMS),
                     encoders=enc, decoders=dec)


def test_raises_encode_error():
    """Unknown cond_mod -> AttributeError
    (reference ``test_basemodel.py:274-288``)."""
    model = _ConcreteVAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                                      input_dims=DIMS))
    rng = np.random.default_rng(0)
    data = {m: rng.normal(size=(4, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    from multivae_tpu.data import MultimodalBaseDataset

    ds = MultimodalBaseDataset(data)
    with pytest.raises(AttributeError):
        model.encode(ds[:], cond_mod="wrong_mod")
    with pytest.raises(AttributeError):
        model.encode(ds[:], cond_mod=["mod1", "wrong_mod"])


def test_decode_one_and_several_latents():
    """decode accepts (B, D) and (N, B, D) latents
    (reference ``test_basemodel.py:290-346``)."""
    model = _ConcreteVAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                                      input_dims=DIMS))
    z = ModelOutput(z=jnp.zeros((5, 4)), one_latent_space=True)
    out = model.decode(z, modalities="mod1")
    assert out["mod1"].shape == (5, *DIMS["mod1"])
    z = ModelOutput(z=jnp.zeros((3, 5, 4)), one_latent_space=True)
    out = model.decode(z)
    for m, d in DIMS.items():
        assert out[m].shape == (3, 5, *d)


def test_generate_from_prior_shapes():
    model = _ConcreteVAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                                      input_dims=DIMS))
    out = model.generate_from_prior(1)
    assert out.z.shape == (4,)  # squeezed for n=1, like the reference
    out = model.generate_from_prior(7)
    assert out.z.shape == (7, 4)


def test_automodel_raises_not_handled(tmp_path):
    """AutoConfig/AutoModel raise NameError on unknown model names
    (reference ``test_basemodel.py:409-439``)."""
    import json
    import os

    d = tmp_path / "fake_model"
    os.makedirs(d)
    with open(d / "model_config.json", "w") as f:
        json.dump({"name": "NotAModelConfig"}, f)
    with pytest.raises(NameError):
        AutoConfig.from_json_file(str(d / "model_config.json"))
    with pytest.raises(NameError):
        AutoModel.load_from_folder(str(d))


def test_categorical_decoder_dist_matches_torch():
    """The 'categorical' recon log-prob (cross_entropy over one-hot/tokens)
    matches torch's Categorical log_prob summed over the class axis
    (reference ``base_utils.py:28-59``, ``test_basemodel.py:205-272``)."""
    import torch

    from multivae_tpu.ops import set_decoder_dist

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, 7)).astype(np.float32)
    tokens = rng.integers(0, 7, size=(2, 5))
    one_hot = np.eye(7, dtype=np.float32)[tokens]

    log_prob = set_decoder_dist("categorical", {})
    ours = np.asarray(log_prob(jnp.asarray(logits),
                               {"tokens": jnp.asarray(tokens)}))
    # per-class contributions sum to the categorical log-prob
    ours_summed = ours.sum(-1)
    want = torch.distributions.Categorical(
        logits=torch.tensor(logits)).log_prob(torch.tensor(tokens)).numpy()
    np.testing.assert_allclose(ours_summed, want, rtol=1e-5, atol=1e-5)
    # one-hot targets give the same values as integer tokens
    ours_oh = np.asarray(log_prob(jnp.asarray(logits),
                                  {"one_hot": jnp.asarray(one_hot)}))
    np.testing.assert_allclose(ours_oh, ours, rtol=1e-6)
