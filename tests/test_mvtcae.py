"""MVTCAE behavior contracts, mirroring reference tests/test_mvtcae.py."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.data import IncompleteDataset, MultimodalBaseDataset
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.models.base.step import StepInfo


@pytest.fixture(params=["complete", "incomplete"])
def dataset(request):
    rng = np.random.default_rng(0)
    data = {
        "mod1": rng.normal(size=(6, 2)).astype(np.float32),
        "mod2": rng.normal(size=(6, 3)).astype(np.float32),
        "mod3": rng.normal(size=(6, 4)).astype(np.float32),
    }
    if request.param == "complete":
        return MultimodalBaseDataset(data, labels=np.arange(6) % 2)
    masks = {
        "mod1": np.array([True] * 3 + [False] * 3),
        "mod2": np.array([True] * 6),
        "mod3": np.array([True, False] * 3),
    }
    return IncompleteDataset(data, masks=masks, labels=np.arange(6) % 2)


@pytest.fixture
def model(dataset):
    config = MVTCAEConfig(
        n_modalities=3,
        latent_dim=5,
        input_dims={"mod1": (2,), "mod2": (3,), "mod3": (4,)},
        alpha=0.2,
        beta=1.5,
    )
    return MVTCAE(config, seed=0)


def test_forward_returns_finite_scalar_loss(model, dataset):
    out = model.forward(dataset[:])
    assert out.loss.shape == ()
    assert np.isfinite(float(out.loss))
    assert np.isfinite(float(out.loss_sum))
    assert isinstance(out.metrics, dict)
    assert "joint_divergence" in out.metrics


def test_loss_is_deterministic_given_rng(model, dataset):
    rng = jax.random.key(7)
    out1 = model.forward(dataset[:], rng=rng)
    out2 = model.forward(dataset[:], rng=rng)
    assert float(out1.loss) == float(out2.loss)


def test_gradients_zero_for_fully_missing_modality(model):
    """Reference test_mvtcae.py:160-173: if mod1 is missing for every sample
    of the batch, mod1's encoder must receive exactly zero gradient."""
    rng = np.random.default_rng(1)
    data = {
        "mod1": rng.normal(size=(4, 2)).astype(np.float32),
        "mod2": rng.normal(size=(4, 3)).astype(np.float32),
        "mod3": rng.normal(size=(4, 4)).astype(np.float32),
    }
    masks = {
        "mod1": np.zeros(4, bool),
        "mod2": np.ones(4, bool),
        "mod3": np.ones(4, bool),
    }
    ds = IncompleteDataset(data, masks)
    batch = as_batch(ds[:])

    def loss(params):
        return model.loss_function(
            params, batch, jax.random.key(0), StepInfo.create()
        ).loss

    grads = jax.grad(loss)(model.params)
    flat_mod1 = jax.tree_util.tree_leaves(grads["encoders"]["mod1"])
    for g in flat_mod1:
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    flat_mod2 = jax.tree_util.tree_leaves(grads["encoders"]["mod2"])
    assert sum(float(np.abs(np.asarray(g)).sum()) for g in flat_mod2) > 0


@pytest.mark.parametrize("cond_mod", ["all", "mod2", ["mod1", "mod3"]])
@pytest.mark.parametrize("N", [1, 4])
@pytest.mark.parametrize("flatten", [True, False])
@pytest.mark.parametrize("return_mean", [True, False])
def test_encode_shape_contract(model, cond_mod, N, flatten, return_mean):
    rng = np.random.default_rng(2)
    data = {
        "mod1": rng.normal(size=(6, 2)).astype(np.float32),
        "mod2": rng.normal(size=(6, 3)).astype(np.float32),
        "mod3": rng.normal(size=(6, 4)).astype(np.float32),
    }
    ds = MultimodalBaseDataset(data)
    out = model.encode(ds[:], cond_mod, N=N, flatten=flatten,
                       return_mean=return_mean)
    assert out.one_latent_space
    if N == 1:
        assert out.z.shape == (6, 5)
    elif flatten:
        assert out.z.shape == (24, 5)
    else:
        assert out.z.shape == (4, 6, 5)


@pytest.mark.parametrize("N", [1, 3])
@pytest.mark.parametrize("flatten", [True, False])
def test_predict_shape_contract(model, N, flatten):
    rng = np.random.default_rng(3)
    data = {
        "mod1": rng.normal(size=(6, 2)).astype(np.float32),
        "mod2": rng.normal(size=(6, 3)).astype(np.float32),
        "mod3": rng.normal(size=(6, 4)).astype(np.float32),
    }
    ds = MultimodalBaseDataset(data)
    out = model.predict(ds[:], cond_mod="mod1", gen_mod="all", N=N,
                        flatten=flatten)
    if N == 1:
        assert out.mod2.shape == (6, 3)
    elif flatten:
        assert out.mod3.shape == (18, 4)
    else:
        assert out.mod3.shape == (3, 6, 4)


def test_encode_incomplete_raises(model):
    rng = np.random.default_rng(4)
    data = {
        "mod1": rng.normal(size=(4, 2)).astype(np.float32),
        "mod2": rng.normal(size=(4, 3)).astype(np.float32),
        "mod3": rng.normal(size=(4, 4)).astype(np.float32),
    }
    masks = {
        "mod1": np.array([True, False, True, True]),
        "mod2": np.ones(4, bool),
        "mod3": np.ones(4, bool),
    }
    ds = IncompleteDataset(data, masks)
    with pytest.raises(AttributeError):
        model.encode(ds[:], cond_mod=["mod1", "mod2"])
    # but conditioning on fully-available mod2 works
    out = model.encode(ds[:], cond_mod="mod2")
    assert out.z.shape == (4, 5)


def test_compute_joint_nll_finite(model):
    rng = np.random.default_rng(5)
    data = {
        "mod1": rng.normal(size=(4, 2)).astype(np.float32),
        "mod2": rng.normal(size=(4, 3)).astype(np.float32),
        "mod3": rng.normal(size=(4, 4)).astype(np.float32),
    }
    ds = MultimodalBaseDataset(data)
    nll = model.compute_joint_nll(ds[:], K=30, batch_size_K=10)
    assert np.isfinite(float(nll))
    # K not divisible by chunk
    nll2 = model.compute_joint_nll(ds[:], K=25, batch_size_K=10)
    assert np.isfinite(float(nll2))


def test_generate_from_prior(model):
    out = model.generate_from_prior(11)
    assert out.z.shape == (11, 5)
    decoded = model.decode(out, "mod2")
    assert decoded.mod2.shape == (11, 3)


def test_save_and_load_roundtrip(model, tmp_path):
    d = str(tmp_path / "mvtcae")
    model.save(d)
    assert os.path.exists(os.path.join(d, "model_config.json"))
    assert os.path.exists(os.path.join(d, "model.msgpack"))

    loaded = MVTCAE.load_from_folder(d)
    assert loaded.model_config.alpha == model.model_config.alpha

    chex_equal = jax.tree_util.tree_all(
        jax.tree.map(
            lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
            model.params, loaded.params,
        )
    )
    assert chex_equal

    rng = np.random.default_rng(6)
    data = {
        "mod1": rng.normal(size=(2, 2)).astype(np.float32),
        "mod2": rng.normal(size=(2, 3)).astype(np.float32),
        "mod3": rng.normal(size=(2, 4)).astype(np.float32),
    }
    ds = MultimodalBaseDataset(data)
    key = jax.random.key(0)
    l1 = float(model.forward(ds[:], rng=key).loss)
    l2 = float(loaded.forward(ds[:], rng=key).loss)
    assert l1 == pytest.approx(l2, rel=1e-6)


def test_custom_architectures_roundtrip(tmp_path):
    from multivae_tpu.nn import BaseAEConfig, Decoder_AE_MLP, Encoder_VAE_MLP

    config = MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"m0": (2,), "m1": (3,)},
    )
    encoders = {
        m: Encoder_VAE_MLP(BaseAEConfig(input_dim=d, latent_dim=4), hidden_dim=32)
        for m, d in [("m0", (2,)), ("m1", (3,))]
    }
    decoders = {
        m: Decoder_AE_MLP(BaseAEConfig(input_dim=d, latent_dim=4), hidden_dim=32)
        for m, d in [("m0", (2,)), ("m1", (3,))]
    }
    model = MVTCAE(config, encoders=encoders, decoders=decoders)
    assert "encoders" in model.model_config.custom_architectures

    d = str(tmp_path / "custom")
    model.save(d)
    assert os.path.exists(os.path.join(d, "encoders.pkl"))
    loaded = MVTCAE.load_from_folder(d)
    assert loaded.encoders["m0"].hidden_dim == 32


def test_wrong_architecture_counts_raise():
    config = MVTCAEConfig(
        n_modalities=3, latent_dim=4,
        input_dims={"mod1": (2,), "mod2": (3,), "mod3": (4,)},
    )
    from multivae_tpu.nn import BaseAEConfig, Encoder_VAE_MLP

    bad_encoders = {
        "mod1": Encoder_VAE_MLP(BaseAEConfig(input_dim=(2,), latent_dim=4))
    }
    with pytest.raises(AttributeError):
        MVTCAE(config, encoders=bad_encoders)
