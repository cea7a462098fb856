"""Tests for the K-sample MoE model family: MMVAE, MMVAE+, CMVAE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from model_test_utils import (
    DIMS,
    check_encode_shapes,
    check_forward_contract,
    check_predict_shapes,
    check_save_load,
    check_zero_grads_for_missing_modality,
    make_dataset,
)
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import (
    CMVAE,
    CMVAEConfig,
    MMVAE,
    MMVAEConfig,
    MMVAEPlus,
    MMVAEPlusConfig,
)
from multivae_tpu.models.base.step import StepInfo

LATENT = 5
STYLE = 3


def make_model(name, **kw):
    K = kw.pop("K", 3)
    if name == "mmvae":
        return MMVAE(MMVAEConfig(n_modalities=3, latent_dim=LATENT,
                                 input_dims=DIMS, K=K, **kw))
    if name == "mmvae_normal":
        return MMVAE(MMVAEConfig(n_modalities=3, latent_dim=LATENT,
                                 input_dims=DIMS, K=K,
                                 prior_and_posterior_dist="normal",
                                 loss="iwae_looser", **kw))
    if name == "mmvaeplus":
        return MMVAEPlus(MMVAEPlusConfig(
            n_modalities=3, latent_dim=LATENT, input_dims=DIMS, K=K,
            modalities_specific_dim=STYLE, **kw))
    if name == "cmvae":
        return CMVAE(CMVAEConfig(
            n_modalities=3, latent_dim=LATENT, input_dims=DIMS, K=K,
            modalities_specific_dim=STYLE, number_of_clusters=4, **kw))
    raise ValueError(name)


ALL = ["mmvae", "mmvae_normal", "mmvaeplus", "cmvae"]
CLASSES = {"mmvae": MMVAE, "mmvae_normal": MMVAE, "mmvaeplus": MMVAEPlus,
           "cmvae": CMVAE}


@pytest.mark.parametrize("name", ALL)
@pytest.mark.parametrize("kind", ["complete", "incomplete"])
def test_forward(name, kind):
    model = make_model(name)
    check_forward_contract(model, make_dataset(kind))


@pytest.mark.parametrize("name", ALL)
def test_zero_grads_for_missing_modality(name):
    check_zero_grads_for_missing_modality(make_model(name))


@pytest.mark.parametrize("name", ALL)
def test_encode_predict_shapes(name):
    model = make_model(name)
    ds = make_dataset("complete")
    check_encode_shapes(model, ds, LATENT)
    check_predict_shapes(model, ds)


@pytest.mark.parametrize("name", ["mmvae", "mmvaeplus", "cmvae"])
def test_joint_nll(name):
    model = make_model(name)
    ds = make_dataset("complete", n=4, seed=7)
    nll = model.compute_joint_nll(ds[:], K=12, batch_size_K=5)
    assert np.isfinite(float(nll))


def test_mmvae_joint_nll_paper_returns_batch_vector():
    model = make_model("mmvae")
    ds = make_dataset("complete", n=4, seed=7)
    nll = model.compute_joint_nll_paper(ds[:], K=12, batch_size_K=5)
    assert nll.shape == (4,)
    assert np.all(np.isfinite(np.asarray(nll)))


@pytest.mark.parametrize("name", ALL)
def test_save_load(name, tmp_path):
    check_save_load(make_model(name), CLASSES[name], tmp_path)


def test_mmvae_bad_dist_raises():
    import pydantic

    with pytest.raises((AttributeError, pydantic.ValidationError)):
        MMVAE(MMVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                          prior_and_posterior_dist="cauchy"))


def test_mmvaeplus_requires_specific_dim():
    with pytest.raises(AttributeError):
        MMVAEPlus(MMVAEPlusConfig(n_modalities=3, latent_dim=LATENT,
                                  input_dims=DIMS))


def test_learn_prior_gets_gradients():
    model = make_model("mmvae")
    assert "prior_log_var" in model.params["model"]
    batch = as_batch(make_dataset("complete")[:])

    def loss(params):
        return model.loss_function(params, batch, jax.random.key(0),
                                   StepInfo.create())["loss"]

    grads = jax.grad(loss)(model.params)
    assert float(jnp.abs(grads["model"]["prior_log_var"]).sum()) > 0


def test_dreg_differs_from_iwae_gradients():
    """DReG and IWAE losses share the forward value structure but produce
    different encoder gradients."""
    cfg = dict(n_modalities=3, latent_dim=LATENT, input_dims=DIMS, K=4)
    m_dreg = MMVAE(MMVAEConfig(loss="dreg_looser", **cfg), seed=3)
    m_iwae = MMVAE(MMVAEConfig(loss="iwae_looser", **cfg), seed=3)
    batch = as_batch(make_dataset("complete")[:])
    rng = jax.random.key(5)

    def gnorm(model):
        g = jax.grad(lambda p: model.loss_function(
            p, batch, rng, StepInfo.create())["loss"])(model.params)
        return float(sum(jnp.abs(x).sum()
                         for x in jax.tree_util.tree_leaves(
                             g["encoders"]["mod1"])))

    # same params (same seed) -> same forward samples; gradient paths differ
    l_dreg = float(m_dreg.loss_function(m_dreg.params, batch, rng,
                                        StepInfo.create())["loss"])
    l_iwae = float(m_iwae.loss_function(m_iwae.params, batch, rng,
                                        StepInfo.create())["loss"])
    assert np.isfinite(l_dreg) and np.isfinite(l_iwae)
    assert gnorm(m_dreg) != pytest.approx(gnorm(m_iwae), rel=1e-3)


def test_cmvae_predict_clusters():
    model = make_model("cmvae")
    ds = make_dataset("complete", n=8)
    out = model.predict_clusters(ds[:])
    assert out.clusters.shape == (8,)
    assert np.all(np.asarray(out.clusters) < 4)
    assert set(out.pc_zs.keys()) == set(DIMS.keys())


def test_cmvae_prune_clusters():
    model = make_model("cmvae")
    ds = make_dataset("complete", n=12)
    h_values = model.prune_clusters(ds, batch_size=6)
    assert len(h_values) == 5
    assert 2 <= model.n_clusters <= 4
    pc = np.asarray(model.params["model"]["pc_params"])
    assert np.sum(~np.isinf(pc)) >= model.n_clusters


def test_cmvae_generate_from_prior():
    model = make_model("cmvae")
    out = model.generate_from_prior(9)
    assert out.z.shape == (9, LATENT)
    assert not out.one_latent_space
    decoded = model.decode(out, "mod1")
    assert decoded.mod1.shape == (9, *DIMS["mod1"])


def test_mmvaeplus_generate_from_prior_full_code():
    model = make_model("mmvaeplus")
    out = model.generate_from_prior(6)
    assert out.z.shape == (6, LATENT + STYLE)
    decoded = model.decode(out, "mod2")
    assert decoded.mod2.shape == (6, *DIMS["mod2"])


@pytest.mark.parametrize("name", ["mmvae", "mmvaeplus", "cmvae"])
def test_two_epoch_training(name, tmp_path):
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    model = make_model(name)
    ds = make_dataset("complete", n=16)
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=2,
        per_device_train_batch_size=8, learning_rate=1e-3, n_devices=1,
    )
    BaseTrainer(model, ds, eval_dataset=ds, training_config=cfg).train()


@pytest.mark.parametrize("name", ALL)
def test_k_equals_one(name):
    """K=1 is the MMVAE+ paper training protocol (reference
    ``examples/mmvae_plus/mmnist.py`` uses K=1 for 150 epochs): the K-sample
    machinery must keep its sample axis when K == 1."""
    model = make_model(name, K=1)
    ds = make_dataset("complete")
    out = model.forward(ds[:])
    assert np.isfinite(float(out.loss))

    nll = model.compute_joint_nll(ds[:4], K=2, batch_size_K=1)
    assert np.isfinite(float(nll))
