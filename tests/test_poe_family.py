"""Tests for the PoE/subset model family: MVAE, MoPoE, CRMVAE, DMVAE."""

import numpy as np
import pytest

import jax

from model_test_utils import (
    DIMS,
    check_encode_shapes,
    check_forward_contract,
    check_joint_nll,
    check_predict_shapes,
    check_save_load,
    check_zero_grads_for_missing_modality,
    make_dataset,
)
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import (
    CRMVAE,
    CRMVAEConfig,
    DMVAE,
    DMVAEConfig,
    MVAE,
    MVAEConfig,
    MoPoE,
    MoPoEConfig,
)
from multivae_tpu.models.base.step import StepInfo

LATENT = 5
STYLE_DIMS = {"mod1": 2, "mod2": 3, "mod3": 2}


def make_model(name, **kw):
    if name == "mvae":
        return MVAE(MVAEConfig(n_modalities=3, latent_dim=LATENT,
                               input_dims=DIMS, k=1, warmup=2, **kw))
    if name == "mopoe":
        return MoPoE(MoPoEConfig(n_modalities=3, latent_dim=LATENT,
                                 input_dims=DIMS, **kw))
    if name == "mopoe_multilatent":
        return MoPoE(MoPoEConfig(n_modalities=3, latent_dim=LATENT,
                                 input_dims=DIMS,
                                 modalities_specific_dim=STYLE_DIMS, **kw))
    if name == "crmvae":
        return CRMVAE(CRMVAEConfig(n_modalities=3, latent_dim=LATENT,
                                   input_dims=DIMS, **kw))
    if name == "dmvae":
        return DMVAE(DMVAEConfig(n_modalities=3, latent_dim=LATENT,
                                 input_dims=DIMS,
                                 modalities_specific_dim=STYLE_DIMS, **kw))
    raise ValueError(name)


ALL = ["mvae", "mopoe", "mopoe_multilatent", "crmvae", "dmvae"]
CLASSES = {"mvae": MVAE, "mopoe": MoPoE, "mopoe_multilatent": MoPoE,
           "crmvae": CRMVAE, "dmvae": DMVAE}


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


@pytest.mark.parametrize("name", ALL)
def test_joint_nll(name):
    check_joint_nll(make_model(name))


@pytest.mark.parametrize("name", ALL)
def test_save_load(name, tmp_path):
    model = make_model(name)
    check_save_load(model, CLASSES[name], tmp_path)


def test_mvae_beta_annealing():
    model = make_model("mvae")
    ds = make_dataset("complete")
    batch = as_batch(ds[:])
    rng = jax.random.key(0)
    out1 = model.loss_function(model.params, batch, rng,
                               StepInfo.create(epoch=1, batch_ratio=0.0))
    out2 = model.loss_function(model.params, batch, rng,
                               StepInfo.create(epoch=5, batch_ratio=0.0))
    assert float(out1.metrics["beta"]) == pytest.approx(0.0)
    assert float(out2.metrics["beta"]) == pytest.approx(1.0)


def test_mvae_eval_loss_has_no_random_subsets():
    model = make_model("mvae")
    ds = make_dataset("complete")
    batch = as_batch(ds[:])
    rng = jax.random.key(0)
    out_eval = model.eval_loss_function(model.params, batch, rng,
                                        StepInfo.create(epoch=5))
    assert "random_subset_0" not in out_eval.metrics
    out_train = model.loss_function(model.params, batch, rng,
                                    StepInfo.create(epoch=5))
    assert "random_subset_0" in out_train.metrics


def test_mopoe_custom_subsets():
    model = MoPoE(MoPoEConfig(
        n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
        subsets=[["mod1"], ["mod2", "mod3"]],
    ))
    assert set(model.subsets.keys()) == {"mod1", "mod2_mod3"}
    ds = make_dataset("complete")
    check_forward_contract(model, ds)
    out = model.encode(ds[:], ["mod2", "mod3"])
    assert out.z.shape == (6, LATENT)
    with pytest.raises(AttributeError):
        model.encode(ds[:], ["mod1", "mod2"])


def test_mopoe_unknown_subset_modality_raises():
    with pytest.raises(AttributeError):
        MoPoE(MoPoEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                          subsets=[["mod1"], ["bad_mod"]]))


def test_mopoe_joint_nll_paper():
    model = make_model("mopoe")
    ds = make_dataset("complete", n=4, seed=7)
    nll = model.compute_joint_nll_paper(ds[:], K=12, batch_size_K=5)
    assert np.isfinite(float(nll))


def test_dmvae_generate_from_prior_has_private_codes():
    model = make_model("dmvae")
    out = model.generate_from_prior(7)
    assert out.z.shape == (7, LATENT)
    assert out.modalities_z["mod2"].shape == (7, STYLE_DIMS["mod2"])
    decoded = model.decode(out, "all")
    assert decoded.mod1.shape == (7, *DIMS["mod1"])


def test_dmvae_wrong_private_betas_raise():
    with pytest.raises(AttributeError):
        DMVAE(DMVAEConfig(
            n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
            modalities_specific_dim=STYLE_DIMS,
            modalities_specific_betas={"mod1": 1.0},
        ))


@pytest.mark.parametrize("name", ALL)
def test_two_epoch_training(name, tmp_path):
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    model = make_model(name)
    ds = make_dataset("complete", n=16)
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=2,
        per_device_train_batch_size=8, learning_rate=1e-3, n_devices=1,
    )
    trainer = BaseTrainer(model, ds, eval_dataset=ds, training_config=cfg)
    trainer.train()


@pytest.mark.parametrize("name", ["mopoe", "dmvae"])
def test_incomplete_training(name, tmp_path):
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    model = make_model(name)
    ds = make_dataset("incomplete", n=16)
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=2,
        per_device_train_batch_size=8, learning_rate=1e-3, n_devices=1,
    )
    trainer = BaseTrainer(model, ds, training_config=cfg)
    trainer.train()
