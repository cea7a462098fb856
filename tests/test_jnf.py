"""Tests for the JNF model (flows + HMC subset sampling)."""

import numpy as np
import pytest

import jax

from model_test_utils import DIMS, check_save_load, make_dataset
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import JNF, JNFConfig
from multivae_tpu.models.base.step import StepInfo
from multivae_tpu.trainers import MultistageTrainer, MultistageTrainerConfig

LATENT = 4


@pytest.fixture
def model():
    return JNF(JNFConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                         warmup=2))


def test_stage1_loss(model):
    ds = make_dataset("complete")
    batch = as_batch(ds[:])
    out = model.loss_function(model.params, batch, jax.random.key(0),
                              StepInfo.create(epoch=1))
    assert np.isfinite(float(out.loss))
    assert float(out.metrics["ljm"]) == 0.0


def test_stage2_trains_only_flows(model):
    ds = make_dataset("complete")
    batch = as_batch(ds[:])
    model.set_stage(2)

    def loss(params):
        return model.loss_function(params, batch, jax.random.key(0),
                                   StepInfo.create(epoch=3))["loss"]

    grads = jax.grad(loss)(model.params)
    for g in jax.tree_util.tree_leaves(grads["joint_encoder"]):
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    for g in jax.tree_util.tree_leaves(grads["decoders"]):
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    flow_norm = sum(float(np.abs(np.asarray(g)).sum())
                    for g in jax.tree_util.tree_leaves(grads["flows"]))
    assert flow_norm > 0
    model.set_stage(1)


def test_encode_joint_and_single(model):
    ds = make_dataset("complete")
    out = model.encode(ds[:], "all")
    assert out.z.shape == (6, LATENT)
    out = model.encode(ds[:], "mod1", N=2, flatten=True)
    assert out.z.shape == (12, LATENT)


def test_encode_subset_uses_hmc(model):
    ds = make_dataset("complete", n=4)
    out = model.encode(ds[:], ["mod1", "mod2"], mcmc_steps=3, n_lf=2,
                       eps_lf=0.01)
    assert out.z.shape == (4, LATENT)
    assert np.all(np.isfinite(np.asarray(out.z)))
    out = model.encode(ds[:], ["mod1", "mod2"], N=2, mcmc_steps=2, n_lf=2)
    assert out.z.shape == (2, 4, LATENT)


def test_joint_nll(model):
    ds = make_dataset("complete", n=4)
    nll = model.compute_joint_nll(ds[:], K=12, batch_size_K=5)
    assert np.isfinite(float(nll))


def test_save_load(model, tmp_path):
    check_save_load(model, JNF, tmp_path)


def test_multistage_training(model, tmp_path):
    ds = make_dataset("complete", n=16)
    cfg = MultistageTrainerConfig(
        output_dir=str(tmp_path), num_epochs=4,
        per_device_train_batch_size=8, learning_rate=1e-3, n_devices=1,
    )
    trainer = MultistageTrainer(model, ds, eval_dataset=ds,
                                training_config=cfg)
    trainer.train()
    assert model.current_stage == 2
