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


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_multistage_checkpoint_across_stage_boundary(tmp_path, backend):
    """Checkpoint/resume ACROSS the JNF stage boundary (warmup=2 -> reset
    at epoch 3): resuming from an epoch-4 checkpoint must restore the
    stage-2 optimizer state (post-reset moments), recompute stage 2 for
    the remaining epochs, and — with the orbax backend — continue the
    EXACT trajectory of the uninterrupted run.

    Reference parity anchor: ``src/multivae/trainers/multistage/
    multistage_trainer.py:53-71`` (optimizer reset + checkpoint at the
    boundary) + resume semantics ``base_trainer.py:390-427``."""
    import os

    ds = make_dataset("complete", n=16)

    def cfg(path, n_epochs, **kw):
        return MultistageTrainerConfig(
            output_dir=str(path), num_epochs=n_epochs,
            per_device_train_batch_size=8, learning_rate=1e-3, n_devices=1,
            checkpoint_backend=backend, **kw)

    def fresh_model():
        return JNF(JNFConfig(n_modalities=3, latent_dim=LATENT,
                             input_dims=DIMS, warmup=2), seed=0)

    # uninterrupted 6-epoch run (stage 2 from epoch 3)
    straight = MultistageTrainer(fresh_model(), ds, eval_dataset=ds,
                                 training_config=cfg(tmp_path / "s", 6))
    straight.train()

    # interrupted: checkpoint at epoch 4 (inside stage 2), then resume
    part = MultistageTrainer(fresh_model(), ds, eval_dataset=ds,
                             training_config=cfg(tmp_path / "p", 4,
                                                 steps_saving=4))
    part.train()
    ckpt = os.path.join(part.training_dir, "checkpoint_epoch_4")
    assert os.path.isdir(ckpt)

    resumed_model = fresh_model()
    resumed = MultistageTrainer(resumed_model, ds, eval_dataset=ds,
                                training_config=cfg(tmp_path / "r", 6),
                                checkpoint=ckpt)
    assert resumed.trained_epochs == 4
    resumed.train()
    # the resumed run must have recomputed stage 2 (the static-stage flag
    # is NOT serialized; stage_for_epoch re-derives it every epoch)
    assert resumed_model.current_stage == 2

    if backend == "orbax":
        # exact-trajectory resume: optimizer moments + rng chain + step
        # restored -> same final params as the uninterrupted run
        for a, b in zip(jax.tree_util.tree_leaves(resumed.state.params),
                        jax.tree_util.tree_leaves(straight.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
    else:
        # msgpack restores the optimizer but the live params are the
        # best-model snapshot (reference semantics): check the resumed
        # run is finite and in stage 2 with a working compiled step
        loss, _ = resumed.train_step(7)
        assert np.isfinite(loss)
