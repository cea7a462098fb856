"""Tests for joint-encoder models: JMVAE, TELBO (+ MultistageTrainer), CVAE."""

import numpy as np
import pytest

import jax

from model_test_utils import DIMS, check_save_load, make_dataset
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import (
    CVAE,
    CVAEConfig,
    JMVAE,
    JMVAEConfig,
    TELBO,
    TELBOConfig,
)
from multivae_tpu.models.base.step import StepInfo
from multivae_tpu.trainers import (
    BaseTrainer,
    BaseTrainerConfig,
    MultistageTrainer,
    MultistageTrainerConfig,
)

LATENT = 5


@pytest.fixture
def jmvae():
    return JMVAE(JMVAEConfig(n_modalities=3, latent_dim=LATENT,
                             input_dims=DIMS, warmup=2))


@pytest.fixture
def telbo():
    return TELBO(TELBOConfig(n_modalities=3, latent_dim=LATENT,
                             input_dims=DIMS, warmup=2))


@pytest.fixture
def cvae():
    return CVAE(CVAEConfig(
        conditioning_modalities=["mod2", "mod3"], main_modality="mod1",
        input_dims=DIMS, latent_dim=LATENT,
    ))


def test_jmvae_forward_and_annealing(jmvae):
    ds = make_dataset("complete")
    batch = as_batch(ds[:])
    rng = jax.random.key(0)
    out1 = jmvae.loss_function(jmvae.params, batch, rng,
                               StepInfo.create(epoch=1))
    out2 = jmvae.loss_function(jmvae.params, batch, rng,
                               StepInfo.create(epoch=5))
    assert np.isfinite(float(out1.loss))
    assert float(out1.metrics["beta"]) == pytest.approx(0.5)
    assert float(out2.metrics["beta"]) == pytest.approx(1.0)


def test_jmvae_rejects_incomplete(jmvae):
    ds = make_dataset("incomplete")
    with pytest.raises(AttributeError):
        jmvae.forward(ds[:])
    with pytest.raises(AttributeError):
        jmvae.encode(ds[:], "mod2")


@pytest.mark.parametrize("cond", ["all", "mod2", ["mod1", "mod2"]])
def test_jmvae_encode_paths(jmvae, cond):
    ds = make_dataset("complete")
    out = jmvae.encode(ds[:], cond, N=2, flatten=True)
    assert out.z.shape == (12, LATENT)


def test_jmvae_joint_nll(jmvae):
    ds = make_dataset("complete", n=4)
    nll = jmvae.compute_joint_nll(ds[:], K=12, batch_size_K=5)
    assert np.isfinite(float(nll))


def test_jmvae_save_load(jmvae, tmp_path):
    check_save_load(jmvae, JMVAE, tmp_path)


def test_jmvae_trains_with_base_trainer(jmvae, tmp_path):
    ds = make_dataset("complete", n=16)
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=2,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    BaseTrainer(jmvae, ds, training_config=cfg).train()


def test_telbo_requires_multistage(telbo, tmp_path):
    ds = make_dataset("complete", n=8)
    with pytest.raises(AttributeError):
        BaseTrainer(telbo, ds, training_config=BaseTrainerConfig(
            output_dir=str(tmp_path), n_devices=1))


def test_telbo_stage_switch(telbo):
    ds = make_dataset("complete")
    batch = as_batch(ds[:])
    rng = jax.random.key(0)

    assert telbo.stage_for_epoch(1) == 1
    assert telbo.stage_for_epoch(2) == 1
    assert telbo.stage_for_epoch(3) == 2

    out1 = telbo.loss_function(telbo.params, batch, rng,
                               StepInfo.create(epoch=1))
    assert "kld_joint" in out1.metrics

    telbo.set_stage(2)
    out2 = telbo.loss_function(telbo.params, batch, rng,
                               StepInfo.create(epoch=3))
    assert "mod1" in out2.metrics

    # stage 2 freezes joint encoder + decoders
    def loss(params):
        return telbo.loss_function(params, batch, rng,
                                   StepInfo.create(epoch=3))["loss"]

    grads = jax.grad(loss)(telbo.params)
    for g in jax.tree_util.tree_leaves(grads["joint_encoder"]):
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    for g in jax.tree_util.tree_leaves(grads["decoders"]):
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    enc_norm = sum(float(np.abs(np.asarray(g)).sum())
                   for g in jax.tree_util.tree_leaves(grads["encoders"]))
    assert enc_norm > 0
    telbo.set_stage(1)


def test_telbo_multistage_training(telbo, tmp_path):
    ds = make_dataset("complete", n=16)
    cfg = MultistageTrainerConfig(
        output_dir=str(tmp_path), num_epochs=4,
        per_device_train_batch_size=8, learning_rate=1e-3, n_devices=1,
    )
    trainer = MultistageTrainer(telbo, ds, eval_dataset=ds,
                                training_config=cfg)
    trainer.train()
    # a checkpoint is saved at the stage boundary (epoch warmup - 1 = 1)
    import os

    assert any(d.startswith("checkpoint_epoch_")
               for d in os.listdir(trainer.training_dir))


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_telbo_resume_before_stage_boundary(telbo, tmp_path, backend):
    """Resuming a TELBO run from a checkpoint BEFORE the stage boundary
    (epoch 1, boundary at warmup=2) must still perform the optimizer
    reset + stage switch at epoch 2 in the resumed run, ending in stage
    2 with finite losses. Reference:
    ``multistage_trainer.py:53-71``."""
    import os

    ds = make_dataset("complete", n=16)

    def cfg(path, n_epochs, **kw):
        return MultistageTrainerConfig(
            output_dir=str(path), num_epochs=n_epochs,
            per_device_train_batch_size=8, learning_rate=1e-3,
            n_devices=1, checkpoint_backend=backend, **kw)

    part = MultistageTrainer(telbo, ds, eval_dataset=ds,
                             training_config=cfg(tmp_path / "p", 1,
                                                 steps_saving=1))
    part.train()
    ckpt = os.path.join(part.training_dir, "checkpoint_epoch_1")
    assert os.path.isdir(ckpt)

    resumed_model = TELBO(TELBOConfig(n_modalities=3, latent_dim=LATENT,
                                      input_dims=DIMS, warmup=2), seed=0)
    resumed = MultistageTrainer(resumed_model, ds, eval_dataset=ds,
                                training_config=cfg(tmp_path / "r", 4),
                                checkpoint=ckpt)
    assert resumed.trained_epochs == 1
    resumed.train()  # crosses the boundary at epoch 2 inside the resume
    assert resumed_model.current_stage == 2
    # the boundary checkpoint (epoch 1 label) was saved during the
    # RESUMED run too
    assert os.path.isdir(os.path.join(resumed.training_dir,
                                      "checkpoint_epoch_1"))
    loss, _ = resumed.train_step(5)
    assert np.isfinite(loss)


def test_telbo_encode_subset_rejected(telbo):
    ds = make_dataset("complete")
    with pytest.raises(ValueError):
        telbo.encode(ds[:], ["mod1", "mod2"])
    out = telbo.encode(ds[:], "mod1")
    assert out.z.shape == (6, LATENT)


def test_cvae_forward_finite(cvae):
    ds = make_dataset("complete")
    out = cvae.forward(ds[:])
    assert np.isfinite(float(out.loss))
    assert "kl" in out.metrics


def test_cvae_with_prior_network():
    from multivae_tpu.nn import BaseAEConfig, BaseDictEncoders, MultipleHeadJointEncoder

    prior_net = MultipleHeadJointEncoder(
        dict_encoders=BaseDictEncoders(
            {"mod2": DIMS["mod2"], "mod3": DIMS["mod3"]}, LATENT),
        args=BaseAEConfig(latent_dim=LATENT),
    )
    model = CVAE(CVAEConfig(
        conditioning_modalities=["mod2", "mod3"], main_modality="mod1",
        input_dims=DIMS, latent_dim=LATENT,
    ), prior_network=prior_net)
    assert "prior_network" in model.params
    ds = make_dataset("complete")
    out = model.forward(ds[:])
    assert np.isfinite(float(out.loss))


@pytest.mark.parametrize("N,flatten", [(1, False), (3, False), (3, True)])
def test_cvae_encode_decode_shapes(cvae, N, flatten):
    ds = make_dataset("complete")
    emb = cvae.encode(ds[:], N=N, flatten=flatten)
    out = cvae.decode(emb)
    if N == 1:
        assert out.reconstruction.shape == (6, *DIMS["mod1"])
    elif flatten:
        assert out.reconstruction.shape == (18, *DIMS["mod1"])
    else:
        assert out.reconstruction.shape == (3, 6, *DIMS["mod1"])


def test_cvae_predict_paths(cvae):
    ds = make_dataset("complete")
    out = cvae.predict(ds[:], cond_mod="all")
    assert out.mod1.shape == (6, *DIMS["mod1"])
    out = cvae.predict(ds[:], cond_mod=["mod2", "mod3"])
    assert out.mod1.shape == (6, *DIMS["mod1"])
    with pytest.raises(ValueError):
        cvae.predict(ds[:], cond_mod=["mod2"])


def test_cvae_save_load(cvae, tmp_path):
    d = str(tmp_path / "cvae")
    cvae.save(d)
    loaded = CVAE.load_from_folder(d)
    same = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        cvae.params, loaded.params,
    ))
    assert same


def test_cvae_trains(cvae, tmp_path):
    ds = make_dataset("complete", n=16)
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=2,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    BaseTrainer(cvae, ds, training_config=cfg).train()


def test_cvae_trainer_prediction_images(cvae, tmp_path):
    ds = make_dataset("complete", n=16)
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=1,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1, steps_predict=1)
    trainer = BaseTrainer(cvae, ds, training_config=cfg)
    trainer.train()
    import os

    assert any(f.startswith("recon_from_") for f in
               os.listdir(trainer.training_dir))
