"""Tests for Nexus and MHVAE."""

import numpy as np
import pytest

import jax

from mhvae_test_architectures import build_mhvae_blocks
from model_test_utils import DIMS, check_forward_contract, make_dataset
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import (
    MHVAE,
    MHVAEConfig,
    Nexus,
    NexusConfig,
)
from multivae_tpu.models.base.step import StepInfo

LATENT = 4
SPECIFIC = {"mod1": 3, "mod2": 4, "mod3": 3}


@pytest.fixture
def nexus():
    return Nexus(NexusConfig(
        n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
        modalities_specific_dim=SPECIFIC, msg_dim=6, warmup=2,
        dropout_rate=0.5,
    ))


@pytest.fixture
def mhvae():
    enc, dec, bu, td, post, prior = build_mhvae_blocks(DIMS, n_latent=3,
                                                       latent_dim=LATENT)
    return MHVAE(
        MHVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                    n_latent=3),
        encoders=enc, decoders=dec, bottom_up_blocks=bu,
        top_down_blocks=td, posterior_blocks=post, prior_blocks=prior,
    )


# ------------------------------------------------------------------- Nexus
@pytest.mark.parametrize("kind", ["complete", "incomplete"])
def test_nexus_forward(nexus, kind):
    out = check_forward_contract(nexus, make_dataset(kind))
    assert "bottom_loss" in out.metrics
    assert "top_loss" in out.metrics


def test_nexus_annealing(nexus):
    batch = as_batch(make_dataset("complete")[:])
    rng = jax.random.key(0)
    out1 = nexus.loss_function(nexus.params, batch, rng,
                               StepInfo.create(epoch=1))
    out3 = nexus.loss_function(nexus.params, batch, rng,
                               StepInfo.create(epoch=3))
    assert float(out1.metrics["annealing"]) == pytest.approx(0.5)
    assert float(out3.metrics["annealing"]) == pytest.approx(1.0)


def test_nexus_encode_decode(nexus):
    ds = make_dataset("complete")
    out = nexus.encode(ds[:], ["mod1", "mod2"])
    assert out.z.shape == (6, LATENT)
    assert out.one_latent_space
    assert "modalities_z" in out

    # cross-modal decode goes through the top decoders
    decoded = nexus.decode(out, "mod3")
    assert decoded.mod3.shape == (6, *DIMS["mod3"])
    # self-reconstruction uses the bottom codes
    decoded = nexus.decode(out, "mod1")
    assert decoded.mod1.shape == (6, *DIMS["mod1"])


def test_nexus_predict(nexus):
    ds = make_dataset("complete")
    out = nexus.predict(ds[:], cond_mod="mod1", gen_mod="all")
    for m in DIMS:
        assert out[m].shape == (6, *DIMS[m])


def test_nexus_bad_gammas_raise():
    with pytest.raises(AttributeError):
        Nexus(NexusConfig(
            n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
            modalities_specific_dim=SPECIFIC, gammas={"mod1": 1.0},
        ))


def test_nexus_trains(nexus, tmp_path):
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    ds = make_dataset("complete", n=16)
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=2,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    BaseTrainer(nexus, ds, training_config=cfg).train()


def test_nexus_incomplete_training(nexus, tmp_path):
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    ds = make_dataset("incomplete", n=16)
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=2,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    BaseTrainer(nexus, ds, training_config=cfg).train()


# ------------------------------------------------------------------- MHVAE
@pytest.mark.parametrize("kind", ["complete", "incomplete"])
def test_mhvae_forward(mhvae, kind):
    ds = make_dataset(kind)
    out = mhvae.forward(ds[:])
    assert np.isfinite(float(out.loss))
    assert "kl_1" in out.metrics
    assert "kl_3" in out.metrics


def test_mhvae_encode_shapes(mhvae):
    ds = make_dataset("complete")
    out = mhvae.encode(ds[:], ["mod1"])
    assert out.z.shape[0] == 6
    assert "all_z" in out
    out = mhvae.encode(ds[:], "all", N=2)
    assert out.z.shape[0] == 2 and out.z.shape[1] == 6


def test_mhvae_predict(mhvae):
    ds = make_dataset("complete")
    out = mhvae.predict(ds[:], cond_mod="mod2", gen_mod="all")
    for m in DIMS:
        assert out[m].shape == (6, *DIMS[m])


def test_mhvae_block_count_validation():
    enc, dec, bu, td, post, prior = build_mhvae_blocks(DIMS, n_latent=3)
    with pytest.raises(AttributeError):
        MHVAE(MHVAEConfig(n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
                          n_latent=3),
              encoders=enc, decoders=dec, bottom_up_blocks=bu,
              top_down_blocks=td[:1], posterior_blocks=post,
              prior_blocks=prior)


def test_mhvae_unshared_posteriors():
    enc, dec, bu, td, post, prior = build_mhvae_blocks(
        DIMS, n_latent=3, shared_posteriors=False)
    model = MHVAE(MHVAEConfig(n_modalities=3, latent_dim=LATENT,
                              input_dims=DIMS, n_latent=3),
                  encoders=enc, decoders=dec, bottom_up_blocks=bu,
                  top_down_blocks=td, posterior_blocks=post,
                  prior_blocks=prior)
    assert not model.share_posterior_weights
    ds = make_dataset("complete")
    out = model.forward(ds[:])
    assert np.isfinite(float(out.loss))


def test_mhvae_save_load(mhvae, tmp_path):
    ds = make_dataset("complete")
    mhvae.forward(ds[:])  # initialize params
    d = str(tmp_path / "mhvae")
    mhvae.save(d)
    loaded = MHVAE.load_from_folder(d)
    same = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        mhvae.params, loaded.params,
    ))
    assert same


def test_mhvae_trains_without_warmup_forward(mhvae, tmp_path):
    """The trainer must initialize lazily-built MHVAE params itself."""
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    ds = make_dataset("complete", n=16)
    assert mhvae.params is None
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=1,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    BaseTrainer(mhvae, ds, training_config=cfg).train()
    assert mhvae.params is not None


def test_mhvae_trains(mhvae, tmp_path):
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    ds = make_dataset("complete", n=16)
    mhvae.forward(ds[:8])  # explicit init also still works
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=2,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    BaseTrainer(mhvae, ds, training_config=cfg).train()


def test_mhvae_conv_latents(tmp_path):
    """Intermediate latents as conv feature maps (reference mhvae example
    uses 1x1-conv prior/posterior blocks over (C,H,W) latents,
    ``examples/mhvae/architectures_mmnist.py``)."""
    import flax.linen as nn
    import jax.numpy as jnp

    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import MHVAE, MHVAEConfig
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig
    from multivae_tpu.utils.model_output import ModelOutput

    C, LAT = 4, 3
    X = (1, 8, 8)

    class InputEnc(nn.Module):
        @nn.compact
        def __call__(self, x):  # NCHW -> NHWC feature map
            x = jnp.transpose(x, (0, 2, 3, 1))
            h = nn.relu(nn.Conv(C, (3, 3), strides=2)(x))  # (B,4,4,C)
            return ModelOutput(embedding=h)

    class BULast(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.relu(nn.Dense(16)(h.reshape(h.shape[0], -1)))
            return ModelOutput(embedding=nn.Dense(LAT)(h),
                               log_covariance=nn.Dense(LAT)(h))

    class TD(nn.Module):  # z_2 (vector) -> conv feature map
        @nn.compact
        def __call__(self, z):
            h = nn.relu(nn.Dense(4 * 4 * C)(z))
            return h.reshape(z.shape[0], 4, 4, C)

    class ConvHead(nn.Module):  # feature map -> conv mu/logvar
        @nn.compact
        def __call__(self, h):
            return ModelOutput(embedding=nn.Conv(C, (1, 1))(h),
                               log_covariance=nn.Conv(C, (1, 1))(h))

    class OutDec(nn.Module):  # conv z_1 -> NCHW recon
        @nn.compact
        def __call__(self, z):
            h = nn.relu(nn.ConvTranspose(C, (3, 3), strides=(2, 2))(z))
            r = nn.Conv(1, (3, 3))(h)
            return ModelOutput(reconstruction=jnp.transpose(r, (0, 3, 1, 2)))

    dims = {"m0": X, "m1": X}
    model = MHVAE(
        MHVAEConfig(n_modalities=2, latent_dim=LAT, input_dims=dims,
                    n_latent=2),
        encoders={m: InputEnc() for m in dims},
        decoders={m: OutDec() for m in dims},
        bottom_up_blocks={m: [BULast()] for m in dims},
        top_down_blocks=[TD()],
        posterior_blocks=[ConvHead()],
        prior_blocks=[ConvHead()],
    )

    rng = np.random.default_rng(0)
    ds = MultimodalBaseDataset(
        {m: rng.random((16, *X), dtype=np.float32) for m in dims})
    out = model.forward(ds[:8])
    assert np.isfinite(float(out.loss))

    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=1,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    BaseTrainer(model, ds, training_config=cfg).train()
    pred = model.predict(ds[:4], cond_mod="m0", gen_mod="m1")
    assert pred.m1.shape == (4, *X)
