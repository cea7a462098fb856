"""Tests for ops/microbatch: exact grad accumulation for sum losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from model_test_utils import DIMS, make_dataset
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig
from multivae_tpu.models.base.step import StepInfo
from multivae_tpu.ops.microbatch import (
    microbatched_value_and_grad,
    split_batch,
)


@pytest.fixture(scope="module")
def model():
    return MMVAEPlus(MMVAEPlusConfig(
        n_modalities=3, latent_dim=4, input_dims=DIMS, K=3,
        modalities_specific_dim=3, loss="iwae_looser",
    ), seed=0)


@pytest.fixture(scope="module")
def batch():
    return as_batch(make_dataset("complete", n=12)[:12])


def _loss_sum_fn(model):
    info = StepInfo.create(epoch=1)

    def fn(params, b, rng):
        return model.loss_function(params, b, rng, info)["loss_sum"]

    return fn


def test_split_batch_shapes_and_static_fields(batch):
    chunks = split_batch(batch, 3)
    assert chunks.data["mod1"].shape == (3, 4, *DIMS["mod1"])
    assert chunks.weights.shape == (3, 4)
    assert chunks.incomplete == batch.incomplete  # static field untouched

    with pytest.raises(ValueError):
        split_batch(batch, 5)


def test_microbatched_grads_match_manual_accumulation(model, batch):
    """The scan accumulation must equal plain per-chunk value_and_grad
    with the same fold_in keys, summed — the machinery adds nothing."""
    loss_fn = _loss_sum_fn(model)
    rng = jax.random.key(0)
    n_micro = 3

    mvg = jax.jit(microbatched_value_and_grad(loss_fn, n_micro))
    loss_m, grads_m = mvg(model.params, batch, rng)

    chunks = split_batch(batch, n_micro)
    loss_ref = 0.0
    grads_ref = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32),
                             model.params)
    for i in range(n_micro):
        chunk = jax.tree.map(lambda x: x[i], chunks)
        l, g = jax.value_and_grad(loss_fn)(
            model.params, chunk, jax.random.fold_in(rng, i))
        loss_ref += float(l)
        grads_ref = jax.tree.map(lambda a, b: a + np.asarray(b, np.float32),
                                 grads_ref, g)

    np.testing.assert_allclose(float(loss_m), loss_ref, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_m), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_microbatched_n1_is_plain_value_and_grad(model, batch):
    loss_fn = _loss_sum_fn(model)
    rng = jax.random.key(7)
    l1, g1 = microbatched_value_and_grad(loss_fn, 1)(model.params, batch, rng)
    l2, g2 = jax.value_and_grad(loss_fn)(model.params, batch, rng)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------- trainer integration
def _trainer(model, n, tmp_path, **kw):
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    ds = make_dataset("complete", n=n)
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=2,
        per_device_train_batch_size=kw.pop("bs", 4),
        per_device_eval_batch_size=4, learning_rate=1e-3, seed=0, **kw)
    return BaseTrainer(model, ds, training_config=cfg)


@pytest.mark.parametrize("cache", [False, True])
def test_trainer_microbatch_trains(tmp_path, cache):
    m = MMVAEPlus(MMVAEPlusConfig(
        n_modalities=3, latent_dim=4, input_dims=DIMS, K=2,
        modalities_specific_dim=3, loss="iwae_looser",
    ), seed=0)
    t = _trainer(m, 16, tmp_path / f"c{cache}", microbatch_steps=2,
                 cache_on_device=cache, keep_best_on_train=True)
    t.train()
    assert np.isfinite(t.best_train_loss)
    for leaf in jax.tree.leaves(t.state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_trainer_microbatch_dp_mesh(tmp_path):
    m = MMVAEPlus(MMVAEPlusConfig(
        n_modalities=3, latent_dim=4, input_dims=DIMS, K=2,
        modalities_specific_dim=3, loss="iwae_looser",
    ), seed=0)
    t = _trainer(m, 16, tmp_path, microbatch_steps=2, n_devices=8, bs=1)
    loss, _ = t.train_step(1)
    assert np.isfinite(loss)


def test_trainer_microbatch_rejects_non_sum_models(tmp_path):
    from multivae_tpu.models import MVTCAE, MVTCAEConfig

    m = MVTCAE(MVTCAEConfig(n_modalities=3, latent_dim=4, input_dims=DIMS),
               seed=0)
    with pytest.raises(AttributeError, match="loss_is_sum"):
        _trainer(m, 16, tmp_path, microbatch_steps=2)


def test_trainer_microbatch_rejects_indivisible_batch(tmp_path):
    m = MMVAEPlus(MMVAEPlusConfig(
        n_modalities=3, latent_dim=4, input_dims=DIMS, K=2,
        modalities_specific_dim=3,
    ), seed=0)
    with pytest.raises(AttributeError, match="divisible"):
        _trainer(m, 16, tmp_path, microbatch_steps=3)


def test_microbatch_config_validation():
    from multivae_tpu.trainers import BaseTrainerConfig

    with pytest.raises(AttributeError):
        BaseTrainerConfig(microbatch_steps=0)


def test_microbatched_statistics_match_full_batch(model, batch):
    """Chunked sampling draws different noise than the full-batch call,
    but the loss must agree in expectation (sanity on the estimator)."""
    loss_fn = _loss_sum_fn(model)
    full = np.mean([float(loss_fn(model.params, batch, jax.random.key(s)))
                    for s in range(8)])
    mvg = jax.jit(microbatched_value_and_grad(loss_fn, 2))
    micro = np.mean([float(mvg(model.params, batch, jax.random.key(s))[0])
                     for s in range(8)])
    np.testing.assert_allclose(micro, full, rtol=0.05)
