"""Mixed precision, timing/profiler callbacks, native gather, prefetch."""

import os

import numpy as np
import pytest

import jax

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig
from multivae_tpu.trainers.base import JaxProfilerCallback, StepTimingCallback

DIMS = {"m0": (4,), "m1": (6,)}


@pytest.fixture
def dataset():
    rng = np.random.default_rng(0)
    return MultimodalBaseDataset(
        {m: rng.normal(size=(16, *d)).astype(np.float32)
         for m, d in DIMS.items()})


@pytest.fixture
def model():
    return MVTCAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                               input_dims=DIMS))


def test_mixed_precision_training(model, dataset, tmp_path):
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=2,
        per_device_train_batch_size=8, learning_rate=1e-3, n_devices=1,
        mixed_precision=True,
    )
    trainer = BaseTrainer(model, dataset, training_config=cfg)
    l1, _ = trainer.train_step(1)
    l2, _ = trainer.train_step(2)
    assert np.isfinite(l1) and np.isfinite(l2)
    # master weights stay fp32
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.dtype == np.float32


def test_mixed_precision_close_to_fp32(dataset, tmp_path):
    cfg_m = MVTCAEConfig(n_modalities=2, latent_dim=4, input_dims=DIMS)
    m32 = MVTCAE(cfg_m, seed=1)
    m16 = MVTCAE(cfg_m, seed=1)
    kw = dict(output_dir=str(tmp_path), num_epochs=1,
              per_device_train_batch_size=16, learning_rate=1e-3,
              n_devices=1, seed=5)
    t32 = BaseTrainer(m32, dataset, training_config=BaseTrainerConfig(**kw))
    t16 = BaseTrainer(m16, dataset, training_config=BaseTrainerConfig(
        mixed_precision=True, **kw))
    l32, _ = t32.train_step(1)
    l16, _ = t16.train_step(1)
    assert l16 == pytest.approx(l32, rel=0.05)


def test_step_timing_callback(model, dataset, tmp_path):
    timing = StepTimingCallback()
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=2,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    trainer = BaseTrainer(model, dataset, training_config=cfg,
                          callbacks=[timing])
    trainer.train()
    assert len(timing.history) == 2
    assert timing.history[0]["epoch_time_s"] > 0
    assert timing.history[0]["steps"] == 2


def test_jax_profiler_callback(model, dataset, tmp_path):
    trace_dir = str(tmp_path / "trace")
    prof = JaxProfilerCallback(trace_dir, epochs=(1,))
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=1,
                            per_device_train_batch_size=8,
                            learning_rate=1e-3, n_devices=1)
    BaseTrainer(model, dataset, training_config=cfg,
                callbacks=[prof]).train()
    # a trace directory with profile files must exist
    found = []
    for root, _, files in os.walk(trace_dir):
        found.extend(files)
    assert found, "no profiler trace files written"


def test_prefetch_loader_matches_plain(dataset):
    from multivae_tpu.data.loader import DataLoader
    from multivae_tpu.data.prefetch import PrefetchLoader
    from multivae_tpu.parallel.mesh import get_data_mesh, shard_batch

    mesh = get_data_mesh(1)
    loader = DataLoader(dataset, 8, shuffle=True, seed=1)
    loader.set_epoch(3)
    plain = [shard_batch(b, mesh) for b in loader]
    loader2 = DataLoader(dataset, 8, shuffle=True, seed=1)
    loader2.set_epoch(3)
    pref = list(PrefetchLoader(loader2, mesh, depth=2))
    assert len(plain) == len(pref)
    for b1, b2 in zip(plain, pref):
        for m in DIMS:
            np.testing.assert_allclose(np.asarray(b1.data[m]),
                                       np.asarray(b2.data[m]))


def test_native_gather_various_shapes():
    from multivae_tpu.data.native_gather import gather_rows

    rng = np.random.default_rng(0)
    for shape in [(100, 7), (50, 3, 28, 28), (30, 2, 2, 2, 2)]:
        src = rng.normal(size=shape).astype(np.float32)
        idx = rng.integers(0, shape[0], 40)
        np.testing.assert_allclose(gather_rows(src, idx), src[idx])
