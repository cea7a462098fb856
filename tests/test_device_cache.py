"""Device-resident dataset cache: HBM-cached epochs must be
bit-identical to the host loader path.

The cache (``data/device_cache.py``, trainer flag ``cache_on_device``)
replaces the reference's per-step host->device streaming
(``src/multivae/trainers/base/base_trainer.py:196-222,664-687``) with one
upload + on-device gathers; these tests pin the contract that BOTH paths
consume the exact same ``DataLoader.epoch_plan`` and therefore train the
exact same trajectory.
"""

import logging

import numpy as np
import pytest

import jax

from multivae_tpu.data import IncompleteDataset, MultimodalBaseDataset
from multivae_tpu.data.device_cache import (
    build_device_cache,
    estimate_dataset_nbytes,
)
from multivae_tpu.data.loader import DataLoader
from multivae_tpu.models import MVAE, MVAEConfig, MVTCAE, MVTCAEConfig
from multivae_tpu.parallel.mesh import get_data_mesh
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

N = 37  # deliberately not a multiple of the batch size: exercises padding


@pytest.fixture
def dataset():
    rng = np.random.default_rng(0)
    data = {
        "mod1": rng.normal(size=(N, 2)).astype(np.float32),
        "mod2": rng.normal(size=(N, 3)).astype(np.float32),
    }
    return MultimodalBaseDataset(data, labels=rng.integers(0, 3, size=N))


@pytest.fixture
def incomplete_dataset():
    rng = np.random.default_rng(1)
    data = {
        "mod1": rng.normal(size=(N, 2)).astype(np.float32),
        "mod2": rng.normal(size=(N, 3)).astype(np.float32),
    }
    masks = {
        "mod1": np.ones(N, bool),
        "mod2": rng.random(N) > 0.4,
    }
    return IncompleteDataset(data, masks=masks)


def model_config():
    return MVTCAEConfig(n_modalities=2, latent_dim=4,
                        input_dims={"mod1": (2,), "mod2": (3,)})


def run_trainer(model, ds, tmp_path, n_epochs=3, with_eval=True, **kw):
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=n_epochs,
        per_device_train_batch_size=kw.pop("bs", 8),
        per_device_eval_batch_size=8, learning_rate=1e-3, seed=3,
        n_devices=kw.pop("n_devices", 1), **kw)
    t = BaseTrainer(model, ds, eval_dataset=ds if with_eval else None,
                    training_config=cfg)
    losses = []
    for e in range(1, n_epochs + 1):
        tl, _ = t.train_step(e)
        el = t.eval_step(e)[0] if with_eval else None
        losses.append((tl, el))
    return t, losses


def assert_params_equal(t1, t2, atol=0.0):
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=atol)


# --------------------------------------------------------------- epoch plan
def test_epoch_plan_defines_the_iterated_batches(dataset):
    """__iter__ must gather exactly plan rows (single source of truth)."""
    loader = DataLoader(dataset, 8, shuffle=True, seed=7)
    loader.set_epoch(4)
    idx, w = loader.epoch_plan()
    assert idx.shape == (len(loader), 8)
    batches = list(loader)
    for b, batch in enumerate(batches):
        raw = dataset.get_batch(idx[b])
        for m in ("mod1", "mod2"):
            np.testing.assert_array_equal(np.asarray(batch.data[m]),
                                          raw["data"][m])
        np.testing.assert_array_equal(np.asarray(batch.weights), w[b])
        np.testing.assert_array_equal(np.asarray(batch.labels),
                                      raw["labels"])
    # padding rows of the final batch carry zero weight
    assert w[-1].sum() < 8


# -------------------------------------------------------------- exactness
def test_cached_training_identical_to_host_loader(dataset, tmp_path):
    """cache_on_device=True: same losses and BIT-identical params as the
    host loader across epochs (train + eval, incl. the padded final
    batch)."""
    th, lh = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "h")
    tc, lc = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "c", cache_on_device=True)
    assert tc._train_cache is not None and tc._eval_cache is not None
    for (a, b), (c, d) in zip(lh, lc):
        assert a == pytest.approx(c, abs=1e-9)
        assert b == pytest.approx(d, abs=1e-9)
    assert_params_equal(th, tc)


def test_cached_chunked_identical(dataset, tmp_path):
    """steps_per_execution > 1 (scan-fused dispatch) changes nothing."""
    th, lh = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "h")
    tc, lc = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "c", cache_on_device=True,
                         steps_per_execution=4)
    for (a, b), (c, d) in zip(lh, lc):
        assert a == pytest.approx(c, abs=1e-9)
        assert b == pytest.approx(d, abs=1e-9)
    assert_params_equal(th, tc)


def test_cached_training_incomplete_dataset(incomplete_dataset, tmp_path):
    """Masks ride the cache: incomplete-data training matches the host
    path (MVAE consumes the masks in its subset sampling). Batches are
    bit-identical by construction; the fused gather+scan program may
    reassociate the loss reduction, so tolerances here are fp32-roundoff,
    not zero."""
    cfg = MVAEConfig(n_modalities=2, latent_dim=4,
                     input_dims={"mod1": (2,), "mod2": (3,)})
    th, lh = run_trainer(MVAE(cfg, seed=0), incomplete_dataset,
                         tmp_path / "h")
    tc, lc = run_trainer(MVAE(cfg, seed=0), incomplete_dataset,
                         tmp_path / "c", cache_on_device=True)
    assert tc._train_cache.incomplete is True
    for (a, b), (c, d) in zip(lh, lc):
        assert a == pytest.approx(c, rel=1e-5)
    assert_params_equal(th, tc, atol=1e-5)


def test_cached_training_multi_device_dp(dataset, tmp_path):
    """8-device data parallelism over the replicated cache: losses match
    the 8-device HOST-loader run (same topology — isolates the cache
    contract from cross-device reduction ordering, which
    test_dp_loss_matches_single_device already pins for the host path)."""
    th, lh = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "h", n_devices=8, bs=1)
    tc, lc = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "c", n_devices=8, bs=1,
                         cache_on_device=True, steps_per_execution=2)
    for (a, b), (c, d) in zip(lh, lc):
        assert a == pytest.approx(c, rel=1e-5)
        assert b == pytest.approx(d, rel=1e-5)
    assert_params_equal(th, tc, atol=1e-5)


def _leading_axis_spec(x):
    spec = x.sharding.spec
    return spec[0] if len(spec) else None


def test_sharded_cache_training_identical(dataset, tmp_path):
    """device_cache_layout='sharded': the dataset rows live sharded over
    the data axis (1/8th per device, zero-padded to divide evenly), and
    training matches the 8-device HOST-loader run. XLA lowers the in-step
    gather to a masked local gather + batch all-reduce; the non-owner
    partials are exact zeros, so batches are bit-identical."""
    th, lh = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "h", n_devices=8, bs=1)
    tc, lc = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "c", n_devices=8, bs=1,
                         cache_on_device=True, steps_per_execution=2,
                         device_cache_layout="sharded")
    cache = tc._train_cache
    assert cache is not None
    for leaf in jax.tree_util.tree_leaves((cache.data, cache.masks)):
        assert _leading_axis_spec(leaf) == "data"
        assert leaf.shape[0] == 40  # 37 padded to a multiple of 8
        # each device holds one 1/8th row shard
        assert leaf.addressable_shards[0].data.shape[0] == 5
    for (a, b), (c, d) in zip(lh, lc):
        assert a == pytest.approx(c, rel=1e-5)
        assert b == pytest.approx(d, rel=1e-5)
    assert_params_equal(th, tc, atol=1e-5)


def test_sharded_cache_matches_replicated_exactly(dataset, tmp_path):
    """Same mesh, same seeds: the sharded layout reproduces the
    replicated layout's losses and params BIT-identically (the layouts
    must be pure placement choices, not semantic ones)."""
    tr, lr = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "r", n_devices=8, bs=1,
                         cache_on_device=True, steps_per_execution=2,
                         device_cache_layout="replicated")
    ts, ls = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path / "s", n_devices=8, bs=1,
                         cache_on_device=True, steps_per_execution=2,
                         device_cache_layout="sharded")
    assert lr == ls
    assert_params_equal(tr, ts)


def test_sharded_cache_auto_budget_fallback(dataset, tmp_path, caplog):
    """auto layout degrades replicated -> sharded when only the sharded
    footprint fits the per-device budget (dataset ~1.3 KB here; budget
    set between est/8 and est)."""
    est = estimate_dataset_nbytes(dataset)
    with caplog.at_level(logging.INFO,
                         logger="multivae_tpu.data.device_cache"):
        tc, lc = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                             tmp_path, n_epochs=1, n_devices=8, bs=1,
                             cache_on_device=True, with_eval=False,
                             device_cache_budget_gb=(est / 2) / 1e9)
    cache = tc._train_cache
    assert cache is not None
    for leaf in jax.tree_util.tree_leaves(cache.data):
        assert _leading_axis_spec(leaf) == "data"
    assert any("caching row-SHARDED" in r.message for r in caplog.records)
    assert np.isfinite(lc[0][0])


def test_cache_layout_validation(dataset):
    """Both the config and the public build API reject layout typos
    loudly instead of silently falling into 'auto'."""
    with pytest.raises(AttributeError, match="device_cache_layout"):
        BaseTrainerConfig(device_cache_layout="row-sharded")
    with pytest.raises(ValueError, match="device cache layout"):
        build_device_cache(dataset, get_data_mesh(1), 10**9,
                           layout="Sharded")


def test_sharded_cache_2d_mesh(dataset, tmp_path):
    """On a 2-D (data, model) mesh the cache shards rows over the DATA
    axis only (replicated across the model axis): 4-way row shards on a
    4x2 mesh, and training still runs finite with tensor parallelism."""
    tc, lc = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                         tmp_path, n_epochs=1, n_devices=4, bs=2,
                         n_model_devices=2, cache_on_device=True,
                         device_cache_layout="sharded", with_eval=False)
    cache = tc._train_cache
    assert cache is not None
    for leaf in jax.tree_util.tree_leaves(cache.data):
        assert _leading_axis_spec(leaf) == "data"
        assert leaf.shape[0] == 40  # 37 padded to a multiple of 4
        assert leaf.addressable_shards[0].data.shape[0] == 10
    assert np.isfinite(lc[0][0])


def test_sharded_cache_incomplete_dataset(incomplete_dataset, tmp_path):
    """Masks ride the sharded cache too (MVAE subset sampling on
    incomplete data, 8-device DP)."""
    cfg = MVAEConfig(n_modalities=2, latent_dim=4,
                     input_dims={"mod1": (2,), "mod2": (3,)})
    th, lh = run_trainer(MVAE(cfg, seed=0), incomplete_dataset,
                         tmp_path / "h", n_devices=8, bs=1)
    tc, lc = run_trainer(MVAE(cfg, seed=0), incomplete_dataset,
                         tmp_path / "c", n_devices=8, bs=1,
                         cache_on_device=True,
                         device_cache_layout="sharded")
    assert tc._train_cache.incomplete is True
    for (a, b), (c, d) in zip(lh, lc):
        assert a == pytest.approx(c, rel=1e-5)
    assert_params_equal(th, tc, atol=1e-5)


# --------------------------------------------------------------- fallbacks
def test_cache_budget_fallback(dataset, tmp_path, caplog):
    """Over-budget datasets fall back to the host loader with a logged
    reason; training still runs."""
    with caplog.at_level(logging.WARNING,
                         logger="multivae_tpu.data.device_cache"):
        t, losses = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                                tmp_path, n_epochs=1,
                                cache_on_device=True,
                                device_cache_budget_gb=1e-9)
    assert t._train_cache is None
    assert any("exceeds the device cache budget" in r.message
               for r in caplog.records)
    assert np.isfinite(losses[0][0])


def test_eval_cache_independent_of_train_fallback(dataset, tmp_path):
    """A train set over the HBM budget must not cost the (smaller) eval
    set its device cache: the eval cache budgets independently. The
    budget is set so the big train set doesn't fit in ANY layout (the
    trainer's default mesh here spans the 8 virtual test devices, so an
    over-budget-replicated set may legitimately cache row-SHARDED —
    est/8 per device — which is test_sharded_cache_auto_budget_fallback's
    subject, not this test's)."""
    rng = np.random.default_rng(2)
    big = MultimodalBaseDataset({
        "mod1": rng.normal(size=(N * 100, 2)).astype(np.float32),
        "mod2": rng.normal(size=(N * 100, 3)).astype(np.float32),
    })
    budget_gb = (estimate_dataset_nbytes(dataset) * 2) / 1e9
    assert estimate_dataset_nbytes(big) > budget_gb * 1e9 * 8
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=1,
        per_device_train_batch_size=8, per_device_eval_batch_size=8,
        learning_rate=1e-3, seed=0, cache_on_device=True,
        device_cache_budget_gb=budget_gb)
    t = BaseTrainer(MVTCAE(model_config(), seed=0), big,
                    eval_dataset=dataset, training_config=cfg)
    assert t._train_cache is None  # big set over budget -> host loader
    assert t._eval_cache is not None  # small eval set still cached
    loss, _ = t.eval_step(1)
    assert np.isfinite(loss)


def test_cache_unindexable_dataset_fallback(tmp_path, caplog):
    """Datasets that fail bulk indexing fall back gracefully."""

    class NoBulk(MultimodalBaseDataset):
        def get_batch(self, indices):
            if len(indices) > 2:
                raise RuntimeError("streaming only")
            return super().get_batch(indices)

    rng = np.random.default_rng(0)
    ds = NoBulk({"mod1": rng.normal(size=(N, 2)).astype(np.float32),
                 "mod2": rng.normal(size=(N, 3)).astype(np.float32)})
    mesh = get_data_mesh(1)
    with caplog.at_level(logging.WARNING,
                         logger="multivae_tpu.data.device_cache"):
        cache = build_device_cache(ds, mesh, 10**9, chunk=16)
    assert cache is None


def test_cache_leaves_stored_2d_and_gather_restores_shapes():
    """Perf contract: cache data leaves upload FLATTENED to
    (n, prod(dims)) — TPU tiling pads the minor-most dim to 128 lanes,
    so a 4-D image cache like (n, 3, 32, 32) would occupy and stream
    ~4x its logical bytes on every per-step row gather (measured 3.2x
    cached-scan slowdown, r4). gather() must hand back the original
    modality shapes and values."""
    rng = np.random.default_rng(5)
    data = {
        "img": rng.normal(size=(N, 3, 32, 32)).astype(np.float32),
        "vec": rng.normal(size=(N, 7)).astype(np.float32),
    }
    ds = MultimodalBaseDataset(data)
    mesh = get_data_mesh(1)
    cache = build_device_cache(ds, mesh, budget_bytes=1 << 30)
    assert cache is not None
    for leaf in jax.tree_util.tree_leaves(cache.data):
        assert leaf.ndim == 2, leaf.shape
    idx = np.array([[0, 5, N - 1]], dtype=np.int32)[0]
    batch = cache.gather(idx, np.ones(3, np.float32))
    assert batch.data["img"].shape == (3, 3, 32, 32)
    assert batch.data["vec"].shape == (3, 7)
    np.testing.assert_array_equal(np.asarray(batch.data["img"]),
                                  data["img"][idx])
    np.testing.assert_array_equal(np.asarray(batch.data["vec"]),
                                  data["vec"][idx])


def test_estimate_dataset_nbytes(dataset):
    est = estimate_dataset_nbytes(dataset)
    # 2 f32 modalities (2 + 3 floats) + int labels
    assert est >= N * (5 * 4)


def test_steps_per_execution_validation():
    with pytest.raises(AttributeError):
        BaseTrainerConfig(steps_per_execution=0)
    with pytest.raises(AttributeError):
        BaseTrainerConfig(steps_per_execution=4)  # needs cache_on_device
    BaseTrainerConfig(steps_per_execution=4, cache_on_device=True)


def test_device_cached_loader_matches_host_loader(dataset):
    """DeviceCachedLoader yields batches bit-identical to the host
    DataLoader (same epoch_plan)."""
    from multivae_tpu.data.device_cache import DeviceCachedLoader

    mesh = get_data_mesh(1)
    cache = build_device_cache(dataset, mesh, 10**9)
    host = DataLoader(dataset, 8, shuffle=False)
    cached = DeviceCachedLoader(DataLoader(dataset, 8, shuffle=False),
                                cache)
    hb, cb = list(host), list(cached)
    assert len(hb) == len(cb)
    for a, b in zip(hb, cb):
        for m in a.data:
            np.testing.assert_array_equal(np.asarray(a.data[m]),
                                          np.asarray(b.data[m]))
        np.testing.assert_array_equal(np.asarray(a.weights),
                                      np.asarray(b.weights))
        np.testing.assert_array_equal(np.asarray(a.labels),
                                      np.asarray(b.labels))


def test_evaluator_device_cache_identical_metrics(dataset):
    """Evaluators with the HBM-resident test set produce the same
    metrics as with the host loader (coherence + likelihoods)."""
    import jax.numpy as jnp

    from multivae_tpu.data.device_cache import DeviceCachedLoader
    from multivae_tpu.metrics import (
        CoherenceEvaluator,
        CoherenceEvaluatorConfig,
        LikelihoodsEvaluator,
        LikelihoodsEvaluatorConfig,
    )

    model = MVTCAE(model_config(), seed=0)
    rng = np.random.default_rng(7)
    W1 = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    clfs = {"mod1": lambda x: x @ W1, "mod2": lambda x: x @ W2}

    results = {}
    for cached in (False, True):
        model.set_seed(3)
        ev = CoherenceEvaluator(
            model, clfs, dataset,
            eval_config=CoherenceEvaluatorConfig(
                batch_size=len(dataset), num_classes=3,
                cache_on_device=cached))
        assert isinstance(ev.test_loader, DeviceCachedLoader) == cached
        ev.cross_coherences()
        results[cached] = dict(ev.metrics)
    assert results[False] == results[True]

    nlls = {}
    for cached in (False, True):
        model.set_seed(3)
        ev = LikelihoodsEvaluator(
            model, dataset,
            eval_config=LikelihoodsEvaluatorConfig(
                batch_size=16, num_samples=16, batch_size_k=8,
                cache_on_device=cached))
        nlls[cached] = ev.joint_nll()
    assert nlls[False] == pytest.approx(nlls[True], rel=1e-6)


def test_evaluator_cache_composes_with_sharded_eval(dataset):
    """cache_on_device + n_devices: the evaluator gathers test batches
    from the device cache AND partitions its metric programs over the
    data mesh — same metrics as the sharded host-loader path."""
    import jax.numpy as jnp

    from multivae_tpu.data.device_cache import DeviceCachedLoader
    from multivae_tpu.metrics import (
        CoherenceEvaluator,
        CoherenceEvaluatorConfig,
    )

    model = MVTCAE(model_config(), seed=0)
    rng = np.random.default_rng(7)
    W1 = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    clfs = {"mod1": lambda x: x @ W1, "mod2": lambda x: x @ W2}

    results = {}
    for cached in (False, True):
        model.set_seed(3)
        ev = CoherenceEvaluator(
            model, clfs, dataset,
            eval_config=CoherenceEvaluatorConfig(
                batch_size=16, num_classes=3, n_devices=8,
                cache_on_device=cached))
        assert isinstance(ev.test_loader, DeviceCachedLoader) == cached
        ev.cross_coherences()
        results[cached] = dict(ev.metrics)
    assert results[False] == results[True]


def test_cached_full_train_loop_saves_model(dataset, tmp_path):
    """The full train() loop (callbacks, best-model, final save) works on
    the cached path."""
    import os

    t, _ = run_trainer(MVTCAE(model_config(), seed=0), dataset,
                       tmp_path, n_epochs=1, cache_on_device=True)
    t.train()
    final = os.path.join(t.training_dir, "final_model")
    assert os.path.isdir(final)
