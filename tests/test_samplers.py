"""Tests for GMM / MAF / IAF samplers and AutoModel."""

import numpy as np
import pytest

import jax

from model_test_utils import DIMS, make_dataset
from multivae_tpu.models import (
    AutoModel,
    MMVAEPlus,
    MMVAEPlusConfig,
    MVTCAE,
    MVTCAEConfig,
)
from multivae_tpu.samplers import (
    GaussianMixtureSampler,
    GaussianMixtureSamplerConfig,
    IAFSampler,
    MAFSampler,
    MAFSamplerConfig,
)

LATENT = 4


@pytest.fixture
def model():
    return MVTCAE(MVTCAEConfig(n_modalities=3, latent_dim=LATENT,
                               input_dims=DIMS))


@pytest.fixture
def multilatent_model():
    return MMVAEPlus(MMVAEPlusConfig(
        n_modalities=3, latent_dim=LATENT, input_dims=DIMS, K=2,
        modalities_specific_dim=3,
    ))


def test_gmm_sampler_fit_and_sample(model):
    ds = make_dataset("complete", n=20)
    sampler = GaussianMixtureSampler(
        model, GaussianMixtureSamplerConfig(n_components=3))
    sampler.fit(ds)
    out = sampler.sample(11)
    assert out.z.shape == (11, LATENT)
    assert out.one_latent_space
    decoded = model.decode(out, "mod1")
    assert decoded.mod1.shape == (11, *DIMS["mod1"])


def test_gmm_sampler_multilatent(multilatent_model):
    ds = make_dataset("complete", n=20)
    sampler = GaussianMixtureSampler(
        multilatent_model, GaussianMixtureSamplerConfig(n_components=2))
    sampler.fit(ds)
    out = sampler.sample(5)
    assert not out.one_latent_space
    assert out.modalities_z["mod2"].shape == (5, 3)
    decoded = multilatent_model.decode(out, "mod2")
    assert decoded.mod2.shape == (5, *DIMS["mod2"])


def test_gmm_sampler_unfitted_raises(model):
    sampler = GaussianMixtureSampler(model)
    with pytest.raises(ArithmeticError):
        sampler.sample(3)


def test_gmm_reduces_components_when_few_samples(model):
    ds = make_dataset("complete", n=4)
    sampler = GaussianMixtureSampler(
        model, GaussianMixtureSamplerConfig(n_components=10))
    sampler.fit(ds)
    assert sampler.n_components == 4


@pytest.mark.parametrize("sampler_cls", [MAFSampler, IAFSampler])
def test_flow_samplers(model, sampler_cls, tmp_path):
    ds = make_dataset("complete", n=20)
    cfg_kwargs = dict(n_made_blocks=1, hidden_size=16, n_hidden_in_made=1)
    cfg = (MAFSamplerConfig(**cfg_kwargs) if sampler_cls is MAFSampler
           else None)
    sampler = sampler_cls(model, cfg)
    sampler.fit(ds, num_epochs=2, batch_size=10)
    out = sampler.sample(7)
    assert out.z.shape == (7, LATENT)
    assert np.all(np.isfinite(np.asarray(out.z)))

    # save / reload flows
    d = str(tmp_path / "sampler")
    sampler.save(d)
    sampler2 = sampler_cls(model, cfg)
    sampler2.load_flows_from_folder(d)
    assert sampler2.is_fitted
    out2 = sampler2.sample(3, rng=jax.random.key(0))
    out3 = sampler.sample(3, rng=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out2.z), np.asarray(out3.z),
                               rtol=1e-5, atol=1e-6)


def test_collect_latents_device_matches_per_batch_encode(model):
    """The scanned device collection must produce the same latents as
    the reference-shaped per-batch host encode loop (same per-batch rng
    keys), including dropping the padded tail of the last batch."""
    from multivae_tpu.data.loader import DataLoader

    ds = make_dataset("complete", n=23)  # 23 % 8 != 0: exercises padding
    sampler = MAFSampler(model, MAFSamplerConfig(
        n_made_blocks=1, hidden_size=8, n_hidden_in_made=1))
    key = jax.random.key(7)
    z_dev, mods = sampler._collect_latents(ds, batch_size=8, rng=key,
                                           device=True)
    assert mods is None
    assert z_dev.shape == (23, LATENT)

    loader = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False)
    keys = jax.random.split(key, len(loader))
    rows = []
    for i, batch in enumerate(loader):
        out = model.encode(batch, rng=keys[i])
        rows.append(np.asarray(out.z)[np.asarray(batch.weights) > 0])
    np.testing.assert_allclose(np.asarray(z_dev), np.concatenate(rows),
                               rtol=1e-5, atol=1e-6)


def test_collect_latents_device_multilatent(multilatent_model):
    ds = make_dataset("complete", n=12)
    sampler = MAFSampler(multilatent_model, MAFSamplerConfig(
        n_made_blocks=1, hidden_size=8, n_hidden_in_made=1))
    z, mods = sampler._collect_latents(ds, batch_size=6,
                                       rng=jax.random.key(0), device=True)
    assert z.shape == (12, LATENT)
    assert set(mods) == set(DIMS)
    assert mods["mod1"].shape == (12, 3)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in mods.values())


def test_sampler_reuses_trainer_device_cache(model, tmp_path):
    """A single-device trainer cache is shared onto the dataset so a
    post-training sampler fit doesn't upload a SECOND full HBM copy;
    release_sampler_cache drops the sampler's pin."""
    from multivae_tpu.data import release_sampler_cache
    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    ds = make_dataset("complete", n=20)
    cfg = BaseTrainerConfig(output_dir=str(tmp_path), num_epochs=1,
                            per_device_train_batch_size=10,
                            cache_on_device=True, n_devices=1)
    trainer = BaseTrainer(model, ds, training_config=cfg)
    assert trainer._train_cache is not None
    assert ds._sampler_device_cache is trainer._train_cache

    sampler = MAFSampler(model, MAFSamplerConfig(
        n_made_blocks=1, hidden_size=8, n_hidden_in_made=1))
    z, _ = sampler._collect_latents(ds, batch_size=10, device=True)
    assert z.shape == (20, LATENT)
    # no second cache was built: the memo still IS the trainer's
    assert ds._sampler_device_cache is trainer._train_cache
    assert release_sampler_cache(ds)
    assert ds._sampler_device_cache is None
    assert not release_sampler_cache(ds)


def test_collect_latents_incomplete_mixture_model_still_raises():
    """Mixture-selection models (MoE subset draw is per-BATCH, not
    per-sample) keep model.encode's availability semantics on incomplete
    data: the device path declines and the host loop raises."""
    from multivae_tpu.models import MMVAE, MMVAEConfig

    moe = MMVAE(MMVAEConfig(n_modalities=3, latent_dim=LATENT,
                            input_dims=DIMS, K=1))
    ds = make_dataset("incomplete", n=16)
    sampler = MAFSampler(moe, MAFSamplerConfig(
        n_made_blocks=1, hidden_size=8, n_hidden_in_made=1))
    with pytest.raises(AttributeError):
        sampler._collect_latents(ds, batch_size=8, device=True)


def test_collect_latents_incomplete_device_matches_host_encode(model):
    """Incomplete datasets: the device collection conditions each row on
    ITS available modalities through the masked-subset encode — equal to
    a per-batch ``model.encode(..., ignore_incomplete=True)`` host loop
    with matched keys (the public-API expression of the same per-sample
    masked PoE). VERDICT r4 task #3."""
    from multivae_tpu.data.loader import DataLoader

    ds = make_dataset("incomplete", n=23)  # padded last batch
    sampler = MAFSampler(model, MAFSamplerConfig(
        n_made_blocks=1, hidden_size=8, n_hidden_in_made=1))
    key = jax.random.key(11)
    z_dev, mods = sampler._collect_latents(ds, batch_size=8, rng=key,
                                           device=True)
    assert mods is None
    assert z_dev.shape == (23, LATENT)
    assert np.all(np.isfinite(np.asarray(z_dev)))

    loader = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False)
    keys = jax.random.split(key, len(loader))
    rows = []
    for i, batch in enumerate(loader):
        out = model.encode(batch, rng=keys[i], ignore_incomplete=True)
        rows.append(np.asarray(out.z)[np.asarray(batch.weights) > 0])
    np.testing.assert_allclose(np.asarray(z_dev), np.concatenate(rows),
                               rtol=1e-5, atol=1e-6)


def test_collect_latents_incomplete_host_loop_no_device(model):
    """The host fallback loop (device=False) also fits on incomplete
    data for per-sample-capable models instead of raising."""
    ds = make_dataset("incomplete", n=16)
    sampler = MAFSampler(model, MAFSamplerConfig(
        n_made_blocks=1, hidden_size=8, n_hidden_in_made=1))
    z, mods = sampler._collect_latents(ds, batch_size=8,
                                       rng=jax.random.key(0), device=False)
    assert z.shape == (16, LATENT)
    assert mods is None
    assert np.all(np.isfinite(z))


def test_collect_latents_incomplete_multilatent_per_sample():
    """DMVAE (per-row posterior-vs-prior select): device collection on
    incomplete data returns private codes drawn from the PRIOR on rows
    missing that modality (per_sample=True semantics, as in serving)."""
    from multivae_tpu.models import DMVAE, DMVAEConfig

    model = DMVAE(DMVAEConfig(n_modalities=3, latent_dim=LATENT,
                              input_dims=DIMS,
                              modalities_specific_dim={m: 3 for m in DIMS}))
    ds = make_dataset("incomplete", n=12)
    sampler = GaussianMixtureSampler(
        model, GaussianMixtureSamplerConfig(n_components=2))
    z, mods = sampler._collect_latents(ds, batch_size=6,
                                       rng=jax.random.key(3), device=True)
    assert z.shape == (12, LATENT)
    assert set(mods) == set(DIMS)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in mods.values())


def test_gmm_sampler_fit_on_incomplete_dataset(model):
    """End-to-end: a GMM sampler fit + sample on an IncompleteDataset
    (the library's marquee feature) works for PoE-family models."""
    ds = make_dataset("incomplete", n=20)
    sampler = GaussianMixtureSampler(
        model, GaussianMixtureSamplerConfig(n_components=2))
    sampler.fit(ds)
    out = sampler.sample(5)
    assert out.z.shape == (5, LATENT)
    assert np.all(np.isfinite(np.asarray(out.z)))


def test_maf_sampler_multilatent(multilatent_model):
    ds = make_dataset("complete", n=12)
    sampler = MAFSampler(multilatent_model, MAFSamplerConfig(
        n_made_blocks=1, hidden_size=8, n_hidden_in_made=1))
    sampler.fit(ds, num_epochs=1, batch_size=6)
    out = sampler.sample(4)
    assert out.z.shape == (4, LATENT)
    assert out.modalities_z["mod1"].shape == (4, 3)


def test_automodel_roundtrip(model, tmp_path):
    d = str(tmp_path / "m")
    model.save(d)
    loaded = AutoModel.load_from_folder(d)
    assert type(loaded).__name__ == "MVTCAE"
    same = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        model.params, loaded.params,
    ))
    assert same


def test_automodel_all_families(tmp_path):
    """Every registered family must round-trip through AutoModel."""
    from multivae_tpu.models import (
        CRMVAE, CRMVAEConfig, JMVAE, JMVAEConfig, MVAE, MVAEConfig,
    )

    for i, (cls, cfg_cls) in enumerate([
        (MVAE, MVAEConfig), (CRMVAE, CRMVAEConfig), (JMVAE, JMVAEConfig),
    ]):
        m = cls(cfg_cls(n_modalities=3, latent_dim=3, input_dims=DIMS))
        d = str(tmp_path / f"fam{i}")
        m.save(d)
        loaded = AutoModel.load_from_folder(d)
        assert type(loaded) is cls


# ------------------------------------------------- device GMM fit (ops/gmm)
def _blob_data(n_per=200, k=3, d=5, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 6.0
    scales = 0.5 + rng.uniform(size=(k, d))
    return np.concatenate([
        centers[i] + scales[i] * rng.normal(size=(n_per, d))
        for i in range(k)
    ]).astype(np.float32)


def test_fit_gmm_matches_sklearn_quality():
    """The device EM must reach the sklearn fit's mean log-likelihood on
    separable synthetic blobs (same algorithm, different RNG — quality
    parity, not bit parity)."""
    from sklearn import mixture

    from multivae_tpu.ops import gmm as gmm_ops

    X = _blob_data()
    params = gmm_ops.fit_gmm(X, 3, jax.random.key(0))
    assert int(params.n_iter) < 2000
    jax_lb = float(params.lower_bound)

    sk = mixture.GaussianMixture(n_components=3, covariance_type="full",
                                 max_iter=2000, tol=1e-3)
    sk.fit(X)
    sk_lb = float(sk.score(X))
    # Mean per-sample log-likelihood within 1% of sklearn's (both should
    # find the 3 blobs; EM local optima on this data coincide).
    assert jax_lb >= sk_lb - abs(sk_lb) * 0.01

    # score_samples agrees with the fitted params' own lower bound.
    scores = np.asarray(gmm_ops.score_samples(params, X))
    np.testing.assert_allclose(scores.mean(), jax_lb, rtol=1e-5)

    # Mixture weights recover the balanced blob structure.
    np.testing.assert_allclose(np.sort(np.asarray(params.weights)),
                               np.full(3, 1 / 3), atol=0.02)


def test_sample_gmm_moments():
    """Device sampling reproduces the fitted mixture's mean/covariance."""
    from multivae_tpu.ops import gmm as gmm_ops

    X = _blob_data(n_per=300, k=2, d=3, seed=1)
    params = gmm_ops.fit_gmm(X, 2, jax.random.key(0))
    draws = np.asarray(gmm_ops.sample_gmm(params, jax.random.key(1), 20000))
    assert draws.shape == (20000, 3)
    w = np.asarray(params.weights)
    mixture_mean = w @ np.asarray(params.means)
    np.testing.assert_allclose(draws.mean(axis=0), mixture_mean, atol=0.15)
    # Mixture covariance: E[Sigma] + Cov of the means.
    mus = np.asarray(params.means)
    covs = np.asarray(params.covariances)
    mix_cov = (w[:, None, None] * covs).sum(0)
    centered = mus - mixture_mean
    mix_cov += np.einsum("k,kd,ke->de", w, centered, centered)
    np.testing.assert_allclose(np.cov(draws.T), mix_cov, atol=0.4)


def test_gmm_sampler_backends_agree(model):
    """jax and sklearn fit backends produce samplers whose draws land in
    the same latent region (matching first moments). n=240: the two
    backends consume different encode noise (the jax backend collects
    latents with the scanned device path, sklearn with the host loop),
    so the fitted moments differ by the posterior scatter averaged over
    n — at n=60 that sampling noise alone strayed past the 0.3
    tolerance."""
    ds = make_dataset("complete", n=240)
    draws = {}
    for backend in ("jax", "sklearn"):
        sampler = GaussianMixtureSampler(
            model, GaussianMixtureSamplerConfig(
                n_components=2, fit_backend=backend))
        sampler.fit(ds)
        draws[backend] = np.asarray(sampler.sample(4000).z)
    np.testing.assert_allclose(draws["jax"].mean(axis=0),
                               draws["sklearn"].mean(axis=0), atol=0.3)
    np.testing.assert_allclose(draws["jax"].std(axis=0),
                               draws["sklearn"].std(axis=0), atol=0.3)


def test_gmm_sampler_repeated_draws_differ(model):
    ds = make_dataset("complete", n=20)
    sampler = GaussianMixtureSampler(
        model, GaussianMixtureSamplerConfig(n_components=2))
    sampler.fit(ds)
    a = np.asarray(sampler.sample(5).z)
    b = np.asarray(sampler.sample(5).z)
    assert not np.allclose(a, b)


def test_automodel_corrupted_config_raises(tmp_path):
    import json
    import os

    d = str(tmp_path / "bad")
    os.makedirs(d)
    with open(os.path.join(d, "model_config.json"), "w") as f:
        json.dump({"name": "NotARealConfig"}, f)
    with pytest.raises(NameError):
        AutoModel.load_from_folder(d)
