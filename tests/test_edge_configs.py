"""Degenerate / edge configurations: every knob at its boundary value must
still produce a finite loss and a working encode path (the K=1 sample-axis
bug showed these paths are easy to silently break)."""

import numpy as np
import pytest

from model_test_utils import DIMS, make_dataset
from multivae_tpu.models import (
    CMVAE,
    CMVAEConfig,
    CRMVAE,
    CRMVAEConfig,
    DMVAE,
    DMVAEConfig,
    JMVAE,
    JMVAEConfig,
    MMVAE,
    MMVAEConfig,
    MMVAEPlus,
    MMVAEPlusConfig,
    MVAE,
    MVAEConfig,
    MVTCAE,
    MVTCAEConfig,
    MoPoE,
    MoPoEConfig,
    Nexus,
    NexusConfig,
)

LATENT = 4
BASE = dict(n_modalities=3, latent_dim=LATENT, input_dims=DIMS)

EDGE_CASES = [
    # warmup=0: annealing must be pinned at its final value, not NaN
    ("mvae_warmup0", lambda: MVAE(MVAEConfig(warmup=0, **BASE))),
    ("jmvae_warmup0", lambda: JMVAE(JMVAEConfig(warmup=0, **BASE))),
    ("nexus_warmup0", lambda: Nexus(NexusConfig(
        warmup=0, msg_dim=3,
        modalities_specific_dim={m: 2 for m in DIMS}, **BASE))),
    # MVAE random-subset ELBOs enabled
    ("mvae_k2", lambda: MVAE(MVAEConfig(k=2, **BASE))),
    # MVAE without subset subsampling (pure joint ELBO)
    ("mvae_nosub", lambda: MVAE(MVAEConfig(use_subsampling=False, **BASE))),
    # MoPoE with an explicit subset list (not the 2^M default)
    ("mopoe_subsets", lambda: MoPoE(MoPoEConfig(
        subsets=[["mod1"], ["mod2", "mod3"]], **BASE))),
    # MoPoE with private latent spaces
    ("mopoe_private", lambda: MoPoE(MoPoEConfig(
        modalities_specific_dim={m: 2 for m in DIMS}, **BASE))),
    # two modalities only (minimum for a multimodal model)
    ("mvtcae_2mod", lambda: MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=LATENT,
        input_dims={k: DIMS[k] for k in ["mod1", "mod2"]}))),
    # alpha at its boundaries (loss terms drop out entirely)
    ("mvtcae_alpha0", lambda: MVTCAE(MVTCAEConfig(alpha=0.0, **BASE))),
    ("mvtcae_alpha1", lambda: MVTCAE(MVTCAEConfig(alpha=1.0, **BASE))),
    # beta=0: pure reconstruction
    ("dmvae_beta0", lambda: DMVAE(DMVAEConfig(
        beta=0.0, modalities_specific_dim={m: 2 for m in DIMS}, **BASE))),
    # MMVAE with a learned prior and normal posteriors
    ("mmvae_learnprior", lambda: MMVAE(MMVAEConfig(
        K=2, learn_prior=True, prior_and_posterior_dist="normal",
        loss="iwae_looser", **BASE))),
    # MMVAE+ with learned shared prior
    ("mmvaeplus_sharedprior", lambda: MMVAEPlus(MMVAEPlusConfig(
        K=2, modalities_specific_dim=2, learn_shared_prior=True, **BASE))),
    # MMVAE+ single-prior reconstruction option
    ("mmvaeplus_singleprior", lambda: MMVAEPlus(MMVAEPlusConfig(
        K=2, modalities_specific_dim=2,
        reconstruction_option="single_prior", **BASE))),
    # CMVAE with a single cluster (degenerate mixture prior)
    ("cmvae_1cluster", lambda: CMVAE(CMVAEConfig(
        K=2, modalities_specific_dim=2, number_of_clusters=1, **BASE))),
]


@pytest.mark.parametrize("name,build", EDGE_CASES,
                         ids=[n for n, _ in EDGE_CASES])
def test_edge_config_forward_and_encode(name, build):
    model = build()
    mods = list(model.encoders.keys())
    ds = make_dataset("complete")
    if model.model_config.n_modalities == 2:
        ds = make_dataset("complete")

    out = model.forward(ds[:])
    assert np.isfinite(float(out.loss)), name

    emb = model.encode(ds[:], cond_mod=mods[0])
    assert np.isfinite(np.asarray(emb.z)).all(), name


# Families that consume masked incomplete batches. MHVAE is covered in
# ``test_nexus_mhvae.py`` (conv-latent config).
ALL_MISSING_CASES = [
    ("mvae", lambda: MVAE(MVAEConfig(k=1, warmup=2, **BASE))),
    ("mopoe", lambda: MoPoE(MoPoEConfig(**BASE))),
    ("crmvae", lambda: CRMVAE(CRMVAEConfig(**BASE))),
    ("dmvae", lambda: DMVAE(DMVAEConfig(
        modalities_specific_dim={m: 2 for m in DIMS}, **BASE))),
    ("mvtcae", lambda: MVTCAE(MVTCAEConfig(**BASE))),
    ("jmvae", lambda: JMVAE(JMVAEConfig(**BASE))),
    ("mmvae", lambda: MMVAE(MMVAEConfig(K=2, **BASE))),
    ("mmvaeplus", lambda: MMVAEPlus(MMVAEPlusConfig(
        K=2, modalities_specific_dim=2, **BASE))),
    ("nexus", lambda: Nexus(NexusConfig(
        msg_dim=3, modalities_specific_dim={m: 2 for m in DIMS}, **BASE))),
    ("cmvae", lambda: CMVAE(CMVAEConfig(
        K=2, modalities_specific_dim=2, number_of_clusters=2, **BASE))),
]


@pytest.mark.parametrize("name,build", ALL_MISSING_CASES,
                         ids=[n for n, _ in ALL_MISSING_CASES])
def test_all_missing_row_keeps_loss_and_grads_finite(name, build):
    """A sample with NO available modality must not poison the batch.

    Regression: ``masked_poe``/``stable_poe`` used to give all-masked rows
    a ~1e-20 total precision, i.e. log_var ~ +46; the exp()-scale samples
    overflowed decoder intermediates and the backward pass turned the
    WHOLE batch's gradient to NaN. All-masked rows now fall back to the
    prior N(0, I). The reference never exercises this (its datasets keep
    >= 1 modality per sample), so graceful degradation is the contract.
    """
    import jax

    from multivae_tpu.data import IncompleteDataset
    from multivae_tpu.data.batch import as_batch
    from multivae_tpu.models.base.step import StepInfo

    n = 6
    rng = np.random.default_rng(3)
    data = {m: rng.normal(size=(n, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    # row 0 has NOTHING; remaining rows mix availability
    masks = {
        "mod1": np.array([False, True, False, True, True, False]),
        "mod2": np.array([False, True, True, False, True, True]),
        "mod3": np.array([False, False, True, True, False, True]),
    }
    ds = IncompleteDataset(data, masks=masks)
    batch = as_batch(ds[:])
    model = build()
    info = StepInfo.create(epoch=2, dataset_size=n)

    def loss_fn(p):
        return model.loss_function(p, batch, jax.random.key(11), info).loss

    loss, grads = jax.value_and_grad(loss_fn)(model.params)
    assert np.isfinite(float(loss)), (name, float(loss))
    # a plausible magnitude, not the 1e20-scale degenerate-posterior KL
    assert abs(float(loss)) < 1e9, (name, float(loss))
    bad = [k for k, v in
           jax.tree_util.tree_flatten_with_path(grads)[0]
           if not bool(np.isfinite(np.asarray(v)).all())]
    assert not bad, (name, bad[:5])
