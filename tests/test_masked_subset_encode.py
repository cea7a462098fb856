"""The shared masked-subset encode program (``BaseMultiVAE._encode_masked``):

PoE-family models encode ANY conditioning subset through one compiled XLA
program taking the subset as a traced (M,) indicator — the 2^M-1 subset
sweep of CoherenceEvaluator costs a single TPU compile instead of one per
subset. These tests pin (a) numerical agreement with the per-subset
reference path, (b) the one-program property, (c) the fallback when the
inputs don't carry every modality.
"""

import jax
import numpy as np
import pytest

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models import (
    CRMVAE,
    CRMVAEConfig,
    DMVAE,
    DMVAEConfig,
    MVAE,
    MVAEConfig,
    MVTCAE,
    MVTCAEConfig,
)

DIMS = {"m0": (3,), "m1": (4,), "m2": (5,)}


def make_models():
    kw = dict(n_modalities=3, latent_dim=4, input_dims=DIMS)
    return [
        MVTCAE(MVTCAEConfig(**kw), seed=0),
        CRMVAE(CRMVAEConfig(**kw), seed=0),
        MVAE(MVAEConfig(**kw), seed=0),
        DMVAE(DMVAEConfig(
            **kw, modalities_specific_dim={m: 3 for m in DIMS}), seed=0),
    ]


def make_data(n=6):
    rng = np.random.default_rng(0)
    return MultimodalBaseDataset(
        {m: rng.normal(size=(n, *d)).astype(np.float32)
         for m, d in DIMS.items()})


@pytest.mark.parametrize("model", make_models(),
                         ids=lambda m: type(m).__name__)
@pytest.mark.parametrize("cond", [("m0",), ("m0", "m2"),
                                  ("m0", "m1", "m2")])
def test_masked_path_matches_per_subset_path(model, cond):
    ds = make_data()
    batch = as_batch(ds[:])
    rng = jax.random.key(7)

    out_pub = model.encode(ds[:], cond_mod=list(cond), rng=rng)
    ref = model._encode_subset(
        model.params, batch, rng, cond_mod=cond, N=1,
        return_mean=False, flatten=False)
    np.testing.assert_allclose(np.asarray(out_pub.z), np.asarray(ref["z"]),
                               rtol=1e-5, atol=1e-5)
    if "modalities_z" in ref:
        for m in ref["modalities_z"]:
            np.testing.assert_allclose(
                np.asarray(out_pub.modalities_z[m]),
                np.asarray(ref["modalities_z"][m]), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("model", make_models(),
                         ids=lambda m: type(m).__name__)
def test_one_program_serves_all_subsets(model):
    ds = make_data()
    for cond in [["m0"], ["m1"], ["m2"], ["m0", "m1"], ["m1", "m2"], "all"]:
        model.encode(ds[:], cond_mod=cond)
    encode_keys = [k for k in model._jit_cache if k[0].startswith("encode")]
    assert encode_keys == [("encode_masked", 1, False, False)], encode_keys


def test_fallback_when_inputs_lack_modalities():
    model = make_models()[0]
    rng = np.random.default_rng(1)
    partial_ds = MultimodalBaseDataset(
        {"m0": rng.normal(size=(4, 3)).astype(np.float32)})
    out = model.encode(partial_ds[:], cond_mod="m0")
    assert out.z.shape == (4, 4)
    # the partial input cannot use the shared program
    assert ("encode", ("m0",), 1, False, False) in model._jit_cache


def test_masked_path_respects_n_and_mean():
    model = make_models()[0]
    ds = make_data()
    out = model.encode(ds[:], cond_mod=["m0", "m1"], N=3)
    assert out.z.shape == (3, 6, 4)
    m1 = model.encode(ds[:], cond_mod=["m0"], return_mean=True)
    m2 = model.encode(ds[:], cond_mod=["m0"], return_mean=True)
    np.testing.assert_array_equal(np.asarray(m1.z), np.asarray(m2.z))


def make_mopoe(**extra):
    from multivae_tpu.models import MoPoE, MoPoEConfig

    return MoPoE(MoPoEConfig(
        n_modalities=3, latent_dim=4, input_dims=DIMS, **extra), seed=0)


@pytest.mark.parametrize("extra", [{}, {"modalities_specific_dim": {"m0": 3, "m1": 3, "m2": 3}}],
                         ids=["shared", "multilatent"])
@pytest.mark.parametrize("cond", [("m0",), ("m0", "m2"),
                                  ("m0", "m1", "m2")])
def test_mopoe_masked_path_matches_per_subset_path(extra, cond):
    model = make_mopoe(**extra)
    ds = make_data()
    batch = as_batch(ds[:])
    rng = jax.random.key(11)

    out_pub = model.encode(ds[:], cond_mod=list(cond), rng=rng)
    ref = model._encode_subset(
        model.params, batch, rng, cond_mod=cond, N=1,
        return_mean=False, flatten=False)
    np.testing.assert_allclose(np.asarray(out_pub.z), np.asarray(ref["z"]),
                               rtol=1e-5, atol=1e-5)
    if "modalities_z" in ref:
        for m in ref["modalities_z"]:
            np.testing.assert_allclose(
                np.asarray(out_pub.modalities_z[m]),
                np.asarray(ref["modalities_z"][m]), rtol=1e-5, atol=1e-5)


def test_mopoe_masked_full_set_return_mean_quirk():
    """return_mean on the full subset returns the aggregate posterior mean
    (reference mopoe_model.py:352-415) through the masked program too."""
    model = make_mopoe()
    ds = make_data()
    batch = as_batch(ds[:])
    rng = jax.random.key(0)
    out = model.encode(ds[:], cond_mod="all", return_mean=True, rng=rng)
    ref = model._encode_subset(model.params, batch, rng,
                               cond_mod=("m0", "m1", "m2"), N=1,
                               return_mean=True, flatten=False)
    np.testing.assert_allclose(np.asarray(out.z), np.asarray(ref["z"]),
                               rtol=1e-5, atol=1e-5)


def test_mopoe_masked_path_refuses_unknown_subsets():
    """Restricted-subsets configs must still refuse unlisted subsets at the
    host boundary (validation lives in subset_indicator)."""
    model = make_mopoe(subsets=[["m0", "m1"], ["m2"]])
    ds = make_data()
    with pytest.raises(AttributeError, match="not in the model's subsets"):
        model.encode(ds[:], cond_mod=["m0", "m2"])
    out = model.encode(ds[:], cond_mod=["m0", "m1"])
    assert out.z.shape == (6, 4)


# ---------------------------------------------------------------- JMVAE
def make_jmvae():
    from multivae_tpu.models import JMVAE, JMVAEConfig

    return JMVAE(JMVAEConfig(
        n_modalities=3, latent_dim=4, input_dims=DIMS), seed=0)


@pytest.mark.parametrize("cond", [("m1",), ("m0", "m2"),
                                  ("m0", "m1", "m2")])
def test_jmvae_masked_path_matches_per_subset_path(cond):
    """Joint-encoder full set, masked exact-PoE subsets, unimodal
    singletons — all through the one traced-select program."""
    model = make_jmvae()
    ds = make_data()
    batch = as_batch(ds[:])
    rng = jax.random.key(5)
    out_pub = model.encode(ds[:], cond_mod=list(cond), rng=rng)
    ref = model._encode_subset(model.params, batch, rng, cond_mod=cond,
                               N=1, return_mean=False, flatten=False)
    np.testing.assert_allclose(np.asarray(out_pub.z), np.asarray(ref["z"]),
                               rtol=1e-5, atol=1e-6)


def test_jmvae_one_program():
    model = make_jmvae()
    ds = make_data()
    for cond in [["m0"], ["m0", "m1"], "all"]:
        model.encode(ds[:], cond_mod=cond)
    keys = [k for k in model._jit_cache if k[0].startswith("encode")]
    assert keys == [("encode_masked", 1, False, False)], keys


# ------------------------------------------------------------ MoE family
def make_moe_models():
    from multivae_tpu.models import (
        CMVAE,
        CMVAEConfig,
        MMVAE,
        MMVAEConfig,
        MMVAEPlus,
        MMVAEPlusConfig,
    )

    kw = dict(n_modalities=3, latent_dim=4, input_dims=DIMS,
              prior_and_posterior_dist="normal")
    return [
        MMVAE(MMVAEConfig(**kw, K=2), seed=0),
        MMVAEPlus(MMVAEPlusConfig(**kw, K=2, modalities_specific_dim=3),
                  seed=0),
        CMVAE(CMVAEConfig(**kw, K=2, modalities_specific_dim=3,
                          number_of_clusters=2), seed=0),
    ]


@pytest.mark.parametrize("model", make_moe_models(),
                         ids=lambda m: type(m).__name__)
@pytest.mark.parametrize("cond", [("m0",), ("m1",), ("m2",)])
def test_moe_masked_singleton_matches_per_subset_path(model, cond):
    """Singleton conditioning is selection-free: the masked program must
    reproduce the per-subset path exactly (same rng stream)."""
    ds = make_data()
    batch = as_batch(ds[:])
    rng = jax.random.key(3)
    out_pub = model.encode(ds[:], cond_mod=list(cond), rng=rng)
    ref = model._encode_subset(model.params, batch, rng, cond_mod=cond,
                               N=1, return_mean=False, flatten=False)
    np.testing.assert_allclose(np.asarray(out_pub.z), np.asarray(ref["z"]),
                               rtol=1e-5, atol=1e-6)
    if "modalities_z" in ref:
        for m in ref["modalities_z"]:
            np.testing.assert_allclose(
                np.asarray(out_pub.modalities_z[m]),
                np.asarray(ref["modalities_z"][m]), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("model", make_moe_models(),
                         ids=lambda m: type(m).__name__)
def test_moe_masked_expert_selection_stays_in_subset(model):
    """The categorical(log(subset)) expert draw: z must always be a sample
    of a SUBSET member's posterior, and both members must get picked."""
    import jax.numpy as jnp

    from multivae_tpu.ops.kdist import dist_rsample

    ds = make_data()
    batch = as_batch(ds[:])
    cond = ("m0", "m2")
    if hasattr(model, "_posteriors"):
        posts = model._posteriors(model.params, batch)
        cand = {m: posts[m]["u"] for m in DIMS}
    else:
        posts = model._posterior_params(model.params, batch)
        cand = {m: posts[m] for m in DIMS}

    chosen = set()
    for seed in range(8):
        rng = jax.random.key(seed)
        out = model.encode(ds[:], cond_mod=list(cond), rng=rng)
        # replay the masked program's rng splits to get sample_rng
        r, choice_rng, sample_rng = jax.random.split(rng, 3)
        matched = None
        for m in DIMS:
            zm = dist_rsample(sample_rng, model.dist_name, cand[m][0],
                              cand[m][1], K=1)
            if np.allclose(np.asarray(out.z), np.asarray(zm), atol=1e-5):
                matched = m
        assert matched in cond, f"expert {matched} outside subset {cond}"
        chosen.add(matched)
    assert chosen == set(cond), f"selection never hit {set(cond) - chosen}"


@pytest.mark.parametrize("model", make_moe_models(),
                         ids=lambda m: type(m).__name__)
def test_moe_one_program(model):
    ds = make_data()
    for cond in [["m0"], ["m1", "m2"], "all"]:
        model.encode(ds[:], cond_mod=cond)
    keys = [k for k in model._jit_cache if k[0].startswith("encode")]
    assert keys == [("encode_masked", 1, False, False)], keys


def test_mmvae_masked_return_mean_is_subset_mean():
    model = make_moe_models()[0]
    ds = make_data()
    batch = as_batch(ds[:])
    out = model.encode(ds[:], cond_mod=["m0", "m2"], return_mean=True)
    posts = model._posterior_params(model.params, batch)
    expect = (np.asarray(posts["m0"][0]) + np.asarray(posts["m2"][0])) / 2
    np.testing.assert_allclose(np.asarray(out.z), expect, rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------- MHVAE
def make_mhvae():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from mhvae_test_architectures import build_mhvae_blocks

    from multivae_tpu.models import MHVAE, MHVAEConfig

    enc, dec, bu, td, post, prior = build_mhvae_blocks(
        DIMS, n_latent=2, latent_dim=4)
    return MHVAE(MHVAEConfig(
        n_modalities=3, latent_dim=4, n_latent=2, input_dims=DIMS),
        encoders=enc, decoders=dec, bottom_up_blocks=bu,
        top_down_blocks=td, posterior_blocks=post, prior_blocks=prior,
        seed=0)


@pytest.mark.parametrize("cond", [("m1",), ("m0", "m2"),
                                  ("m0", "m1", "m2")])
def test_mhvae_masked_path_matches_per_subset_path(cond):
    """Level-wise PoE with indicator-zeroed experts must reproduce the
    per-subset hierarchy exactly (same rng stream per level)."""
    model = make_mhvae()
    ds = make_data()
    batch = as_batch(ds[:])
    rng = jax.random.key(9)
    out_pub = model.encode(ds[:], cond_mod=list(cond), rng=rng)
    ref = model._encode_subset(model.params, batch, rng, cond_mod=cond,
                               N=1, return_mean=False, flatten=False)
    np.testing.assert_allclose(np.asarray(out_pub.z), np.asarray(ref["z"]),
                               rtol=1e-5, atol=1e-6)
    for k in ref["all_z"]:
        np.testing.assert_allclose(
            np.asarray(out_pub.all_z[k]), np.asarray(ref["all_z"][k]),
            rtol=1e-5, atol=1e-6)


def test_mhvae_one_program():
    model = make_mhvae()
    ds = make_data()
    for cond in [["m0"], ["m0", "m2"], "all"]:
        model.encode(ds[:], cond_mod=cond)
    keys = [k for k in model._jit_cache if k[0].startswith("encode")]
    assert keys == [("encode_masked", 1, False, False)], keys


def test_dmvae_masked_path_matches_subset_path_on_incomplete_data():
    """Public-encode reference parity on INCOMPLETE batches: the masked
    program must reproduce _encode_subset exactly under ignore_incomplete
    (shared PoE per-row mask-zeroed, private codes from the posterior on
    every row — reference dmvae_model.py:269-277). The per-row
    posterior-vs-prior select is an explicit serving opt-in
    (per_sample=True), not the public-encode behavior."""
    from multivae_tpu.data import IncompleteDataset

    model = make_models()[3]
    assert type(model).__name__ == "DMVAE"
    rng_np = np.random.default_rng(2)
    n = 6
    data = {m: rng_np.normal(size=(n, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    masks = {"m0": np.ones(n, bool),
             "m1": rng_np.random(n) > 0.5,
             "m2": np.ones(n, bool)}
    ds = IncompleteDataset(data=data, masks=masks)
    batch = as_batch(ds[:])
    rng = jax.random.key(13)
    out_pub = model.encode(ds[:], cond_mod=["m0", "m1"], rng=rng,
                           ignore_incomplete=True)
    ref = model._encode_subset(model.params, batch, rng,
                               cond_mod=("m0", "m1"), N=1,
                               return_mean=False, flatten=False)
    np.testing.assert_allclose(np.asarray(out_pub.z), np.asarray(ref["z"]),
                               rtol=1e-5, atol=1e-5)
    for m in ref["modalities_z"]:
        np.testing.assert_allclose(
            np.asarray(out_pub.modalities_z[m]),
            np.asarray(ref["modalities_z"][m]), rtol=1e-5, atol=1e-5)
