"""Serving Predictor: fixed-shape compiled inference endpoint."""

import numpy as np
import pytest

from model_test_utils import DIMS, make_dataset
from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig, MVTCAE, MVTCAEConfig
from multivae_tpu.serving import Predictor

LATENT = 5


@pytest.fixture
def model():
    return MVTCAE(MVTCAEConfig(n_modalities=3, latent_dim=LATENT,
                               input_dims=DIMS), seed=0)


def test_predictor_shapes_and_padding(model):
    pred = Predictor(model, cond_mod=["mod1"], gen_mod="all",
                     batch_size=8).warmup()
    ds = make_dataset("complete")  # 6 samples < batch_size 8
    out = pred({"mod1": ds.data["mod1"]})
    for m in DIMS:
        assert out[m].shape == (6, *DIMS[m])
        assert np.isfinite(out[m]).all()


def test_predictor_rng_advances(model):
    pred = Predictor(model, cond_mod=["mod1"], gen_mod=["mod2"],
                     batch_size=4)
    x = {"mod1": np.random.default_rng(0).random((4, *DIMS["mod1"]),
                                                 dtype=np.float32)}
    a, b = pred(x), pred(x)
    assert not np.allclose(a.mod2, b.mod2)  # fresh posterior samples

    det = Predictor(model, cond_mod=["mod1"], gen_mod=["mod2"],
                    batch_size=4, deterministic=True)
    c, d = det(x), det(x)
    np.testing.assert_array_equal(np.asarray(c.mod2), np.asarray(d.mod2))


def test_predictor_rejects_oversize(model):
    pred = Predictor(model, cond_mod=["mod1"], gen_mod=["mod2"],
                     batch_size=2)
    with pytest.raises(ValueError):
        pred({"mod1": np.zeros((5, *DIMS["mod1"]), np.float32)})


def test_predictor_multilatent():
    model = MMVAEPlus(MMVAEPlusConfig(
        n_modalities=3, latent_dim=LATENT, input_dims=DIMS, K=2,
        modalities_specific_dim=3), seed=0)
    pred = Predictor(model, cond_mod=["mod1"], gen_mod="all", batch_size=4)
    x = {"mod1": np.zeros((3, *DIMS["mod1"]), np.float32)}
    out = pred(x)
    for m in DIMS:
        assert out[m].shape == (3, *DIMS[m])


def test_predictor_export_roundtrip(model, tmp_path):
    """jax.export serialization: the deserialized program reproduces the
    live predictor bit-for-bit on the same inputs."""
    import jax
    import numpy as np

    pred = Predictor(model, cond_mod=["mod1"], gen_mod=["mod2"],
                     batch_size=4, deterministic=True)
    path = pred.export(str(tmp_path / "endpoint.bin"))

    call = Predictor.load_exported(path)
    x = {"mod1": np.random.default_rng(0).random(
        (4, *DIMS["mod1"]), dtype=np.float32)}
    rng = jax.random.key(0)
    live = pred._call(model.params, x, rng)
    loaded = call(model.params, x, rng)
    np.testing.assert_array_equal(np.asarray(live["mod2"]),
                                  np.asarray(loaded["mod2"]))


def test_export_after_multi_device_training(tmp_path):
    """Exporting from a model trained on an N-device mesh must produce a
    topology-free artifact: sharded params used to leak a mesh into the
    exported program, and jax.export mis-recorded the typed PRNG key's
    rank-0 sharding vs its rank-1 key data (sdy verifier error at load
    time). Regression for the 8-virtual-device CI environment."""
    import jax

    from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

    model = MVTCAE(MVTCAEConfig(n_modalities=3, latent_dim=LATENT,
                                input_dims=DIMS), seed=0)
    ds = make_dataset("complete", n=16)
    BaseTrainer(model, ds, training_config=BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=1,
        per_device_train_batch_size=2, learning_rate=1e-3, seed=0,
        n_devices=8)).train()

    pred = Predictor(model, cond_mod=["mod1"], gen_mod=["mod2"],
                     batch_size=4, deterministic=True)
    path = pred.export(str(tmp_path / "endpoint.bin"))
    call = Predictor.load_exported(path)
    x = {"mod1": np.random.default_rng(0).random(
        (4, *DIMS["mod1"]), dtype=np.float32)}
    host_params = jax.tree.map(np.asarray, model.params)
    out = call(host_params, x, jax.random.key(0))
    assert np.isfinite(np.asarray(out["mod2"])).all()


# ------------------------------------------------------ AnySubsetPredictor
def test_any_subset_predictor_mixed_rows(model):
    """One compiled program serves per-ROW heterogeneous conditioning:
    each row's output must equal the matching per-subset Predictor's."""
    from multivae_tpu.serving import AnySubsetPredictor

    rng = np.random.default_rng(0)
    n = 6
    data = {m: rng.random((n, *DIMS[m]), dtype=np.float32) for m in DIMS}
    # rows 0-1: {mod1}; rows 2-3: {mod1, mod2}; rows 4-5: {mod2}
    masks = {
        "mod1": np.array([1, 1, 1, 1, 0, 0], np.float32),
        "mod2": np.array([0, 0, 1, 1, 1, 1], np.float32),
        "mod3": np.zeros(n, np.float32),
    }
    pred = AnySubsetPredictor(model, batch_size=8,
                              deterministic=True).warmup()
    out = pred({m: data[m] for m in ["mod1", "mod2"]},
               masks={m: masks[m] for m in ["mod1", "mod2"]})

    for rows, cond in [([0, 1], ["mod1"]), ([2, 3], ["mod1", "mod2"]),
                       ([4, 5], ["mod2"])]:
        ref = Predictor(model, cond_mod=cond, gen_mod="all", batch_size=8,
                        deterministic=True)(
            {m: data[m][rows] for m in cond})
        for m in DIMS:
            np.testing.assert_allclose(
                out[m][rows], np.asarray(ref[m]), rtol=1e-4, atol=1e-5,
                err_msg=f"rows {rows} cond {cond} gen {m}")


def test_any_subset_predictor_one_program(model):
    """Different conditioning patterns must NOT retrace."""
    from multivae_tpu.serving import AnySubsetPredictor

    pred = AnySubsetPredictor(model, batch_size=4, deterministic=True)
    x1 = {"mod1": np.zeros((2, *DIMS["mod1"]), np.float32)}
    x2 = {"mod2": np.zeros((3, *DIMS["mod2"]), np.float32)}
    pred(x1)
    n_compiles = pred._call._cache_size()
    pred(x2)
    pred({"mod1": np.zeros((1, *DIMS["mod1"]), np.float32),
          "mod3": np.zeros((1, *DIMS["mod3"]), np.float32)})
    assert pred._call._cache_size() == n_compiles == 1


def test_any_subset_predictor_refuses_empty_rows(model):
    from multivae_tpu.serving import AnySubsetPredictor

    pred = AnySubsetPredictor(model, batch_size=4)
    with pytest.raises(ValueError, match="at least one available"):
        pred({"mod1": np.zeros((2, *DIMS["mod1"]), np.float32)},
             masks={"mod1": np.array([1, 0], np.float32)})


def test_any_subset_predictor_refuses_moe_models():
    from multivae_tpu.models import MMVAE, MMVAEConfig
    from multivae_tpu.serving import AnySubsetPredictor

    moe = MMVAE(MMVAEConfig(n_modalities=3, latent_dim=LATENT,
                            input_dims=DIMS), seed=0)
    with pytest.raises(TypeError, match="per-sample"):
        AnySubsetPredictor(moe)


def test_any_subset_predictor_multilatent_per_row():
    """DMVAE: private codes must come from the posterior exactly on the
    rows where the modality is present, from the prior elsewhere."""
    from multivae_tpu.models import DMVAE, DMVAEConfig
    from multivae_tpu.serving import AnySubsetPredictor

    model = DMVAE(DMVAEConfig(
        n_modalities=3, latent_dim=LATENT, input_dims=DIMS,
        modalities_specific_dim={m: 2 for m in DIMS}), seed=0)
    rng = np.random.default_rng(1)
    n = 4
    data = {m: rng.random((n, *DIMS[m]), dtype=np.float32) for m in DIMS}
    masks = {"mod1": np.ones(n, np.float32),
             "mod2": np.array([1, 1, 0, 0], np.float32),
             "mod3": np.zeros(n, np.float32)}
    pred = AnySubsetPredictor(model, batch_size=4,
                              deterministic=True).warmup()
    out = pred({"mod1": data["mod1"], "mod2": data["mod2"]},
               masks={"mod1": masks["mod1"], "mod2": masks["mod2"]})
    ref12 = Predictor(model, cond_mod=["mod1", "mod2"], gen_mod="all",
                      batch_size=4, deterministic=True)(
        {"mod1": data["mod1"][:2], "mod2": data["mod2"][:2]})
    ref1 = Predictor(model, cond_mod=["mod1"], gen_mod="all",
                     batch_size=4, deterministic=True)(
        {"mod1": data["mod1"][2:]})
    for m in DIMS:
        np.testing.assert_allclose(out[m][:2], np.asarray(ref12[m]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out[m][2:], np.asarray(ref1[m]),
                                   rtol=1e-4, atol=1e-5)


def test_serving_request_validation(model):
    from multivae_tpu.serving import AnySubsetPredictor

    pred = Predictor(model, cond_mod=["mod1", "mod2"], gen_mod=["mod3"],
                     batch_size=4)
    with pytest.raises(ValueError, match="missing the compiled"):
        pred({"mod1": np.zeros((2, *DIMS["mod1"]), np.float32)})
    with pytest.raises(ValueError, match="Empty request"):
        pred({})

    any_pred = AnySubsetPredictor(model, batch_size=4)
    with pytest.raises(ValueError, match="Unknown modalities"):
        any_pred({"mod1": np.zeros((2, *DIMS["mod1"]), np.float32),
                  "typo": np.zeros((2, 3), np.float32)})
    with pytest.raises(ValueError, match="share the leading"):
        any_pred({"mod1": np.zeros((2, *DIMS["mod1"]), np.float32),
                  "mod2": np.zeros((3, *DIMS["mod2"]), np.float32)})
    with pytest.raises(ValueError, match="masks\\['mod1'\\]"):
        any_pred({"mod1": np.zeros((2, *DIMS["mod1"]), np.float32)},
                 masks={"mod1": np.ones(3, np.float32)})
    # a mask for a modality absent from data is rejected, not silently
    # treated as fully-absent (advisor r2 finding)
    with pytest.raises(ValueError, match="absent from data"):
        any_pred({"mod1": np.zeros((2, *DIMS["mod1"]), np.float32)},
                 masks={"mod2": np.ones(2, np.float32)})
