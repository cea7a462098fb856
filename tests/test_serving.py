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
