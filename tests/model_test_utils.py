"""Shared fixtures/checks for per-model test files (mirrors the reference's
per-model test pattern, SURVEY §4)."""

import numpy as np

import jax

from multivae_tpu.data import IncompleteDataset, MultimodalBaseDataset
from multivae_tpu.data.batch import as_batch
from multivae_tpu.models.base.step import StepInfo

DIMS = {"mod1": (2,), "mod2": (3,), "mod3": (4,)}


def make_dataset(kind: str, n: int = 6, seed: int = 0):
    rng = np.random.default_rng(seed)
    data = {m: rng.normal(size=(n, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    labels = np.arange(n) % 2
    if kind == "complete":
        return MultimodalBaseDataset(data, labels=labels)
    masks = {
        "mod1": np.array([True] * (n // 2) + [False] * (n - n // 2)),
        "mod2": np.ones(n, bool),
        "mod3": np.array([True, False] * (n // 2) + [True] * (n % 2)),
    }
    return IncompleteDataset(data, masks=masks, labels=labels)


def check_forward_contract(model, dataset):
    out = model.forward(dataset[:])
    assert out.loss.shape == ()
    assert np.isfinite(float(out.loss)), float(out.loss)
    assert np.isfinite(float(out.loss_sum))
    assert isinstance(out.metrics, dict)
    return out


def check_zero_grads_for_missing_modality(model, missing="mod1", n=4):
    rng = np.random.default_rng(1)
    data = {m: rng.normal(size=(n, *d)).astype(np.float32)
            for m, d in DIMS.items()}
    masks = {m: (np.zeros(n, bool) if m == missing else np.ones(n, bool))
             for m in DIMS}
    ds = IncompleteDataset(data, masks)
    batch = as_batch(ds[:])

    def loss(params):
        return model.loss_function(
            params, batch, jax.random.key(0), StepInfo.create()
        )["loss"]

    grads = jax.grad(loss)(model.params)
    for g in jax.tree_util.tree_leaves(grads["encoders"][missing]):
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=5e-7)
    other = [m for m in DIMS if m != missing][0]
    total = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree_util.tree_leaves(grads["encoders"][other]))
    assert total > 0


def check_encode_shapes(model, dataset, latent_dim: int, n: int = 6):
    # N=1
    out = model.encode(dataset[:], "mod2")
    assert out.z.shape == (n, latent_dim)
    if model.multiple_latent_spaces:
        assert not out.one_latent_space
        assert set(out.modalities_z.keys()) == set(DIMS.keys())
    # N>1 flatten
    out = model.encode(dataset[:], ["mod2", "mod3"], N=3, flatten=True)
    assert out.z.shape == (3 * n, latent_dim)
    # N>1 no flatten
    out = model.encode(dataset[:], "all", N=2, flatten=False,
                       return_mean=True)
    assert out.z.shape == (2, n, latent_dim)


def check_predict_shapes(model, dataset, n: int = 6):
    out = model.predict(dataset[:], cond_mod="mod2", gen_mod="all")
    for m, d in DIMS.items():
        assert out[m].shape == (n, *d)
    out = model.predict(dataset[:], cond_mod="mod2", gen_mod="mod1", N=2)
    assert out.mod1.shape == (2, n, *DIMS["mod1"])


def check_joint_nll(model, n: int = 4):
    ds = make_dataset("complete", n=n, seed=7)
    nll = model.compute_joint_nll(ds[:], K=12, batch_size_K=5)
    assert np.isfinite(float(nll))
    return float(nll)


def check_save_load(model, cls, tmp_path):
    d = str(tmp_path / "saved")
    model.save(d)
    loaded = cls.load_from_folder(d)
    same = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        model.params, loaded.params,
    ))
    assert same

    # AutoModel must resolve the class from the saved config name
    # (reference ``auto_model.py:38-114``)
    from multivae_tpu.models import AutoModel

    auto = AutoModel.load_from_folder(d)
    assert type(auto) is type(model)
    return loaded
