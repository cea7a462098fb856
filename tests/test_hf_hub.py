"""HF-hub push/load paths exercised against a monkeypatched
``huggingface_hub`` (no network): mirrors the reference's hub surface
(``base_model.py:213-375``, ``auto_model.py:116-232``) without requiring
a logged-in account.
"""

import json
import os
import shutil

import numpy as np
import pytest

from multivae_tpu.models import MVTCAE, MVTCAEConfig, AutoModel


def tiny_model(seed=0):
    return MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=3,
        input_dims={"m0": (4,), "m1": (5,)},
    ), seed=seed)


class FakeHub:
    """Stands in for the HF hub: push stores files, download serves them."""

    def __init__(self):
        self.repos = {}
        self.created_repos = []
        self.fail_first_commit = False

    def create_commit(self, commit_message, repo_id, operations):
        if self.fail_first_commit and repo_id not in self.repos:
            self.fail_first_commit = False
            raise RuntimeError("Repository Not Found")
        files = self.repos.setdefault(repo_id, {})
        for op in operations:
            with open(op.path_or_fileobj, "rb") as f:
                files[op.path_in_repo] = f.read()

    def create_repo(self, repo_id):
        self.created_repos.append(repo_id)
        self.repos.setdefault(repo_id, {})

    def hf_hub_download(self, repo_id, filename, local_dir):
        # serve from the first repo whose basename matches (create_repo
        # registers only the basename, like the real fallback path)
        for rid, files in self.repos.items():
            if filename in files and (
                    rid == repo_id
                    or os.path.basename(rid) == os.path.basename(repo_id)):
                path = os.path.join(local_dir, filename)
                with open(path, "wb") as f:
                    f.write(files[filename])
                return path
        raise FileNotFoundError(f"{repo_id}/{filename}")


@pytest.fixture
def fake_hub(monkeypatch):
    import huggingface_hub

    hub = FakeHub()
    monkeypatch.setattr(huggingface_hub.HfApi, "create_commit",
                        lambda self, **kw: hub.create_commit(**kw))
    monkeypatch.setattr(huggingface_hub, "create_repo",
                        lambda repo_id: hub.create_repo(repo_id))
    monkeypatch.setattr(huggingface_hub, "hf_hub_download",
                        lambda repo_id, filename, local_dir:
                        hub.hf_hub_download(repo_id, filename, local_dir))
    return hub


def test_push_uploads_model_files_and_card(fake_hub):
    model = tiny_model()
    model.push_to_hf_hub("user/test-repo")
    files = fake_hub.repos["user/test-repo"]
    assert "model_config.json" in files
    assert "model.msgpack" in files
    assert "README.md" in files
    cfg = json.loads(files["model_config.json"])
    assert cfg["name"] == "MVTCAEConfig"


def test_push_creates_repo_when_commit_fails(fake_hub):
    fake_hub.fail_first_commit = True
    model = tiny_model()
    model.push_to_hf_hub("user/new-repo")
    assert fake_hub.created_repos == ["new-repo"]
    # the retry after create_repo must have pushed the files
    files = fake_hub.repos["user/new-repo"]
    assert "model.msgpack" in files


def test_push_load_round_trip(fake_hub):
    model = tiny_model(seed=3)
    model.push_to_hf_hub("user/rt-repo")

    loaded = MVTCAE.load_from_hf_hub("user/rt-repo")
    assert loaded.model_config.latent_dim == 3
    import jax

    for a, b in zip(jax.tree.leaves(model.params),
                    jax.tree.leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_automodel_dispatches_from_hub_config(fake_hub):
    tiny_model().push_to_hf_hub("user/auto-repo")
    loaded = AutoModel.load_from_hf_hub("user/auto-repo")
    assert isinstance(loaded, MVTCAE)


def test_load_refuses_pickled_architectures_by_default(fake_hub, tmp_path):
    from multivae_tpu.nn import BaseAEConfig, Decoder_AE_MLP, Encoder_VAE_MLP

    dims = {"m0": (4,), "m1": (5,)}
    model = MVTCAE(
        MVTCAEConfig(n_modalities=2, latent_dim=3, input_dims=dims),
        encoders={m: Encoder_VAE_MLP(
            BaseAEConfig(input_dim=d, latent_dim=3), hidden_dim=16)
            for m, d in dims.items()},
        decoders={m: Decoder_AE_MLP(
            BaseAEConfig(input_dim=d, latent_dim=3), hidden_dim=16)
            for m, d in dims.items()},
    )
    model.push_to_hf_hub("user/pickled-repo")
    files = fake_hub.repos["user/pickled-repo"]
    assert any(f.endswith(".pkl") for f in files)
    with pytest.raises(RuntimeError, match="allow_pickle"):
        MVTCAE.load_from_hf_hub("user/pickled-repo")
    loaded = MVTCAE.load_from_hf_hub("user/pickled-repo", allow_pickle=True)
    assert isinstance(loaded, MVTCAE)


def test_push_without_hub_package_raises(monkeypatch):
    model = tiny_model()
    monkeypatch.setattr(type(model), "_hf_hub_is_available",
                        staticmethod(lambda: False))
    with pytest.raises(ModuleNotFoundError, match="huggingface_hub"):
        model.push_to_hf_hub("user/x")
    with pytest.raises(ModuleNotFoundError, match="huggingface_hub"):
        MVTCAE.load_from_hf_hub("user/x")
