"""WandbCallback / Evaluator wandb paths, exercised against a stub wandb
module (the real package is absent in this environment; the reference tests
skip these paths entirely — ``/root/reference/tests/test_trainer.py`` has no
wandb coverage either, so this goes beyond)."""

import sys
import types

import numpy as np
import pytest


class _StubRun:
    def __init__(self, **kw):
        self.kw = kw
        self.logged = []
        self.config = self
        self.updates = []

    def update(self, d):
        self.updates.append(d)

    def log(self, d):
        self.logged.append(d)

    def finish(self):
        self.finished = True


@pytest.fixture
def stub_wandb(monkeypatch):
    import importlib.machinery

    mod = types.ModuleType("wandb")
    mod.__spec__ = importlib.machinery.ModuleSpec("wandb", loader=None)
    mod.runs = []

    def init(**kw):
        run = _StubRun(**kw)
        mod.runs.append(run)
        return run

    mod.init = init
    # module-level wandb.log used by WandbCallback.on_log
    mod.logged = []
    mod.log = lambda d: mod.logged.append(d)
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_rename_logs():
    from multivae_tpu.trainers.base.callbacks import rename_logs

    out = rename_logs({"train_loss": 1.0, "eval_loss": 2.0, "other": 3.0})
    assert out == {"train/loss": 1.0, "eval/loss": 2.0}


def test_wandb_callback_setup_and_log(stub_wandb):
    from multivae_tpu.trainers import BaseTrainerConfig
    from multivae_tpu.trainers.base.callbacks import WandbCallback

    cb = WandbCallback()
    cfg = BaseTrainerConfig(output_dir="/tmp/x", num_epochs=1)
    cb.setup(cfg, project_name="proj", entity_name="ent")
    run = stub_wandb.runs[-1]
    assert run.kw["project"] == "proj" and run.kw["entity"] == "ent"
    assert any("training_config" in u for u in run.updates)

    cb.on_log(cfg, {"train_loss": 1.5}, global_step=3)
    assert stub_wandb.logged[-1]["train/loss"] == 1.5
    assert stub_wandb.logged[-1]["train/global_step"] == 3

    # resume path pins the run id
    cb2 = WandbCallback()
    cb2.setup(cfg, run_id="abc123")
    assert stub_wandb.runs[-1].kw["id"] == "abc123"
    assert stub_wandb.runs[-1].kw["resume"] == "must"


def test_evaluator_set_wandb_and_log(stub_wandb, tmp_path):
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.metrics import (Reconstruction, ReconstructionConfig)
    from multivae_tpu.models import MVTCAE, MVTCAEConfig

    rng = np.random.default_rng(0)
    ds = MultimodalBaseDataset(
        {"m0": rng.uniform(size=(8, 1, 8, 8)).astype(np.float32),
         "m1": rng.uniform(size=(8, 6)).astype(np.float32)})
    model = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"m0": (1, 8, 8), "m1": (6,)}))
    ev = Reconstruction(model, ds, output=str(tmp_path),
                        eval_config=ReconstructionConfig(
                            batch_size=8, metric="MSE"))
    ev.set_wandb("ent/proj/run7")
    run = stub_wandb.runs[-1]
    assert run.kw == {"entity": "ent", "project": "proj", "id": "run7",
                      "resume": "allow", "reinit": True}
    ev.eval()
    ev.log_to_wandb()
    assert run.logged and any("m0" in k for k in run.logged[-1])
    ev.finish()
    assert run.finished
