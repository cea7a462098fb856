"""Smoke test: the partial-PolyMNIST case-study shared config builds real
models at benchmark scale (structure only, no data)."""

import os
import sys

import pytest

CASE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "examples", "case_studies",
    "partial_polymnist",
)


@pytest.fixture
def gc():
    sys.path.insert(0, CASE_DIR)
    try:
        import global_config
        yield global_config
    finally:
        sys.path.remove(CASE_DIR)
        sys.modules.pop("global_config", None)


def test_base_config_matches_benchmark_protocol(gc):
    assert gc.base_config["latent_dim"] == 512
    assert gc.base_config["n_modalities"] == 5
    assert all(v == "laplace" for v in gc.base_config["decoders_dist"].values())
    assert gc.base_training_config["scheduler_cls"] == "ReduceLROnPlateau"


def test_model_builds_with_shared_nets(gc, tmp_path):
    from multivae_tpu.models import MVTCAE, MVTCAEConfig

    cfg = MVTCAEConfig(beta=2.5, alpha=5.0 / 6.0, **gc.base_config)
    model = MVTCAE(cfg, encoders=gc.make_encoders(),
                   decoders=gc.make_decoders(), seed=0)
    assert set(model.encoders) == set(gc.MODALITIES)

    args = gc.argument_parser().parse_args(["--seed", "3"])
    gc.SAVE_PATH = str(tmp_path)
    tcfg = gc.make_trainer_config(model, args, num_epochs=400)
    assert tcfg.num_epochs == 400
    assert tcfg.seed == 3
    assert "MVTCAE" in tcfg.output_dir
