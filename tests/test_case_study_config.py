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


# ----------------------------------------------- mmvaePlus_on_partial_data
MMVP_DIR = os.path.join(
    os.path.dirname(__file__), "..", "examples", "case_studies",
    "mmvae_plus_partial",
)


@pytest.fixture
def mmvp():
    sys.path.insert(0, MMVP_DIR)
    try:
        import train
        yield train
    finally:
        sys.path.remove(MMVP_DIR)
        sys.modules.pop("train", None)


def test_mmvae_plus_partial_protocol_config(mmvp):
    """The ported case study pins the reference's exact protocol
    (``mmvaePlus_on_partial_data/train.py:50-97``)."""
    cfg = mmvp.build_model_config()
    assert cfg.K == 1
    assert cfg.latent_dim == 32 and cfg.modalities_specific_dim == 32
    assert cfg.prior_and_posterior_dist == "laplace_with_softmax"
    assert cfg.learn_modality_prior and not cfg.learn_shared_prior
    assert cfg.beta == 2.5
    assert cfg.reconstruction_option == "joint_prior"
    assert all(v == "laplace" for v in cfg.decoders_dist.values())
    assert all(p == {"scale": 0.75} for p in cfg.decoder_dist_params.values())

    args = mmvp.argument_parser().parse_args(
        ["--missing_ratio", "0.2", "--keep_incomplete", "--seed", "1"])
    assert args.missing_ratio == 0.2 and args.keep_incomplete
    mmvp.SAVE_PATH = "/tmp/mmvp_case_study_test"
    tcfg = mmvp.build_trainer_config(args, num_epochs=3)
    assert tcfg.num_epochs == 3
    assert tcfg.scheduler_cls == "ReduceLROnPlateau"
    assert tcfg.scheduler_params == {"patience": 30}
    assert tcfg.per_device_train_batch_size == 32
    assert "keep_incomplete_True" in tcfg.output_dir
    assert "missing_ratio_0.2" in tcfg.output_dir


def test_mmvae_plus_partial_model_builds_and_steps(mmvp):
    """The resnet MMVAE+ the case study builds runs a real loss step on a
    tiny batch (structure + shapes, no dataset)."""
    import jax
    import numpy as np

    from multivae_tpu.data.batch import batch_from_arrays
    from multivae_tpu.models.base.step import StepInfo

    cfg = mmvp.build_model_config()
    model = mmvp.build_model(cfg, seed=0)
    assert set(model.encoders) == set(mmvp.MODALITIES)
    rng = np.random.default_rng(0)
    batch = batch_from_arrays(data={
        m: rng.uniform(size=(2, 3, 28, 28)).astype(np.float32)
        for m in mmvp.MODALITIES
    })
    out = jax.jit(model.loss_function)(
        model.params, batch, jax.random.key(0), StepInfo.create())
    assert np.isfinite(float(out["loss"]))
