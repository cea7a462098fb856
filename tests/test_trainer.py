"""Trainer tests, mirroring reference tests/test_trainer.py patterns."""

import os

import numpy as np
import pytest

import jax

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig
from multivae_tpu.trainers.base.optim import (
    ReduceLROnPlateau,
    StepLR,
    make_optimizer,
    make_scheduler,
)


@pytest.fixture
def dataset():
    rng = np.random.default_rng(0)
    data = {
        "mod1": rng.normal(size=(20, 2)).astype(np.float32),
        "mod2": rng.normal(size=(20, 3)).astype(np.float32),
    }
    return MultimodalBaseDataset(data)


@pytest.fixture
def model():
    config = MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"mod1": (2,), "mod2": (3,)},
    )
    return MVTCAE(config, seed=0)


def small_config(tmp_path, **kw):
    defaults = dict(
        output_dir=str(tmp_path), num_epochs=2,
        per_device_train_batch_size=8, per_device_eval_batch_size=8,
        learning_rate=1e-3, seed=3, n_devices=1,
    )
    defaults.update(kw)
    return BaseTrainerConfig(**defaults)


# ------------------------------------------------------------ config errors
def test_unknown_optimizer_raises():
    with pytest.raises(AttributeError):
        BaseTrainerConfig(optimizer_cls="NotAnOptimizer")


def test_bad_optimizer_params_raise():
    with pytest.raises(TypeError):
        BaseTrainerConfig(optimizer_cls="Adam",
                          optimizer_params={"not_a_param": 1.0})


def test_good_optimizer_params_accepted():
    cfg = BaseTrainerConfig(optimizer_cls="Adam",
                            optimizer_params={"betas": (0.9, 0.98)})
    assert cfg.optimizer_params == {"betas": (0.9, 0.98)}


def test_unknown_scheduler_raises():
    with pytest.raises(AttributeError):
        BaseTrainerConfig(scheduler_cls="NotAScheduler")


def test_bad_scheduler_params_raise():
    with pytest.raises(TypeError):
        BaseTrainerConfig(scheduler_cls="StepLR",
                          scheduler_params={"bad": 1})


# --------------------------------------------------------------- schedulers
def test_step_lr_schedule():
    s = StepLR(1.0, step_size=2, gamma=0.1)
    lrs = [s.step() for _ in range(5)]
    np.testing.assert_allclose(lrs, [1.0, 0.1, 0.1, 0.01, 0.01])


def test_reduce_on_plateau():
    s = ReduceLROnPlateau(1.0, patience=1, factor=0.5)
    assert s.step(10.0) == 1.0   # first metric becomes best
    assert s.step(10.0) == 1.0   # bad epoch 1
    assert s.step(10.0) == 0.5   # bad epoch 2 > patience -> reduce
    assert s.step(1.0) == 0.5    # improvement


def test_adam_amsgrad_variant(model):
    """torch spells AMSGrad as Adam(amsgrad=True) — the reference MMVAE+
    reproduction uses it (``examples/mmvae_plus/mmnist.py``)."""
    import jax.numpy as jnp

    opt = make_optimizer("Adam", 1e-3, {"amsgrad": True})
    state = opt.init(model.params)
    grads = jax.tree.map(jnp.ones_like, model.params)
    updates, _ = opt.update(grads, state, model.params)
    assert jnp.isfinite(jax.tree_util.tree_leaves(updates)[0]).all()


def test_optimizer_state_roundtrip(model):
    import flax.serialization as ser

    opt = make_optimizer("Adam", 1e-3, {"betas": (0.9, 0.999)})
    state = opt.init(model.params)
    d = ser.to_state_dict(jax.tree.map(np.asarray, state))
    blob = ser.msgpack_serialize(d)
    restored = ser.from_state_dict(state, ser.msgpack_restore(blob))
    assert float(restored.hyperparams["learning_rate"]) == pytest.approx(1e-3)


# ------------------------------------------------------------- training runs
def test_training_reduces_loss(model, dataset, tmp_path):
    trainer = BaseTrainer(
        model, dataset, eval_dataset=dataset,
        training_config=small_config(tmp_path, num_epochs=5,
                                     learning_rate=1e-2),
    )
    l0, _ = trainer.train_step(1)
    for e in range(2, 6):
        le, _ = trainer.train_step(e)
    assert le < l0


def test_full_train_loop_saves_final_model(model, dataset, tmp_path):
    trainer = BaseTrainer(
        model, dataset, eval_dataset=dataset,
        training_config=small_config(tmp_path),
    )
    trainer.train()
    final = os.path.join(trainer.training_dir, "final_model")
    assert os.path.exists(os.path.join(final, "model.msgpack"))
    assert os.path.exists(os.path.join(final, "training_config.json"))

    loaded = MVTCAE.load_from_folder(final)
    assert loaded.model_config.latent_dim == 4


def test_checkpoint_saving_and_resume(model, dataset, tmp_path):
    cfg = small_config(tmp_path, num_epochs=2, steps_saving=1,
                       scheduler_cls="StepLR",
                       scheduler_params={"step_size": 1, "gamma": 0.5})
    trainer = BaseTrainer(model, dataset, eval_dataset=dataset,
                          training_config=cfg)
    trainer.train()
    ckpt = os.path.join(trainer.training_dir, "checkpoint_epoch_2")
    assert os.path.exists(os.path.join(ckpt, "optimizer.msgpack"))
    assert os.path.exists(os.path.join(ckpt, "scheduler.json"))
    assert os.path.exists(os.path.join(ckpt, "info_checkpoint.json"))

    # Resume for 2 more epochs
    cfg2 = small_config(tmp_path, num_epochs=4, steps_saving=None,
                        scheduler_cls="StepLR",
                        scheduler_params={"step_size": 1, "gamma": 0.5})
    model2 = MVTCAE(model.model_config, seed=0)
    trainer2 = BaseTrainer(model2, dataset, eval_dataset=dataset,
                           training_config=cfg2, checkpoint=ckpt)
    assert trainer2.trained_epochs == 2
    # resumed scheduler has already stepped twice
    assert trainer2.scheduler.last_epoch == 2
    trainer2.train()


def test_scheduler_changes_lr_during_training(model, dataset, tmp_path):
    cfg = small_config(tmp_path, num_epochs=3, learning_rate=1e-3,
                       scheduler_cls="ExponentialLR",
                       scheduler_params={"gamma": 0.1})
    trainer = BaseTrainer(model, dataset, training_config=cfg)
    assert trainer.current_learning_rate == pytest.approx(1e-3)
    trainer.train()
    assert trainer.current_learning_rate == pytest.approx(1e-6)


def test_predictions_are_generated(model, dataset, tmp_path):
    cfg = small_config(tmp_path, num_epochs=1, steps_predict=1)
    trainer = BaseTrainer(model, dataset, training_config=cfg)
    trainer.train()
    files = os.listdir(trainer.training_dir)
    assert any(f.startswith("recon_from_") and f.endswith(".png")
               for f in files)


def test_multi_device_data_parallel_training(model, dataset, tmp_path):
    """DP over the 8 virtual CPU devices (replaces the reference's env-var
    only DDP test, SURVEY §4)."""
    assert len(jax.devices()) == 8
    cfg = small_config(tmp_path, num_epochs=2, n_devices=8,
                       per_device_train_batch_size=2)
    trainer = BaseTrainer(model, dataset, eval_dataset=dataset,
                          training_config=cfg)
    assert trainer.n_data_devices == 8
    l1, _ = trainer.train_step(1)
    l2, _ = trainer.train_step(2)
    assert np.isfinite(l1) and np.isfinite(l2)


def test_dp_loss_matches_single_device(dataset, tmp_path):
    """The sharded loss must equal the single-device loss on the same batch."""
    cfg_model = MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"mod1": (2,), "mod2": (3,)},
    )
    m1 = MVTCAE(cfg_model, seed=5)
    m8 = MVTCAE(cfg_model, seed=5)

    t1 = BaseTrainer(m1, dataset, training_config=small_config(
        tmp_path, n_devices=1, per_device_train_batch_size=16, seed=11))
    t8 = BaseTrainer(m8, dataset, training_config=small_config(
        tmp_path, n_devices=8, per_device_train_batch_size=2, seed=11))

    l1, _ = t1.train_step(1)
    l8, _ = t8.train_step(1)
    assert l1 == pytest.approx(l8, rel=1e-4)


def test_sanity_check_catches_bad_data(model, tmp_path):
    rng = np.random.default_rng(1)
    bad = MultimodalBaseDataset({
        "mod1": rng.normal(size=(20, 7)).astype(np.float32),  # wrong dim
        "mod2": rng.normal(size=(20, 3)).astype(np.float32),
    })
    with pytest.raises(ValueError):
        BaseTrainer(model, bad, training_config=small_config(tmp_path))


def test_trainer_rejects_multistage_models(dataset, tmp_path):
    cfg = MVTCAEConfig(n_modalities=2, latent_dim=4,
                       input_dims={"mod1": (2,), "mod2": (3,)})
    m = MVTCAE(cfg)
    m.reset_optimizer_epochs = [2]
    with pytest.raises(AttributeError):
        BaseTrainer(m, dataset, training_config=small_config(tmp_path))


# --------------------------------------------------------- orbax checkpoints
def test_orbax_checkpoint_resume_matches_uninterrupted(model, dataset,
                                                       tmp_path):
    """checkpoint_backend='orbax': the sharded TrainState roundtrip resumes
    the EXACT optimization trajectory — 2 epochs + resume + 2 epochs ends
    with the same params as 4 uninterrupted epochs (optimizer moments, rng
    chain and step counter all restored, which the reference's
    best-model-only torch checkpoints cannot do)."""
    cfg = small_config(tmp_path / "a", num_epochs=2, steps_saving=2,
                       checkpoint_backend="orbax")
    trainer = BaseTrainer(model, dataset, eval_dataset=dataset,
                          training_config=cfg)
    trainer.train()
    ckpt = os.path.join(trainer.training_dir, "checkpoint_epoch_2")
    assert os.path.isdir(os.path.join(ckpt, "train_state"))

    model_resumed = MVTCAE(model.model_config, seed=0)
    cfg2 = small_config(tmp_path / "b", num_epochs=4,
                        checkpoint_backend="orbax")
    trainer2 = BaseTrainer(model_resumed, dataset, eval_dataset=dataset,
                           training_config=cfg2, checkpoint=ckpt)
    assert trainer2.trained_epochs == 2
    assert int(trainer2.state.step) == int(trainer.state.step)
    trainer2.train()

    model_straight = MVTCAE(model.model_config, seed=0)
    cfg3 = small_config(tmp_path / "c", num_epochs=4)
    trainer3 = BaseTrainer(model_straight, dataset, eval_dataset=dataset,
                           training_config=cfg3)
    trainer3.train()

    for a, b in zip(jax.tree_util.tree_leaves(trainer2.state.params),
                    jax.tree_util.tree_leaves(trainer3.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # optimizer moments restored too
    for a, b in zip(jax.tree_util.tree_leaves(trainer2.state.opt_state),
                    jax.tree_util.tree_leaves(trainer3.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_orbax_checkpoint_with_fsdp_sharded_state(dataset, tmp_path):
    """orbax saves/restores the ZeRO-sharded TrainState without a host
    gather: restored leaves keep their NamedSharding."""
    cfg_model = MVTCAEConfig(
        n_modalities=2, latent_dim=8,
        input_dims={"mod1": (2,), "mod2": (3,)},
    )
    model = MVTCAE(cfg_model, seed=0)
    cfg = small_config(tmp_path, num_epochs=1, steps_saving=1, n_devices=8,
                       per_device_train_batch_size=2, fsdp=True,
                       checkpoint_backend="orbax")
    trainer = BaseTrainer(model, dataset, eval_dataset=dataset,
                          training_config=cfg)
    trainer.train()
    ckpt = os.path.join(trainer.training_dir, "checkpoint_epoch_1")

    model2 = MVTCAE(cfg_model, seed=0)
    trainer2 = BaseTrainer(model2, dataset, eval_dataset=dataset,
                           training_config=small_config(
                               tmp_path / "r", num_epochs=2, n_devices=8,
                               per_device_train_batch_size=2, fsdp=True,
                               checkpoint_backend="orbax"),
                           checkpoint=ckpt)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    l2, _ = trainer2.train_step(2)
    assert np.isfinite(l2)


def test_orbax_restore_single_device_uncommitted(model, dataset, tmp_path):
    """On a single-device mesh the orbax-restored TrainState must be
    UNCOMMITTED: committed train-state inputs fall off the axon TPU
    plugin's fast execution path (measured 53 vs 4,184 steps/s; advisor
    r2 medium finding)."""
    cfg = small_config(tmp_path, num_epochs=1, steps_saving=1,
                       checkpoint_backend="orbax")
    trainer = BaseTrainer(model, dataset, training_config=cfg)
    trainer.train()
    ckpt = os.path.join(trainer.training_dir, "checkpoint_epoch_1")

    model2 = MVTCAE(model.model_config, seed=0)
    trainer2 = BaseTrainer(
        model2, dataset,
        training_config=small_config(tmp_path / "r", num_epochs=2,
                                     checkpoint_backend="orbax"),
        checkpoint=ckpt)
    for leaf in jax.tree_util.tree_leaves(trainer2.state):
        assert not getattr(leaf, "committed", False), (
            "orbax restore produced a COMMITTED array on a single-device "
            "mesh")


@pytest.mark.parametrize("async_ckpt", [True, False])
def test_orbax_async_checkpointing_durable_and_correct(model, dataset,
                                                       tmp_path, async_ckpt):
    """Async orbax saves must be DURABLE by the time train() returns
    (the end-of-train barrier) and restore to the exact saved state;
    async_checkpointing=False forces the blocking path."""
    cfg = small_config(tmp_path, num_epochs=3, steps_saving=1,
                       checkpoint_backend="orbax",
                       async_checkpointing=async_ckpt)
    trainer = BaseTrainer(model, dataset, training_config=cfg)
    trainer.train()
    for e in (1, 2, 3):
        d = os.path.join(trainer.training_dir,
                         f"checkpoint_epoch_{e}", "train_state")
        assert os.path.isdir(d), d
        # orbax commits atomically: a durable checkpoint has no
        # leftover temporary directory marker
        assert not any(".orbax-checkpoint-tmp" in n
                       for n in os.listdir(os.path.dirname(d)))

    ckpt = os.path.join(trainer.training_dir, "checkpoint_epoch_3")
    model2 = MVTCAE(model.model_config, seed=0)
    trainer2 = BaseTrainer(
        model2, dataset,
        training_config=small_config(tmp_path / "r", num_epochs=4,
                                     checkpoint_backend="orbax",
                                     async_checkpointing=async_ckpt),
        checkpoint=ckpt)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    loss, _ = trainer2.train_step(2)
    assert np.isfinite(loss)


def test_orbax_restore_cross_topology(dataset, tmp_path):
    """The operational point of sharded checkpoints: a TrainState saved on
    an (8-device, fsdp) trainer restores into DIFFERENT topologies —
    (4-device, fsdp), (8-device, replicated) and (1-device) — because the
    restore targets are built from the RESTORING trainer's shardings, not
    the saving trainer's. Params must match exactly and the next step must
    be finite on every topology.

    Parity anchor: reference resume semantics
    ``src/multivae/trainers/base/base_trainer.py:390-427`` (torch state
    dicts are topology-free; the sharded-orbax equivalent must be too)."""
    cfg_model = MVTCAEConfig(
        n_modalities=2, latent_dim=8,
        input_dims={"mod1": (2,), "mod2": (3,)},
    )
    saver = BaseTrainer(
        MVTCAE(cfg_model, seed=0), dataset, eval_dataset=dataset,
        training_config=small_config(tmp_path / "s", num_epochs=1,
                                     steps_saving=1, n_devices=8,
                                     per_device_train_batch_size=2,
                                     fsdp=True, checkpoint_backend="orbax"))
    saver.train()
    ckpt = os.path.join(saver.training_dir, "checkpoint_epoch_1")
    ref_leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(saver.state.params)]

    topologies = [
        dict(n_devices=4, per_device_train_batch_size=4, fsdp=True),
        dict(n_devices=8, per_device_train_batch_size=2, fsdp=False),
        dict(n_devices=1, per_device_train_batch_size=16, fsdp=False),
    ]
    for i, topo in enumerate(topologies):
        t = BaseTrainer(
            MVTCAE(cfg_model, seed=1 + i), dataset,
            training_config=small_config(tmp_path / f"r{i}", num_epochs=2,
                                         checkpoint_backend="orbax", **topo),
            checkpoint=ckpt)
        assert t.trained_epochs == 1
        got = [np.asarray(x)
               for x in jax.tree_util.tree_leaves(t.state.params)]
        for a, b in zip(ref_leaves, got):
            np.testing.assert_array_equal(a, b)
        loss, _ = t.train_step(2)
        assert np.isfinite(loss), f"non-finite step after restore: {topo}"


def test_checkpoint_backend_validation():
    with pytest.raises(AttributeError):
        BaseTrainerConfig(checkpoint_backend="pickle")


# -------------------------------------------------------- tensor parallelism
def test_tp_loss_matches_single_device(dataset, tmp_path):
    """Tensor-parallel (model-axis) training: loss identical to the
    single-device run on the same batch — XLA inserts the activation
    collectives from the parameter shardings alone."""
    cfg_model = MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"mod1": (2,), "mod2": (3,)},
    )
    m1 = MVTCAE(cfg_model, seed=5)
    mtp = MVTCAE(cfg_model, seed=5)

    t1 = BaseTrainer(m1, dataset, training_config=small_config(
        tmp_path, n_devices=1, per_device_train_batch_size=16, seed=11))
    ttp = BaseTrainer(mtp, dataset, training_config=small_config(
        tmp_path, n_devices=1, n_model_devices=8,
        per_device_train_batch_size=16, seed=11))
    assert ttp.mesh.axis_names == ("data", "model")
    assert ttp.n_data_devices == 1

    l1, _ = t1.train_step(1)
    ltp, _ = ttp.train_step(1)
    assert l1 == pytest.approx(ltp, rel=1e-4)

    # the wide dense kernels are actually column-sharded over "model"
    from jax.sharding import PartitionSpec as P

    sharded = [
        x for x in jax.tree_util.tree_leaves(ttp.state.params)
        if getattr(x.sharding, "spec", None) == P(None, "model")
    ]
    assert sharded, "expected model-axis-sharded dense kernels"


def test_tp_with_dp_2d_mesh(dataset, tmp_path):
    """2-D (data=4, model=2) mesh: DP batch sharding + TP column sharding
    in one step; loss matches the single-device run."""
    cfg_model = MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"mod1": (2,), "mod2": (3,)},
    )
    m1 = MVTCAE(cfg_model, seed=6)
    m2d = MVTCAE(cfg_model, seed=6)

    t1 = BaseTrainer(m1, dataset, training_config=small_config(
        tmp_path, n_devices=1, per_device_train_batch_size=16, seed=12))
    t2d = BaseTrainer(m2d, dataset, training_config=small_config(
        tmp_path, n_devices=4, n_model_devices=2,
        per_device_train_batch_size=4, seed=12))
    assert dict(t2d.mesh.shape) == {"data": 4, "model": 2}
    # global batch = per_device * n_data_devices (model axis replicates data)
    assert t2d.train_loader.batch_size == 16

    l1, _ = t1.train_step(1)
    l2d, _ = t2d.train_step(1)
    assert l1 == pytest.approx(l2d, rel=1e-4)
    l2, _ = t2d.train_step(2)
    assert np.isfinite(l2)


def test_tp_composes_with_fsdp(dataset, tmp_path):
    """fsdp + n_model_devices: leading axes shard on 'data', trailing on
    'model' where divisible."""
    cfg_model = MVTCAEConfig(
        n_modalities=2, latent_dim=8,
        input_dims={"mod1": (2,), "mod2": (3,)},
    )
    m = MVTCAE(cfg_model, seed=7)
    t = BaseTrainer(m, dataset, training_config=small_config(
        tmp_path, n_devices=2, n_model_devices=2, fsdp=True,
        per_device_train_batch_size=8, seed=13))
    l, _ = t.train_step(1)
    assert np.isfinite(l)

    from jax.sharding import PartitionSpec as P

    specs = {tuple(getattr(x.sharding, "spec", P()))
             for x in jax.tree_util.tree_leaves(t.state.params)}
    assert (("data", "model") in specs or ("data", None) in specs), specs


def test_combined_state_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from multivae_tpu.parallel.mesh import (combined_state_sharding,
                                            get_data_mesh)
    import jax.numpy as jnp

    mesh = get_data_mesh(4, n_model_devices=2)
    state = {
        "kernel": jnp.zeros((512, 128)),   # fsdp dim0 + tp dim-1
        "bias": jnp.zeros((128,)),         # tp dim-1 only (dim0 == dim-1)
        "odd": jnp.zeros((7, 65)),         # nothing divides
        "narrow": jnp.zeros((8, 4)),       # too small/narrow
        "ints": jnp.zeros((512, 128), jnp.int32),
    }
    specs = combined_state_sharding(state, mesh, fsdp=True)
    assert specs["kernel"].spec == P("data", "model")
    assert specs["bias"].spec == P("model")
    assert specs["odd"].spec == P()
    assert specs["narrow"].spec == P()
    assert specs["ints"].spec == P()

    # a WIDE bias (>= fsdp min_size) must still follow the Megatron column
    # rule, not the fsdp leading-axis rule: sharding it over "data" while
    # its kernel's output columns shard over "model" would force a
    # per-step resharding collective at the bias add (advisor r2 finding)
    wide = {"kernel": jnp.zeros((512, 2048)), "bias": jnp.zeros((2048,))}
    specs = combined_state_sharding(wide, mesh, fsdp=True)
    assert specs["kernel"].spec == P("data", "model")
    assert specs["bias"].spec == P("model")
    # a wide 1-D leaf the column rule can't take still falls back to fsdp
    specs = combined_state_sharding({"v": jnp.zeros((4096,))}, mesh,
                                    fsdp=True, min_dim=8000)
    assert specs["v"].spec == P("data")  # col rule off (min_dim), fsdp on


def test_n_model_devices_validation():
    with pytest.raises(AttributeError):
        BaseTrainerConfig(n_model_devices=0)
    with pytest.raises(AttributeError):
        BaseTrainerConfig(n_model_devices=-2)


# ----------------------------------------------- pipelined epoch finalization
def _train_collect(dataset, tmp_path, tag, **cfg_kw):
    from multivae_tpu.trainers.base.callbacks import TrainingCallback

    class Collector(TrainingCallback):
        def __init__(self):
            self.logs = []

        def on_log(self, training_config, logs, **kwargs):
            self.logs.append((kwargs.get("global_step"), dict(logs)))

    model = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"mod1": (2,), "mod2": (3,)},
    ), seed=0)
    collector = Collector()
    cfg = small_config(tmp_path / tag, num_epochs=4, learning_rate=1e-2,
                       **cfg_kw)
    trainer = BaseTrainer(model, dataset, eval_dataset=dataset,
                          training_config=cfg, callbacks=[collector])
    trainer.train()
    return trainer, collector


@pytest.mark.parametrize("cache", [False, True])
def test_pipelined_epochs_match_synchronous(dataset, tmp_path, cache):
    """pipeline_epochs=True must be bit-identical to the synchronous
    loop: same logged per-epoch metrics, same best params, same final
    TrainState params."""
    t_sync, c_sync = _train_collect(dataset, tmp_path, f"sync{cache}",
                                    pipeline_epochs=False,
                                    cache_on_device=cache)
    t_pipe, c_pipe = _train_collect(dataset, tmp_path, f"pipe{cache}",
                                    pipeline_epochs=True,
                                    cache_on_device=cache)
    assert t_pipe._pipeline_epochs_eligible()
    assert not t_sync._pipeline_epochs_eligible()

    # Logged metrics: identical values for every epoch (order may shift
    # relative to other callbacks, never across on_log calls).
    assert [s for s, _ in c_sync.logs] == [s for s, _ in c_pipe.logs]
    for (_, a), (_, b) in zip(c_sync.logs, c_pipe.logs):
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == b[k], k

    for (pa, pb) in [(t_sync.best_params, t_pipe.best_params),
                     (t_sync.state.params, t_pipe.state.params)]:
        ja, jb = jax.tree.leaves(pa), jax.tree.leaves(pb)
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(ja, jb))
    assert t_sync.best_eval_loss == t_pipe.best_eval_loss
    assert t_sync.best_train_loss == t_pipe.best_train_loss


@pytest.mark.parametrize("depth", [1, 2, 8])
def test_pipeline_depths_match_synchronous(dataset, tmp_path, depth):
    """Every pipeline_depth (lag-1 through lag-8 over a 4-epoch run, so
    partial and full pending buffers both occur) must reproduce the
    synchronous loop's logged metrics and best-model tracking."""
    t_sync, c_sync = _train_collect(dataset, tmp_path, f"dsync{depth}",
                                    pipeline_epochs=False)
    t_pipe, c_pipe = _train_collect(dataset, tmp_path, f"dpipe{depth}",
                                    pipeline_epochs=True,
                                    pipeline_depth=depth)
    assert [s for s, _ in c_sync.logs] == [s for s, _ in c_pipe.logs]
    for (_, a), (_, b) in zip(c_sync.logs, c_pipe.logs):
        for k in a:
            assert a[k] == b[k], k
    assert t_sync.best_eval_loss == t_pipe.best_eval_loss
    ja = jax.tree.leaves(t_sync.best_params)
    jb = jax.tree.leaves(t_pipe.best_params)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(ja, jb))


@pytest.mark.parametrize("cache", [False, True])
def test_pipelined_snapshot_skip_mode_matches_synchronous(dataset, tmp_path,
                                                          cache):
    """With NO eval set, no keep_best and no update hook, the pipelined
    loop skips the per-epoch params-snapshot launch
    (`_needs_epoch_param_snapshot` False) — final TrainState params and
    logged train metrics must still match the synchronous loop, and
    model.params must be FRESH (refreshed at the last epoch) so the
    final save works."""
    from multivae_tpu.trainers.base.callbacks import TrainingCallback

    class Collector(TrainingCallback):
        def __init__(self):
            self.logs = []

        def on_log(self, training_config, logs, **kwargs):
            self.logs.append((kwargs.get("global_step"), dict(logs)))

    runs = {}
    for pipelined in (False, True):
        model = MVTCAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4,
            input_dims={"mod1": (2,), "mod2": (3,)},
        ), seed=0)
        collector = Collector()
        cfg = small_config(tmp_path / f"snap{pipelined}{cache}",
                           num_epochs=4, learning_rate=1e-2,
                           pipeline_epochs=pipelined,
                           cache_on_device=cache)
        trainer = BaseTrainer(model, dataset, eval_dataset=None,
                              training_config=cfg, callbacks=[collector])
        assert not trainer._needs_epoch_param_snapshot
        trainer.train()
        runs[pipelined] = (trainer, collector)

    t_sync, c_sync = runs[False]
    t_pipe, c_pipe = runs[True]
    assert t_pipe._pipeline_epochs_eligible()
    assert [s for s, _ in c_sync.logs] == [s for s, _ in c_pipe.logs]
    for (_, a), (_, b) in zip(c_sync.logs, c_pipe.logs):
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == b[k], k
    for (pa, pb) in [(t_sync.state.params, t_pipe.state.params),
                     # model.params refreshed at the last epoch: readable
                     # (not donated-deleted) and equal to the final state
                     (t_pipe.model.params, t_pipe.state.params)]:
        ja, jb = jax.tree.leaves(pa), jax.tree.leaves(pb)
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(ja, jb))


@pytest.mark.parametrize("n_devices,layout", [(1, "auto"), (8, "auto"),
                                              (8, "sharded")])
def test_fused_epoch_blocks_match_synchronous(dataset, tmp_path, n_devices,
                                              layout):
    """Whole-epoch-block fusion (cache + steps_per_execution covering
    the epoch + snapshot-skip mode): one launch per pipeline_depth
    epochs must reproduce the synchronous loop's logged metrics and
    final params bit-identically, including partial trailing blocks
    (5 epochs, depth 2 -> blocks [1,2][3,4][5]) — on a single device,
    over an 8-way DP mesh, and over a row-SHARDED dataset cache."""
    from multivae_tpu.trainers.base.callbacks import TrainingCallback

    class Collector(TrainingCallback):
        def __init__(self):
            self.logs = []

        def on_log(self, training_config, logs, **kwargs):
            self.logs.append((kwargs.get("global_step"), dict(logs)))

    runs = {}
    for pipelined in (False, True):
        model = MVTCAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4,
            input_dims={"mod1": (2,), "mod2": (3,)},
        ), seed=0)
        collector = Collector()
        cfg = small_config(tmp_path / f"blk{pipelined}{n_devices}{layout}",
                           num_epochs=5, learning_rate=1e-2,
                           n_devices=n_devices,
                           per_device_train_batch_size=8 // n_devices,
                           pipeline_epochs=pipelined, pipeline_depth=2,
                           cache_on_device=True, steps_per_execution=100,
                           device_cache_layout=layout)
        trainer = BaseTrainer(model, dataset, eval_dataset=None,
                              training_config=cfg, callbacks=[collector])
        if pipelined:
            assert trainer._fused_epoch_blocks_eligible()
        trainer.train()
        runs[pipelined] = (trainer, collector)

    t_sync, c_sync = runs[False]
    t_blk, c_blk = runs[True]
    assert ("block", 2) in t_blk._cached_train_fns  # the fused path ran
    assert [s for s, _ in c_sync.logs] == [s for s, _ in c_blk.logs]
    for (_, a), (_, b) in zip(c_sync.logs, c_blk.logs):
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == b[k], k
    for (pa, pb) in [(t_sync.state.params, t_blk.state.params),
                     (t_blk.model.params, t_blk.state.params)]:
        ja, jb = jax.tree.leaves(pa), jax.tree.leaves(pb)
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(ja, jb))


def test_fused_epoch_blocks_split_at_checkpoint_epochs(dataset, tmp_path):
    """steps_saving epochs end their block and finalize synchronously:
    checkpoints exist, params refresh, and a resumed trainer reproduces
    the uninterrupted run."""
    def build(tag, **kw):
        model = MVTCAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4,
            input_dims={"mod1": (2,), "mod2": (3,)},
        ), seed=0)
        cfg = small_config(tmp_path / tag, num_epochs=5,
                           learning_rate=1e-2, steps_saving=3,
                           cache_on_device=True, steps_per_execution=100,
                           pipeline_depth=2, **kw)
        return model, BaseTrainer(model, dataset, eval_dataset=None,
                                  training_config=cfg)

    _, t = build("fused")
    assert t._fused_epoch_blocks_eligible()
    t.train()
    ckpt = os.path.join(t.training_dir, "checkpoint_epoch_3")
    assert os.path.isdir(ckpt)

    _, t_sync = build("sync", pipeline_epochs=False)
    t_sync.train()
    ja = jax.tree.leaves(t.state.params)
    jb = jax.tree.leaves(t_sync.state.params)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(ja, jb))

    # resume from the epoch-3 checkpoint and finish: same final params
    model_r = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"mod1": (2,), "mod2": (3,)},
    ), seed=0)
    cfg_r = small_config(tmp_path / "resumed", num_epochs=5,
                         learning_rate=1e-2, steps_saving=3,
                         cache_on_device=True, steps_per_execution=100,
                         pipeline_depth=2)
    t_res = BaseTrainer(model_r, dataset, eval_dataset=None,
                        training_config=cfg_r, checkpoint=ckpt)
    t_res.train()
    jc = jax.tree.leaves(t_res.state.params)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(ja, jc))


@pytest.mark.parametrize("num_epochs,depth,steps_saving,bs", [
    (4, 2, 1, 8),    # every epoch sync-finalizes -> all blocks length 1
    (8, 4, None, 8),  # exact multiple of depth -> [4, 4]
    (4, 2, None, 64),  # batch covers the dataset -> 1-step epochs
    (7, 3, 2, 8),    # sync splits interleave depth splits -> [1][2][2][2]
])
def test_fused_epoch_blocks_edge_partitions(dataset, tmp_path, num_epochs,
                                            depth, steps_saving, bs):
    """Block-partition edge cases (every-epoch checkpoints, exact
    multiples, single-batch epochs, interleaved sync splits) all
    reproduce the synchronous loop's final params to fp32 roundoff
    (the two-level-scan program may reassociate reductions vs the
    single-epoch program — measured <=3e-6 abs on the wrap-padded
    single-batch config, exactly the cached-scan caveat in CLAUDE.md;
    the main fused tests pin exact equality on the configs where the
    programs coincide)."""
    def run(pipelined):
        model = MVTCAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4,
            input_dims={"mod1": (2,), "mod2": (3,)},
        ), seed=0)
        cfg = small_config(
            tmp_path / f"edge{pipelined}{num_epochs}{depth}{steps_saving}",
            num_epochs=num_epochs, learning_rate=1e-2,
            per_device_train_batch_size=bs, steps_saving=steps_saving,
            pipeline_epochs=pipelined, pipeline_depth=depth,
            cache_on_device=True, steps_per_execution=100)
        t = BaseTrainer(model, dataset, eval_dataset=None,
                        training_config=cfg)
        if pipelined:
            assert t._fused_epoch_blocks_eligible()
        t.train()
        return t

    t_sync = run(False)
    t_blk = run(True)
    ja = jax.tree.leaves(t_sync.state.params)
    jb = jax.tree.leaves(t_blk.state.params)
    for x, y in zip(ja, jb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=0, atol=1e-5)


@pytest.mark.parametrize("n_devices,lr,warmup", [
    (1, 1e-2, 0),    # monotone improvement: took every epoch
    (1, 0.022, 0),   # large lr: non-monotone loss, took pattern mixed
    (1, 1e-2, 3),    # warmup window, keep_best_on_train off
    (8, 0.022, 0),   # in-graph where-select over a DP mesh
])
def test_fused_epoch_blocks_keep_best_matches_synchronous(
        dataset, tmp_path, n_devices, lr, warmup):
    """keep_best_on_train / start_keep_best_epoch configs now fuse into
    whole-epoch blocks with the (best_loss, best_params) carry tracked
    IN-GRAPH — the selected best params, the best_train_loss
    bookkeeping, and the logged metrics must match the synchronous
    loop's host-side deepcopy semantics (reference
    base_trainer.py:501-522)."""
    from multivae_tpu.trainers.base.callbacks import TrainingCallback

    class Collector(TrainingCallback):
        def __init__(self):
            self.logs = []

        def on_log(self, training_config, logs, **kwargs):
            self.logs.append((kwargs.get("global_step"), dict(logs)))

    kbt = warmup == 0
    runs = {}
    for pipelined in (False, True):
        model = MVTCAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4,
            input_dims={"mod1": (2,), "mod2": (3,)},
        ), seed=0)
        if warmup:
            model.start_keep_best_epoch = warmup
        collector = Collector()
        cfg = small_config(
            tmp_path / f"kb{pipelined}{n_devices}{lr}{warmup}",
            num_epochs=6, learning_rate=lr, n_devices=n_devices,
            per_device_train_batch_size=8 // n_devices,
            keep_best_on_train=kbt,
            pipeline_epochs=pipelined, pipeline_depth=2,
            cache_on_device=True, steps_per_execution=100)
        trainer = BaseTrainer(model, dataset, eval_dataset=None,
                              training_config=cfg, callbacks=[collector])
        if pipelined:
            assert trainer._fused_epoch_blocks_eligible()
            assert trainer._block_best_tracking
        trainer.train()
        runs[pipelined] = (trainer, collector)

    t_sync, c_sync = runs[False]
    t_blk, c_blk = runs[True]
    assert ("block", 2) in t_blk._cached_train_fns  # the fused path ran
    assert [s for s, _ in c_sync.logs] == [s for s, _ in c_blk.logs]
    for (_, a), (_, b) in zip(c_sync.logs, c_blk.logs):
        assert a == b
    # best_train_loss: sync divides in float64, the in-graph replay in
    # float32 (the device's own comparison value) — equal at f32 rel.
    if kbt:
        assert t_blk.best_train_loss == pytest.approx(
            t_sync.best_train_loss, rel=1e-6)
    for (pa, pb) in [(t_sync.state.params, t_blk.state.params),
                     (t_sync.best_params, t_blk.best_params)]:
        ja, jb = jax.tree.leaves(pa), jax.tree.leaves(pb)
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(ja, jb))
    # the tracked snapshot is NOT simply the final params on the
    # fluctuating-loss configs — prove the selection actually selects
    # (lr=0.022 on this config: argmin at epoch 5 of 6, all finite;
    # larger lrs NaN out and abort train() in the NaN guard)
    if lr == 0.022:
        same = all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(t_sync.best_params),
                            jax.tree.leaves(t_sync.state.params)))
        assert not same
    if warmup:
        # warmup-only tracking: best == params at the END of the window,
        # never updated afterwards (keep_best_on_train is False)
        assert t_blk.best_train_loss == float("inf")


@pytest.mark.parametrize("backend,n_devices", [
    ("msgpack", 1), ("orbax", 1), ("msgpack", 8), ("orbax", 8),
])
def test_fused_epoch_blocks_keep_best_checkpoint_resume(
        dataset, tmp_path, backend, n_devices):
    """Checkpoints inside a keep-best fused run save the in-graph
    tracked best snapshot AND the live training state, and a resumed
    trainer reproduces the uninterrupted run's best params and final
    params exactly. lr=0.022 makes the loss non-monotonic on this
    config, so best-at-checkpoint != live-at-checkpoint — the case
    where the reference's restart-from-best resume
    (base_trainer.py:110-111,390-427) silently diverges."""
    def build(tag, **kw):
        model = MVTCAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4,
            input_dims={"mod1": (2,), "mod2": (3,)},
        ), seed=0)
        cfg = small_config(tmp_path / tag, num_epochs=6,
                           learning_rate=0.022, steps_saving=3,
                           keep_best_on_train=True,
                           n_devices=n_devices,
                           per_device_train_batch_size=8 // n_devices,
                           checkpoint_backend=backend,
                           cache_on_device=True, steps_per_execution=100,
                           pipeline_depth=2, **kw)
        return BaseTrainer(model, dataset, eval_dataset=None,
                           training_config=cfg)

    t = build("kbfused")
    assert t._fused_epoch_blocks_eligible() and t._block_best_tracking
    t.train()
    ckpt = os.path.join(t.training_dir, "checkpoint_epoch_3")
    assert os.path.isdir(ckpt)

    t_sync = build("kbsync", pipeline_epochs=False)
    t_sync.train()
    for pa, pb in [(t_sync.state.params, t.state.params),
                   (t_sync.best_params, t.best_params)]:
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(jax.tree.leaves(pa),
                                   jax.tree.leaves(pb)))

    t_res = build("kbresumed")
    t_res = BaseTrainer(t_res.model, dataset, eval_dataset=None,
                        training_config=t_res.training_config,
                        checkpoint=ckpt)
    # the checkpoint's model files hold the BEST snapshot; the resumed
    # live state must be the LIVE params (they differ on this config)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree.leaves(t_res.best_params),
                               jax.tree.leaves(t.best_params)))
    t_res.train()
    for pa, pb in [(t_sync.state.params, t_res.state.params),
                   (t_sync.best_params, t_res.best_params)]:
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(jax.tree.leaves(pa),
                                   jax.tree.leaves(pb)))


def test_fused_resume_from_non_block_aligned_checkpoint(dataset, tmp_path):
    """A checkpoint taken by a SYNCHRONOUS run resumed into fused-block
    mode: the resumed block grid ([4,5],[6]) starts at an epoch that is
    mid-block in an uncheckpointed fused run ([1,2],[3,4],…) — the
    partition must not matter, only the per-epoch (plan, rng) chain."""
    def build(tag, **kw):
        model = MVTCAE(MVTCAEConfig(
            n_modalities=2, latent_dim=4,
            input_dims={"mod1": (2,), "mod2": (3,)},
        ), seed=0)
        cfg = small_config(tmp_path / tag, num_epochs=8,
                           learning_rate=0.022,
                           keep_best_on_train=True,
                           cache_on_device=True, steps_per_execution=100,
                           pipeline_depth=2, **kw)
        return BaseTrainer(model, dataset, eval_dataset=None,
                           training_config=cfg)

    t_sync = build("nbsync", pipeline_epochs=False, steps_saving=3)
    t_sync.train()
    ckpt = os.path.join(t_sync.training_dir, "checkpoint_epoch_3")

    t_res = build("nbres", steps_saving=None)
    t_res = BaseTrainer(t_res.model, dataset, eval_dataset=None,
                        training_config=t_res.training_config,
                        checkpoint=ckpt)
    assert t_res._fused_epoch_blocks_eligible()
    t_res.train()
    for pa, pb in [(t_sync.state.params, t_res.state.params),
                   (t_sync.best_params, t_res.best_params)]:
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(jax.tree.leaves(pa),
                                   jax.tree.leaves(pb)))


def test_pipeline_auto_disabled_by_custom_epoch_end_callback(model, dataset,
                                                             tmp_path):
    """A user callback overriding on_epoch_end could observe a later
    epoch's trainer state if deferred — it must force the synchronous
    loop (shipped display-only callbacks stay eligible)."""
    from multivae_tpu.trainers.base.callbacks import TrainingCallback

    class EpochEndReader(TrainingCallback):
        def __init__(self):
            self.seen = []

        def on_epoch_end(self, training_config, **kwargs):
            self.seen.append(1)

    trainer = BaseTrainer(model, dataset,
                          training_config=small_config(tmp_path),
                          callbacks=[EpochEndReader()])
    assert not trainer._pipeline_epochs_eligible()


def test_train_calls_overridden_public_train_step(dataset, tmp_path):
    """train() must route through the PUBLIC train_step/eval_step hooks
    when a subclass overrides them (pipelining auto-disables)."""
    calls = []

    class CustomTrainer(BaseTrainer):
        def train_step(self, epoch):
            calls.append(epoch)
            return super().train_step(epoch)

    model = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=4,
        input_dims={"mod1": (2,), "mod2": (3,)},
    ), seed=0)
    trainer = CustomTrainer(model, dataset,
                            training_config=small_config(
                                tmp_path, num_epochs=3))
    assert not trainer._pipeline_epochs_eligible()
    trainer.train()
    assert calls == [1, 2, 3]


def test_pipeline_auto_disabled_with_plateau_scheduler(model, dataset,
                                                       tmp_path):
    """ReduceLROnPlateau consumes the epoch loss, so it forces the
    synchronous loop; deterministic schedules (pure functions of the
    epoch number) keep pipelining on (r5, ``LRScheduler.lr_at``)."""
    trainer = BaseTrainer(
        model, dataset,
        training_config=small_config(
            tmp_path, scheduler_cls="ReduceLROnPlateau",
            scheduler_params={"patience": 2}),
    )
    assert not trainer._pipeline_epochs_eligible()
    trainer2 = BaseTrainer(
        model, dataset,
        training_config=small_config(
            tmp_path, scheduler_cls="StepLR",
            scheduler_params={"step_size": 1, "gamma": 0.5}),
    )
    assert trainer2._pipeline_epochs_eligible()


def test_lr_at_matches_stateful_sequence():
    """``lr_at(k)`` (the dispatch-time pure evaluation the pipelined and
    fused-block paths use) must reproduce the stateful ``step()``
    trajectory for every deterministic schedule."""
    from multivae_tpu.trainers.base.optim import make_scheduler

    specs = [
        ("StepLR", {"step_size": 2, "gamma": 0.5}),
        ("MultiStepLR", {"milestones": [2, 5], "gamma": 0.1}),
        ("ExponentialLR", {"gamma": 0.9}),
        ("LinearLR", {"start_factor": 0.25, "total_iters": 4}),
        ("ConstantLR", {"factor": 0.5, "total_iters": 3}),
        ("PolynomialLR", {"total_iters": 6, "power": 2.0}),
        ("CosineAnnealingLR", {"T_max": 7}),
        ("CosineAnnealingWarmRestarts", {"T_0": 3, "T_mult": 2}),
    ]
    for name, params in specs:
        stateful = make_scheduler(name, 1e-3, params)
        pure = make_scheduler(name, 1e-3, params)
        assert stateful.deterministic and pure.deterministic
        assert pure.lr_at(0) == stateful.current_lr, name
        for k in range(1, 9):
            stepped = stateful.step()
            assert pure.lr_at(k) == stepped, (name, k)
        # lr_at must not mutate
        assert pure.last_epoch == 0 and pure.current_lr == pure.lr_at(0)
    plateau = make_scheduler("ReduceLROnPlateau", 1e-3, {"patience": 1})
    assert not plateau.deterministic


def test_deterministic_scheduler_values_match_torch():
    """Every deterministic schedule's LR trajectory — including the
    construction-time initial LR — must equal torch's own scheduler of
    the same name (the reference passes ``scheduler_cls`` straight to
    ``torch.optim.lr_scheduler``, ``base_trainer_config.py:128-135``)."""
    import torch

    from multivae_tpu.trainers.base.optim import make_scheduler

    specs = [
        ("StepLR", {"step_size": 2, "gamma": 0.5}),
        ("MultiStepLR", {"milestones": [2, 5], "gamma": 0.1}),
        ("ExponentialLR", {"gamma": 0.9}),
        ("LinearLR", {"start_factor": 0.25, "total_iters": 4}),
        ("ConstantLR", {"factor": 0.5, "total_iters": 3}),
        ("PolynomialLR", {"total_iters": 6, "power": 2.0}),
        ("CosineAnnealingLR", {"T_max": 7, "eta_min": 1e-5}),
        ("CosineAnnealingWarmRestarts", {"T_0": 3, "T_mult": 2,
                                         "eta_min": 1e-5}),
    ]
    for name, params in specs:
        ours = make_scheduler(name, 1e-3, params)
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-3)
        theirs = getattr(torch.optim.lr_scheduler, name)(opt, **params)
        assert ours.current_lr == pytest.approx(
            opt.param_groups[0]["lr"], rel=1e-12), (name, "init")
        for k in range(1, 13):
            stepped = ours.step()
            theirs.step()
            assert stepped == pytest.approx(
                opt.param_groups[0]["lr"], rel=1e-9), (name, k)


def test_plateau_sequence_matches_torch_including_cooldown():
    """Host ReduceLROnPlateau vs torch's, over metric sequences that
    exercise improvement DURING cooldown (torch decrements the cooldown
    counter every in-cooldown epoch, improving or not — the better and
    cooldown updates are independent, not an elif chain)."""
    import torch

    from multivae_tpu.trainers.base.optim import make_scheduler

    params = {"patience": 1, "threshold": 0.1, "factor": 0.5,
              "cooldown": 3}
    # plateau -> drop -> improve during cooldown -> plateau again:
    # with torch semantics the cooldown expires DURING the improving
    # epochs, so the second plateau reduces promptly
    metrics = [10.0, 10.0, 10.0, 10.0,   # trigger a drop
               5.0, 2.0, 1.0,            # improving through cooldown
               1.0, 1.0, 1.0, 1.0, 1.0]  # second plateau
    ours = make_scheduler("ReduceLROnPlateau", 1e-3, params)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-3)
    theirs = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **params)
    for i, m in enumerate(metrics):
        stepped = ours.step(m)
        theirs.step(m)
        assert stepped == pytest.approx(opt.param_groups[0]["lr"],
                                        rel=1e-12), (i, m)
        assert ours.num_bad_epochs == theirs.num_bad_epochs, (i, m)
        assert ours.cooldown_counter == theirs.cooldown_counter, (i, m)
    # both LR drops must actually have happened
    assert ours.current_lr == pytest.approx(2.5e-4)


def test_plateau_eps_ignores_tiny_reductions():
    """torch semantics: a triggered reduction whose LR delta is <= eps
    is skipped (counters still reset) — torch.optim.lr_scheduler
    ``_reduce_lr``."""
    from multivae_tpu.trainers.base.optim import make_scheduler

    s = make_scheduler("ReduceLROnPlateau", 1e-3,
                       {"patience": 0, "threshold": 0.5, "factor": 0.5,
                        "eps": 1.0})
    assert s.step(10.0) == 1e-3   # first metric: best=10, no drop
    # not better, patience exceeded -> trigger, but delta 5e-4 <= eps=1
    assert s.step(10.0) == 1e-3
    assert s.num_bad_epochs == 0  # counters reset despite skipped lr
    s2 = make_scheduler("ReduceLROnPlateau", 1e-3,
                        {"patience": 0, "threshold": 0.5, "factor": 0.5})
    s2.step(10.0)
    assert s2.step(10.0) == pytest.approx(5e-4)  # default eps applies


def test_pipeline_checkpoint_epochs_flush_synchronously(dataset, tmp_path):
    """steps_saving epochs must checkpoint the CURRENT epoch's state even
    under pipelining; resume from the checkpoint must match."""
    t, _ = _train_collect(dataset, tmp_path, "ckpt", steps_saving=2,
                          pipeline_epochs=True)
    ckpt = os.path.join(t.training_dir, "checkpoint_epoch_4")
    assert os.path.exists(ckpt)
