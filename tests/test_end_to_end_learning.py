"""End-to-end learning validation: a model trained on structured synthetic
data must achieve above-chance cross-modal coherence.

This is the framework-level analogue of the reference's reproducibility
table (README.md:332-348): not a unit check but evidence that the training
loop + model objectives actually learn cross-modal structure.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.metrics import CoherenceEvaluator, CoherenceEvaluatorConfig
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

N_CLASSES = 3


def make_structured_dataset(n=600, seed=0):
    """Two modality views of a 3-class latent structure."""
    # centers in [0.1, 0.9]: the default decoders are sigmoid-bounded
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, N_CLASSES, n)
    centers_rng = np.random.default_rng(42)  # shared across splits
    centers_a = centers_rng.uniform(0.1, 0.9, size=(N_CLASSES, 8))
    centers_b = centers_rng.uniform(0.1, 0.9, size=(N_CLASSES, 12))
    a = centers_a[labels] + rng.normal(size=(n, 8)) * 0.03
    b = centers_b[labels] + rng.normal(size=(n, 12)) * 0.03
    return (MultimodalBaseDataset(
        {"a": a.astype(np.float32), "b": b.astype(np.float32)},
        labels=labels),
        centers_a, centers_b)


def nearest_center_classifier(centers):
    """Classify a generated sample by its nearest class center."""
    c = jnp.asarray(centers, jnp.float32)

    def clf(x):
        x = jnp.asarray(x, jnp.float32)
        d2 = ((x[:, None, :] - c[None]) ** 2).sum(-1)
        return -d2  # logits = negative squared distance

    return clf


@pytest.mark.slow
def test_mvtcae_learns_cross_modal_structure(tmp_path):
    train, ca, cb = make_structured_dataset(600, seed=0)
    test, _, _ = make_structured_dataset(120, seed=1)

    model = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=8,
        input_dims={"a": (8,), "b": (12,)}, beta=0.5,
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=30,
        per_device_train_batch_size=100, learning_rate=2e-3, n_devices=1,
    )
    BaseTrainer(model, train, training_config=cfg).train()

    clfs = {"a": nearest_center_classifier(ca),
            "b": nearest_center_classifier(cb)}
    ev = CoherenceEvaluator(
        model, clfs, test,
        eval_config=CoherenceEvaluatorConfig(
            batch_size=120, num_classes=N_CLASSES, nb_samples_for_joint=100),
    )
    _, mean_acc = ev.coherence_from_subset(["a"])
    # chance level is 1/3; a trained model must be far above it
    assert mean_acc > 0.8, f"cross coherence a->b too low: {mean_acc}"
    _, mean_acc_b = ev.coherence_from_subset(["b"])
    assert mean_acc_b > 0.8, f"cross coherence b->a too low: {mean_acc_b}"


@pytest.mark.slow
def test_mmvae_learns_cross_modal_structure(tmp_path):
    """Same protocol for the MoE family: DReG-trained MMVAE must transfer
    class structure across modalities well above chance."""
    from multivae_tpu.models import MMVAE, MMVAEConfig

    train, ca, cb = make_structured_dataset(600, seed=0)
    test, _, _ = make_structured_dataset(120, seed=1)

    model = MMVAE(MMVAEConfig(
        n_modalities=2, latent_dim=8, K=4,
        input_dims={"a": (8,), "b": (12,)},
        prior_and_posterior_dist="normal", learn_prior=False,
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=30,
        per_device_train_batch_size=100, learning_rate=2e-3, n_devices=1,
    )
    BaseTrainer(model, train, training_config=cfg).train()

    clfs = {"a": nearest_center_classifier(ca),
            "b": nearest_center_classifier(cb)}
    ev = CoherenceEvaluator(
        model, clfs, test,
        eval_config=CoherenceEvaluatorConfig(
            batch_size=120, num_classes=N_CLASSES, nb_samples_for_joint=100),
    )
    _, acc_a = ev.coherence_from_subset(["a"])
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    _, acc_b = ev.coherence_from_subset(["b"])
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_learning_from_partial_data(tmp_path):
    """The flagship incomplete-data claim: with 40% of modality 'b'
    missing (masked, zero-precision experts), MVTCAE must still learn
    cross-modal structure well above chance."""
    import numpy as np

    from multivae_tpu.data import IncompleteDataset

    train, ca, cb = make_structured_dataset(600, seed=0)
    test, _, _ = make_structured_dataset(120, seed=1)

    rng = np.random.default_rng(3)
    masks = {"a": np.ones(600, dtype=bool),
             "b": rng.uniform(size=600) > 0.4}
    train_inc = IncompleteDataset(data=train.data, masks=masks,
                                  labels=train.labels)

    model = MVTCAE(MVTCAEConfig(
        n_modalities=2, latent_dim=8,
        input_dims={"a": (8,), "b": (12,)}, beta=0.5,
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=30,
        per_device_train_batch_size=100, learning_rate=2e-3, n_devices=1,
    )
    BaseTrainer(model, train_inc, training_config=cfg).train()

    clfs = {"a": nearest_center_classifier(ca),
            "b": nearest_center_classifier(cb)}
    ev = CoherenceEvaluator(
        model, clfs, test,
        eval_config=CoherenceEvaluatorConfig(
            batch_size=120, num_classes=N_CLASSES, nb_samples_for_joint=100),
    )
    _, acc = ev.coherence_from_subset(["a"])
    assert acc > 0.8, f"cross coherence a->b with missing data: {acc}"
