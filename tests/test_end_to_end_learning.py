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


def _train_and_eval_coherence(model, tmp_path, epochs=30, lr=2e-3,
                              multistage=False):
    train, ca, cb = make_structured_dataset(600, seed=0)
    test, _, _ = make_structured_dataset(120, seed=1)
    if multistage:
        from multivae_tpu.trainers import (
            MultistageTrainer,
            MultistageTrainerConfig,
        )

        cfg = MultistageTrainerConfig(
            output_dir=str(tmp_path), num_epochs=epochs,
            per_device_train_batch_size=100, learning_rate=lr, n_devices=1,
        )
        MultistageTrainer(model, train, training_config=cfg).train()
    else:
        cfg = BaseTrainerConfig(
            output_dir=str(tmp_path), num_epochs=epochs,
            per_device_train_batch_size=100, learning_rate=lr, n_devices=1,
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
    _, acc_b = ev.coherence_from_subset(["b"])
    return float(acc_a), float(acc_b)


@pytest.mark.slow
def test_mopoe_learns_cross_modal_structure(tmp_path):
    """Mixture-of-PoE family: all-subset objective must transfer class
    structure across modalities well above the 1/3 chance level."""
    from multivae_tpu.models import MoPoE, MoPoEConfig

    model = MoPoE(MoPoEConfig(
        n_modalities=2, latent_dim=8, beta=0.5,
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_mmvaeplus_learns_cross_modal_structure(tmp_path):
    """Shared+private MoE family (MMVAE+): cross-modal generation draws
    the private code from the modality prior; shared structure must still
    carry the class."""
    from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig

    model = MMVAEPlus(MMVAEPlusConfig(
        n_modalities=2, latent_dim=8, K=4, modalities_specific_dim=4,
        prior_and_posterior_dist="normal", learn_modality_prior=True,
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_nexus_learns_cross_modal_structure(tmp_path):
    """Two-level hierarchy (Nexus): the top joint VAE over detached bottom
    codes must transfer class structure across modalities.

    ``dropout_rate>0`` is essential: the forced perceptual dropout is what
    exposes the top VAE to single-modality aggregates during training
    (reference ``nexus_model.py:231-247``) — without it, unimodal
    conditioning at eval is out-of-distribution and coherence is chance.
    The threshold is lower than the other families': class information
    survives to the predicted bottom code with perfect linear separability
    (verified link-by-link), but the top decoder's regression-to-the-mean
    shrinks the code ~30% off the bottom decoder's training manifold,
    capping coherence ~0.65 on this protocol. The reference README marks
    Nexus as non-reproducing for the same structural reason.
    """
    from multivae_tpu.models import Nexus, NexusConfig

    model = Nexus(NexusConfig(
        n_modalities=2, latent_dim=8,
        modalities_specific_dim={"a": 8, "b": 8}, msg_dim=8,
        warmup=5, dropout_rate=0.5, top_beta=0.1,
        bottom_betas={"a": 0.1, "b": 0.1},
        gammas={"a": 10.0, "b": 10.0},
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path, epochs=60)
    assert acc_a > 0.55, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.55, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_mvae_learns_cross_modal_structure(tmp_path):
    """PoE family (MVAE): the sub-sampled ELBO objective (joint + unimodal
    + random subsets) must make the PoE posterior transfer class structure."""
    from multivae_tpu.models import MVAE, MVAEConfig

    model = MVAE(MVAEConfig(
        n_modalities=2, latent_dim=8, warmup=5,
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_dmvae_learns_cross_modal_structure(tmp_path):
    """Private+shared disentanglement (DMVAE): cross ELBOs from each
    unimodal shared posterior must carry the class."""
    from multivae_tpu.models import DMVAE, DMVAEConfig

    model = DMVAE(DMVAEConfig(
        n_modalities=2, latent_dim=8,
        modalities_specific_dim={"a": 4, "b": 4},
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_crmvae_learns_cross_modal_structure(tmp_path):
    """Coordination family (CRMVAE): KL(q(z|X)||q(z|x_i)) coordination must
    align unimodal posteriors with the joint one."""
    from multivae_tpu.models import CRMVAE, CRMVAEConfig

    model = CRMVAE(CRMVAEConfig(
        n_modalities=2, latent_dim=8, beta=0.5,
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_jmvae_learns_cross_modal_structure(tmp_path):
    """Joint-encoder family (JMVAE): KL(joint||unimodal) regularization must
    make the exact-PoE subset posteriors class-informative."""
    from multivae_tpu.models import JMVAE, JMVAEConfig

    model = JMVAE(JMVAEConfig(
        n_modalities=2, latent_dim=8, alpha=0.1, warmup=5,
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_cmvae_learns_cross_modal_structure(tmp_path):
    """Clustering-prior family (CMVAE): the mixture prior on the shared
    space must not prevent cross-modal transfer of class structure."""
    from multivae_tpu.models import CMVAE, CMVAEConfig

    model = CMVAE(CMVAEConfig(
        n_modalities=2, latent_dim=8, K=4, modalities_specific_dim=4,
        number_of_clusters=3, prior_and_posterior_dist="normal",
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_telbo_learns_cross_modal_structure(tmp_path):
    """Two-stage joint family (TELBO): stage-2 unimodal encoders trained
    against the frozen joint decoders must transfer the class."""
    from multivae_tpu.models import TELBO, TELBOConfig

    model = TELBO(TELBOConfig(
        n_modalities=2, latent_dim=8, warmup=15,
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(
        model, tmp_path, epochs=35, multistage=True)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_jnf_learns_cross_modal_structure(tmp_path):
    """Flow family (JNF): stage-2 flows matched to the frozen joint
    posterior must carry class structure through unimodal conditioning."""
    from multivae_tpu.models import JNF, JNFConfig

    model = JNF(JNFConfig(
        n_modalities=2, latent_dim=8, warmup=15,
        input_dims={"a": (8,), "b": (12,)},
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), seed=0)
    acc_a, acc_b = _train_and_eval_coherence(
        model, tmp_path, epochs=35, multistage=True)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"


@pytest.mark.slow
def test_cvae_learns_conditional_structure(tmp_path):
    """Conditional family (CVAE): the prior network p(z|a) must carry the
    class so that b generated from a alone lands near the right centers."""
    from multivae_tpu.data.batch import batch_from_arrays
    from multivae_tpu.models import CVAE, CVAEConfig

    train, ca, cb = make_structured_dataset(600, seed=0)
    test, _, _ = make_structured_dataset(120, seed=1)

    model = CVAE(CVAEConfig(
        conditioning_modalities=["a"], main_modality="b", latent_dim=8,
        input_dims={"a": (8,), "b": (12,)}, beta=0.5,
        decoder_dist="normal", decoder_dist_params={"scale": 0.05},
    ), seed=0)
    cfg = BaseTrainerConfig(
        output_dir=str(tmp_path), num_epochs=30,
        per_device_train_batch_size=100, learning_rate=2e-3, n_devices=1,
    )
    BaseTrainer(model, train, training_config=cfg).train()

    batch = batch_from_arrays(
        data={k: jnp.asarray(v) for k, v in test.data.items()})
    out = model.predict(batch)  # generate b from the prior network on a
    clf = nearest_center_classifier(cb)
    pred = np.asarray(clf(out["b"])).argmax(1)
    acc = float((pred == np.asarray(test.labels)).mean())
    assert acc > 0.8, f"conditional coherence a->b too low: {acc}"


@pytest.mark.slow
def test_mhvae_learns_cross_modal_structure(tmp_path):
    """Hierarchical family (MHVAE): the all-subset hierarchical-PoE loss
    must transfer class structure through the shared top-down path."""
    import sys as _sys

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from mhvae_test_architectures import build_mhvae_blocks

    from multivae_tpu.models import MHVAE, MHVAEConfig

    dims = {"a": (8,), "b": (12,)}
    enc, dec, bu, td, post, prior = build_mhvae_blocks(
        dims, n_latent=2, latent_dim=8)
    model = MHVAE(MHVAEConfig(
        n_modalities=2, latent_dim=8, n_latent=2, input_dims=dims, beta=0.5,
        decoders_dist={"a": "normal", "b": "normal"},
        decoder_dist_params={"a": {"scale": 0.05}, "b": {"scale": 0.05}},
    ), encoders=enc, decoders=dec, bottom_up_blocks=bu,
        top_down_blocks=td, posterior_blocks=post, prior_blocks=prior,
        seed=0)
    acc_a, acc_b = _train_and_eval_coherence(model, tmp_path, epochs=40)
    assert acc_a > 0.8, f"cross coherence a->b too low: {acc_a}"
    assert acc_b > 0.8, f"cross coherence b->a too low: {acc_b}"
