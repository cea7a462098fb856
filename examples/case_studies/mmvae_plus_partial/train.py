"""MMVAE+ on PolyMNIST with missing data — full case-study protocol.

Port of the reference case study
``examples/case_studies/mmvaePlus_on_partial_data/train.py:1-141``:
train MMVAE+ (K=1, laplace_with_softmax posteriors, learned modality
priors, beta=2.5, resnet nets, latent 32+32) on PolyMNIST at a missing
ratio in {0, 0.2, 0.5}, with and without keeping the incomplete samples,
then evaluate cross-modal coherences and produce unconditional +
conditional-subset visualization grids. Each experiment is repeated
over seeds; the reference's published take-away (generation quality is
robust to missingness, and keeping incomplete samples beats discarding
them) is reproduced by sweeping::

    for r in 0 0.2 0.5; do
      python train.py --missing_ratio $r --keep_incomplete --seed 0
      python train.py --missing_ratio $r --seed 0
    done

TPU-native deltas from the reference script: the dataset trains from the
device-resident cache in scan-fused steps (``cache_on_device`` +
``steps_per_execution``), paths come from environment variables instead
of hard-coded homes, and wandb is optional (console logging otherwise).
"""

import argparse
import os
import sys

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          "..", "..", ".."))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from multivae_tpu.data import random_split
from multivae_tpu.data.datasets import MMNISTDataset
from multivae_tpu.metrics import (
    CoherenceEvaluator,
    CoherenceEvaluatorConfig,
    Visualization,
    VisualizationConfig,
)
from multivae_tpu.metrics.classifiers.mmnist import load_mmnist_classifiers
from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig
from multivae_tpu.nn.mmnist import DecoderResnetMMNIST, EncoderResnetMMNIST
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig
from multivae_tpu.trainers.base.callbacks import (
    WandbCallback,
    wandb_is_available,
)

DATA_PATH = os.environ.get("MULTIVAE_DATA_PATH", ".data")
SAVE_PATH = os.environ.get("MULTIVAE_SAVE_PATH",
                           "experiments/mmvaePlus_on_partial")
CLASSIFIER_PATH = os.path.join(DATA_PATH, "clf")
WANDB_PROJECT = "mmvae_plus_on_partial_tpu"

MODALITIES = ["m0", "m1", "m2", "m3", "m4"]


def argument_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--missing_ratio", type=float, default=0.0)
    p.add_argument("--keep_incomplete", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p


def build_model_config():
    """The reference protocol's exact model hyperparameters
    (``mmvaePlus_on_partial_data/train.py:50-64``)."""
    return MMVAEPlusConfig(
        latent_dim=32,
        n_modalities=len(MODALITIES),
        input_dims={m: (3, 28, 28) for m in MODALITIES},
        decoders_dist={m: "laplace" for m in MODALITIES},
        decoder_dist_params={m: {"scale": 0.75} for m in MODALITIES},
        K=1,
        prior_and_posterior_dist="laplace_with_softmax",
        learn_shared_prior=False,
        learn_modality_prior=True,
        beta=2.5,
        modalities_specific_dim=32,
        reconstruction_option="joint_prior",
    )


def build_model(model_config, seed=0):
    """Resnet encoders/decoders at the paper sizes
    (``mmvaePlus_on_partial_data/train.py:67-82``)."""
    encoders = {
        m: EncoderResnetMMNIST(
            private_latent_dim=model_config.modalities_specific_dim,
            shared_latent_dim=model_config.latent_dim,
        )
        for m in MODALITIES
    }
    decoders = {
        m: DecoderResnetMMNIST(
            latent_dim=(model_config.latent_dim
                        + model_config.modalities_specific_dim))
        for m in MODALITIES
    }
    return MMVAEPlus(model_config, encoders=encoders, decoders=decoders,
                     seed=seed)


def build_trainer_config(args, **overrides):
    """Reference ``train.py:85-97`` with the TPU device-cache pipeline."""
    cfg = dict(
        learning_rate=1e-3,
        per_device_train_batch_size=32,
        per_device_eval_batch_size=32,
        num_epochs=150,
        optimizer_cls="Adam",
        optimizer_params={},
        steps_predict=5,
        scheduler_cls="ReduceLROnPlateau",
        scheduler_params={"patience": 30},
        # 25 scan-fused steps per dispatch: at this workload's ~532
        # ms/step the dispatch overhead is already <0.01%, so
        # whole-epoch block fusion (steps_per_execution >= n_batches)
        # would only delay NaN surfacing — unlike the MLP-scale
        # partial_polymnist protocol, which fuses whole epochs.
        cache_on_device=True,
        steps_per_execution=25,
    )
    cfg.update(overrides)
    return BaseTrainerConfig(
        seed=args.seed,
        output_dir=os.path.join(
            SAVE_PATH, f"keep_incomplete_{args.keep_incomplete}",
            f"missing_ratio_{args.missing_ratio}", f"seed_{args.seed}"),
        **cfg,
    )


def main():
    args = argument_parser().parse_args()

    train_full = MMNISTDataset(
        data_path=DATA_PATH, split="train",
        missing_ratio=args.missing_ratio,
        keep_incomplete=args.keep_incomplete,
    )
    test_data = MMNISTDataset(data_path=DATA_PATH, split="test")
    train_data, eval_data = random_split(train_full, [0.9, 0.1],
                                         seed=args.seed)

    model_config = build_model_config()
    model = build_model(model_config, seed=args.seed)
    trainer_config = build_trainer_config(args)

    callbacks = None
    if wandb_is_available():
        cb = WandbCallback()
        cb.setup(trainer_config, model_config, project_name=WANDB_PROJECT)
        cb.run.config.update(args.__dict__)
        callbacks = [cb]

    trainer = BaseTrainer(model, train_data, eval_dataset=eval_data,
                          training_config=trainer_config,
                          callbacks=callbacks)
    trainer.train()
    best = trainer.best_model

    # Coherences on the complete test split (reference ``train.py:113-124``)
    coh = CoherenceEvaluator(
        best, load_mmnist_classifiers(CLASSIFIER_PATH), test_data,
        output=trainer.training_dir,
        eval_config=CoherenceEvaluatorConfig(batch_size=128, num_classes=10),
    )
    coh.eval()
    coh.finish()

    # Unconditional + conditional-subset grids (reference ``:127-141``)
    vis = Visualization(
        best, test_data, output=trainer.training_dir,
        eval_config=VisualizationConfig(n_samples=8, n_data_cond=10),
    )
    vis.eval()
    for i in range(2, 5):
        vis.conditional_samples_subset(MODALITIES[1:1 + i])
    vis.finish()


if __name__ == "__main__":
    main()
