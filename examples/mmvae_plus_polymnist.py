"""Reproduce the MMVAE+ PolyMNIST results (reference
``examples/mmvae_plus/mmnist.py`` and the partial-data case study
``examples/case_studies/mmvaePlus_on_partial_data/train.py``): resnet
encoders/decoders, latent 32 + private 32, laplace decoders with scale
0.75, beta 2.5, iwae_looser.

K=10 trains 50 epochs; K=1 trains 150 (paper protocol). For the
partial-data study add ``--missing_ratio 0.2 [--keep_incomplete]``::

    python examples/mmvae_plus_polymnist.py --K 1 --seed 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data import random_split
from multivae_tpu.data.datasets import MMNISTDataset
from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig
from multivae_tpu.nn.mmnist import DecoderResnetMMNIST, EncoderResnetMMNIST
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

DATA_PATH = os.environ.get("MULTIVAE_DATA_PATH", ".data")
SAVE_PATH = os.environ.get("MULTIVAE_SAVE_PATH", "experiments")

parser = argparse.ArgumentParser()
parser.add_argument("--K", type=int, default=1)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--missing_ratio", type=float, default=0.0)
parser.add_argument("--keep_incomplete", action="store_true")
parser.add_argument("--num_epochs", type=int, default=None,
                    help="override the paper protocol epoch count")
args = parser.parse_args()

modalities = ["m0", "m1", "m2", "m3", "m4"]
model_config = MMVAEPlusConfig(
    n_modalities=5,
    K=args.K,
    decoders_dist={m: "laplace" for m in modalities},
    decoder_dist_params={m: {"scale": 0.75} for m in modalities},
    prior_and_posterior_dist="laplace_with_softmax",
    beta=2.5,
    modalities_specific_dim=32,
    latent_dim=32,
    input_dims={m: (3, 28, 28) for m in modalities},
    learn_shared_prior=False,
    learn_modality_prior=True,
    loss="iwae_looser",
    use_remat=True,  # resnets at K=10 need rematerialization to fit HBM
)

encoders = {m: EncoderResnetMMNIST(
    private_latent_dim=model_config.modalities_specific_dim,
    shared_latent_dim=model_config.latent_dim) for m in modalities}
decoders = {m: DecoderResnetMMNIST(
    latent_dim=model_config.latent_dim + model_config.modalities_specific_dim)
    for m in modalities}

model = MMVAEPlus(model_config, encoders=encoders, decoders=decoders,
                  seed=args.seed)

full_train = MMNISTDataset(
    data_path=DATA_PATH, split="train",
    missing_ratio=args.missing_ratio, keep_incomplete=args.keep_incomplete,
)
train_data, eval_data = random_split(full_train, [0.9, 0.1], seed=args.seed)

training_config = BaseTrainerConfig(
    per_device_train_batch_size=32,
    per_device_eval_batch_size=32,
    num_epochs=args.num_epochs or (50 if model_config.K == 10 else 150),
    learning_rate=1e-3,
    output_dir=os.path.join(SAVE_PATH, "reproduce_mmvaePlus",
                            f"K__{model_config.K}"
                            f"_missing__{args.missing_ratio}"),
    steps_predict=5,
    optimizer_cls="Adam",
    optimizer_params=dict(amsgrad=True),
    # device-resident data pipeline (dataset fits HBM); falls back
    # to the host loader automatically when it doesn't
    cache_on_device=True,
    steps_per_execution=25,
    seed=args.seed,
)

trainer = BaseTrainer(model, train_data, eval_dataset=eval_data,
                      training_config=training_config)
trainer.train()

# Evaluation: cross coherences + visualization grids on the test split.
from multivae_tpu.metrics import (
    CoherenceEvaluator,
    CoherenceEvaluatorConfig,
    Visualization,
    VisualizationConfig,
)
from multivae_tpu.metrics.classifiers.mmnist import load_mmnist_classifiers

test_data = MMNISTDataset(data_path=DATA_PATH, split="test")
best = trainer.best_model
clf_path = os.path.join(DATA_PATH, "clf")
if os.path.exists(clf_path):
    coh = CoherenceEvaluator(
        best, load_mmnist_classifiers(clf_path), test_data,
        output=trainer.training_dir,
        eval_config=CoherenceEvaluatorConfig(batch_size=512, num_classes=10),
    )
    coh.eval()
    coh.finish()
viz = Visualization(best, test_data, output=trainer.training_dir,
                    eval_config=VisualizationConfig(n_samples=8))
viz.eval()
viz.finish()
