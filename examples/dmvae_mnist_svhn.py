"""Reproduce DMVAE on MNIST-SVHN (reference
``examples/dmvae/mnist_svhn/train.py``): shared latent 10, private dims
{mnist: 1, svhn: 4}, likelihood rescaling {mnist: 50, svhn: 1}::

    python examples/dmvae_mnist_svhn.py --seed 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data.datasets import MnistSvhn
from multivae_tpu.models import DMVAE, DMVAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

DATA_PATH = os.environ.get("MULTIVAE_DATA_PATH", ".data")
SAVE_PATH = os.environ.get("MULTIVAE_SAVE_PATH", "experiments")

parser = argparse.ArgumentParser()
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--num_epochs", type=int, default=50)
args = parser.parse_args()

train_set = MnistSvhn(data_path=DATA_PATH, split="train",
                      data_multiplication=30)
test_set = MnistSvhn(data_path=DATA_PATH, split="test",
                     data_multiplication=30)
print(f"train: {len(train_set)}, test: {len(test_set)}")

model_config = DMVAEConfig(
    n_modalities=2,
    latent_dim=10,
    input_dims={"mnist": (1, 28, 28), "svhn": (3, 32, 32)},
    modalities_specific_dim={"mnist": 1, "svhn": 4},
    rescale_factors={"mnist": 50, "svhn": 1},
    uses_likelihood_rescaling=True,
)
model = DMVAE(model_config, seed=args.seed)

trainer_config = BaseTrainerConfig(
    output_dir=os.path.join(SAVE_PATH, "reproduce_dmvae",
                            f"seed_{args.seed}"),
    per_device_train_batch_size=256,
    num_epochs=args.num_epochs,
    learning_rate=1e-3,
    optimizer_cls="Adam",
    # device-resident data pipeline (dataset fits HBM); falls back
    # to the host loader automatically when it doesn't
    cache_on_device=True,
    steps_per_execution=25,
    steps_predict=5,
    seed=args.seed,
)
BaseTrainer(model, train_set, training_config=trainer_config).train()
