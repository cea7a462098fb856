"""Quickstart: train an MVTCAE on paired MNIST-SVHN.

TPU-native counterpart of the reference ``examples/quickstart.py``: same
user flow (dataset -> model -> trainer -> AutoModel reload), running as one
compiled train step per batch on the local accelerator(s).

Requires the MNIST raw idx files and SVHN .mat files under ./data (no
network egress in some environments; see
multivae_tpu/data/datasets/mnist_svhn.py).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data.datasets import MnistSvhn
from multivae_tpu.models import MVTCAE, AutoModel, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

train_data = MnistSvhn(data_path="./data", split="train",
                       data_multiplication=1)

model_config = MVTCAEConfig(
    n_modalities=2,
    latent_dim=20,
    input_dims={"mnist": (1, 28, 28), "svhn": (3, 32, 32)},
)
model = MVTCAE(model_config)

trainer_config = BaseTrainerConfig(
    output_dir="./checkpoints",
    num_epochs=10,
    learning_rate=1e-3,
    per_device_train_batch_size=256,
)

trainer = BaseTrainer(model, train_data, training_config=trainer_config)
trainer.train()

# Reload the trained model
model = AutoModel.load_from_folder(
    f"{trainer.training_dir}/final_model"
)
