"""Weights & Biases logging (mirrors the reference tutorial
``examples/tutorial_notebooks/use_wandb.ipynb``).

The WandbCallback logs train/eval metrics per epoch and the prediction
image grids. It is optional — the import below explains how to enable
it::

    python examples/tutorials/use_wandb.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

# %% 1. A model and a trainer config, as in getting_started.
from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig
from multivae_tpu.trainers.base.callbacks import (
    WandbCallback,
    wandb_is_available,
)

rng = np.random.default_rng(0)
train_data = MultimodalBaseDataset({
    "a": rng.normal(size=(128, 8)).astype(np.float32),
    "b": rng.normal(size=(128, 12)).astype(np.float32),
})
model = MVTCAE(MVTCAEConfig(
    n_modalities=2, latent_dim=8, input_dims={"a": (8,), "b": (12,)},
    decoders_dist={"a": "normal", "b": "normal"},
), seed=0)
trainer_config = BaseTrainerConfig(
    output_dir="./tutorial_out_wandb", num_epochs=2,
    per_device_train_batch_size=64, learning_rate=1e-3,
)

# %% 2. The WandbCallback is passed to the trainer; evaluators can
# resume the same run from the saved wandb_info.json.
callbacks = None
if wandb_is_available():
    # 1. `pip install wandb && wandb login` (once per machine)
    # 2. setup() creates the run and saves wandb_info.json next to the
    #    checkpoints so evaluators can resume the same run later
    #    (multivae_tpu.trainers.base.callbacks.load_wandb_path_from_folder).
    wandb_cb = WandbCallback()
    wandb_cb.setup(trainer_config, model.model_config,
                   project_name="multivae_tpu_tutorial")
    callbacks = [wandb_cb]
else:
    print("wandb not installed - training with console logging only")

BaseTrainer(model, train_data, training_config=trainer_config,
            callbacks=callbacks).train()
print("done")
