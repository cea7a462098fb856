"""Learning with partially observed data (mirrors the reference tutorial
``examples/tutorial_notebooks/learning_with_partial_data.ipynb``).

Missing modalities are boolean masks: a masked modality contributes zero
precision to posterior aggregation and exactly zero gradient to its
encoder — no NaNs, no filtering loops::

    python examples/tutorials/learning_with_partial_data.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

# %% 1. An incomplete dataset carries a boolean mask per modality.
# 40% of 'audio' samples are missing (missing-at-random).
from multivae_tpu.data import IncompleteDataset
from multivae_tpu.models import MVAE, MVAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

rng = np.random.default_rng(0)
N = 256

masks = {
    "image": np.ones(N, dtype=bool),
    "audio": rng.uniform(size=N) > 0.4,
}
train_data = IncompleteDataset(
    data={
        "image": rng.uniform(size=(N, 1, 8, 8)).astype(np.float32),
        "audio": rng.normal(size=(N, 16)).astype(np.float32),
    },
    masks=masks,
)

# %% 2. Models with "partially observed: yes" in the README table accept
# incomplete datasets directly (MVAE, MMVAE, MoPoE, MVTCAE, DMVAE,
# MMVAE+, Nexus, CMVAE, MHVAE, CRMVAE).
model = MVAE(MVAEConfig(
    n_modalities=2, latent_dim=16,
    input_dims={"image": (1, 8, 8), "audio": (16,)},
    decoders_dist={"image": "bernoulli", "audio": "normal"},
    warmup=1,
    # subset subsampling assumes complete rows; it is usually disabled
    # for incomplete training (reference case study does the same)
    use_subsampling=False,
), seed=0)

trainer = BaseTrainer(model, train_data, training_config=BaseTrainerConfig(
    output_dir="./tutorial_out_partial", num_epochs=3,
    per_device_train_batch_size=64, learning_rate=1e-3,
))
trainer.train()

# %% 3. Conditioning on the always-present modality works for every sample;
# prediction from a sometimes-missing one simply uses what's observed.
pred = model.predict(train_data[:8], cond_mod="image", gen_mod="audio")
print("audio from image:", pred.audio.shape)
