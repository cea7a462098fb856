"""Training a CVAE (mirrors the reference tutorial
``examples/tutorial_notebooks/training_a_CVAE_model.ipynb``).

The CVAE reconstructs ONE main modality conditioned on the others; an
optional prior network makes the prior p(z | conditioning) learnable::

    python examples/tutorials/training_a_cvae_model.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

# %% 1. A CVAE names one main modality and its conditioning modalities.
from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import CVAE, CVAEConfig
from multivae_tpu.nn import BaseAEConfig, BaseDictEncoders, MultipleHeadJointEncoder
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

rng = np.random.default_rng(0)
N, LATENT = 256, 8
DIMS = {"target": (12,), "cond_a": (6,), "cond_b": (1, 4, 4)}

train_data = MultimodalBaseDataset({
    "target": rng.normal(size=(N, 12)).astype(np.float32),
    "cond_a": rng.normal(size=(N, 6)).astype(np.float32),
    "cond_b": rng.uniform(size=(N, 1, 4, 4)).astype(np.float32),
})

config = CVAEConfig(
    main_modality="target",
    conditioning_modalities=["cond_a", "cond_b"],
    input_dims=DIMS,
    latent_dim=LATENT,
    beta=1.0,
)

# %% 2. Optional: a learnable conditional prior p(z | cond_a, cond_b).
prior_net = MultipleHeadJointEncoder(
    dict_encoders=BaseDictEncoders(
        {"cond_a": DIMS["cond_a"], "cond_b": DIMS["cond_b"]}, LATENT),
    args=BaseAEConfig(latent_dim=LATENT),
)
model = CVAE(config, prior_network=prior_net, seed=0)

trainer = BaseTrainer(model, train_data, training_config=BaseTrainerConfig(
    output_dir="./tutorial_out_cvae", num_epochs=3,
    per_device_train_batch_size=64, learning_rate=1e-3,
))
trainer.train()

# %% 3. Generate the main modality from the conditioning modalities.
pred = model.predict(train_data[:8], cond_mod="all")
print("target generated from conditions:", pred.target.shape)

# Or sample z from the conditional prior explicitly.
emb = model.encode(train_data[:8], N=3)
out = model.decode(emb)
print("decoded:", out.reconstruction.shape)
