"""Getting started (mirrors the reference tutorial
``examples/tutorial_notebooks/getting_started.ipynb``).

Runs end-to-end on synthetic data in under a minute on CPU::

    python examples/tutorials/getting_started.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

# %% 1. A multimodal dataset is a dict of arrays sharing the first axis.
from multivae_tpu.data import MultimodalBaseDataset

rng = np.random.default_rng(0)
N = 256
train_data = MultimodalBaseDataset(
    {
        "image": rng.uniform(size=(N, 1, 8, 8)).astype(np.float32),
        "audio": rng.normal(size=(N, 16)).astype(np.float32),
    },
    labels=rng.integers(0, 4, N),
)

# %% 2. Pick a model and describe its inputs. Default MLP architectures
# are built automatically; pass flax modules as encoders=/decoders= to
# use your own (contracts in multivae_tpu/nn/base_architectures.py).
from multivae_tpu.models import MVTCAE, MVTCAEConfig

model = MVTCAE(MVTCAEConfig(
    n_modalities=2,
    latent_dim=16,
    input_dims={"image": (1, 8, 8), "audio": (16,)},
    decoders_dist={"image": "bernoulli", "audio": "normal"},
    beta=2.5, alpha=0.1,
), seed=0)

# %% 3. Train. The step is jitted and data-parallel over visible devices.
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

trainer = BaseTrainer(model, train_data, training_config=BaseTrainerConfig(
    output_dir="./tutorial_out",
    num_epochs=3,
    per_device_train_batch_size=64,
    learning_rate=1e-3,
))
trainer.train()

# %% 4. Use the trained model: cross-modal prediction and joint NLL.
pred = model.predict(train_data[:8], cond_mod="image", gen_mod="audio")
print("audio generated from image:", pred.audio.shape)

emb = model.encode(train_data[:8], cond_mod="all", N=4)
print("posterior samples:", emb.z.shape)

nll = model.compute_joint_nll(train_data[:4], K=50, batch_size_K=25)
print("joint NLL (K=50):", float(nll))

# %% 5. Reload from disk — AutoModel resolves the class from the config.
from multivae_tpu.models import AutoModel

reloaded = AutoModel.load_from_folder(
    os.path.join(trainer.training_dir, "final_model"))
print("reloaded:", reloaded.model_name)
