"""Post-hoc samplers (mirrors the reference tutorial
``examples/tutorial_notebooks/using_samplers.ipynb``).

Samplers fit the *aggregate posterior* of a trained model to improve
joint generation beyond the prior; all evaluators accept them::

    python examples/tutorials/using_samplers.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

# %% 1. Train a small model whose aggregate posterior we will fit.
from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.samplers import GaussianMixtureSampler, MAFSampler
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

rng = np.random.default_rng(0)
N = 256
train_data = MultimodalBaseDataset({
    "a": rng.normal(size=(N, 8)).astype(np.float32),
    "b": rng.normal(size=(N, 12)).astype(np.float32),
})

model = MVTCAE(MVTCAEConfig(
    n_modalities=2, latent_dim=8, input_dims={"a": (8,), "b": (12,)},
    decoders_dist={"a": "normal", "b": "normal"},
), seed=0)
trainer = BaseTrainer(model, train_data, training_config=BaseTrainerConfig(
    output_dir="./tutorial_out_samplers", num_epochs=3,
    per_device_train_batch_size=64, learning_rate=1e-3,
))
trainer.train()

# %% 2. A GMM fitted on the training latents (sklearn full covariance).
gmm = GaussianMixtureSampler(model)
gmm.fit(train_data)
z = gmm.sample(16)
print("GMM latents:", z.z.shape)

# %% 3. A masked autoregressive flow fitted on the training latents.
maf = MAFSampler(model)
maf.fit(train_data, num_epochs=3, batch_size=64)
z = maf.sample(16)
print("MAF latents:", z.z.shape)

# %% 4. Decode sampler latents into all modalities.
out = model.decode(z)
print("decoded from MAF samples:", {m: v.shape for m, v in out.items()
                                    if hasattr(v, "shape")})

# Evaluators take sampler= to compute joint metrics from sampler draws,
# e.g. CoherenceEvaluator(..., sampler=maf).joint_coherence().
