"""Metrics & visualization (mirrors the reference tutorial
``examples/tutorial_notebooks/computing_visualization_and_metrics.ipynb``).

Shows the evaluator suite on a tiny trained model: coherence (with toy
classifiers), joint likelihood, reconstruction quality, latent
clustering, and sample-grid visualization::

    python examples/tutorials/computing_visualization_and_metrics.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

# %% 1. Train a tiny model on 3-class structured data.
import jax.numpy as jnp

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.metrics import (
    CoherenceEvaluator,
    CoherenceEvaluatorConfig,
    LikelihoodsEvaluator,
    LikelihoodsEvaluatorConfig,
    Reconstruction,
    ReconstructionConfig,
    Visualization,
    VisualizationConfig,
)
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

rng = np.random.default_rng(0)
N, CLASSES = 256, 3
labels = rng.integers(0, CLASSES, N)
centers = rng.uniform(0.2, 0.8, size=(CLASSES, 16))
imgs = (centers[labels] + rng.normal(size=(N, 16)) * 0.05).astype(np.float32)
test_data = MultimodalBaseDataset(
    {"img": imgs.reshape(N, 1, 4, 4), "vec": imgs[:, :8]}, labels=labels)

model = MVTCAE(MVTCAEConfig(
    n_modalities=2, latent_dim=8,
    input_dims={"img": (1, 4, 4), "vec": (8,)},
    decoders_dist={"img": "normal", "vec": "normal"},
), seed=0)
out_dir = "./tutorial_out_metrics"
BaseTrainer(model, test_data, training_config=BaseTrainerConfig(
    output_dir=out_dir, num_epochs=3, per_device_train_batch_size=64,
    learning_rate=1e-3)).train()


# %% 2. Coherences: classifiers are plain callables -> logits.
def nearest_center(c):
    c = jnp.asarray(c, jnp.float32)

    def clf(x):
        x = jnp.asarray(x, jnp.float32).reshape(x.shape[0], -1)
        return -((x[:, None] - c[None]) ** 2).sum(-1)

    return clf


clfs = {"img": nearest_center(centers.reshape(CLASSES, 1, 4, 4)
                              .reshape(CLASSES, -1)),
        "vec": nearest_center(centers[:, :8])}
coh = CoherenceEvaluator(
    model, clfs, test_data, output=out_dir,
    eval_config=CoherenceEvaluatorConfig(batch_size=128,
                                         num_classes=CLASSES))
print("coherence metrics:", {k: round(float(v), 3)
                             for k, v in coh.eval().items()})
coh.finish()

# %% 3. Joint likelihood (K-sample IWAE estimate).
lik = LikelihoodsEvaluator(
    model, test_data, output=out_dir,
    eval_config=LikelihoodsEvaluatorConfig(batch_size=128, K=50,
                                           batch_size_k=25))
print("joint NLL:", round(float(lik.eval()["joint_likelihood"]), 3))
lik.finish()

# %% 4. Reconstruction quality (MSE here; SSIM for image modalities).
rec = Reconstruction(model, test_data, output=out_dir,
                     eval_config=ReconstructionConfig(batch_size=128,
                                                      metric="MSE"))
print("reconstruction:", {k: round(float(v), 4)
                          for k, v in rec.eval().items()})
rec.finish()

# %% 5. Sample grids (PIL images written under output dir).
viz = Visualization(model, test_data, output=out_dir,
                    eval_config=VisualizationConfig(n_samples=4))
viz.eval()
viz.finish()
print("wrote visualization grids to", out_dir)
