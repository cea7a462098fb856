"""Production inference endpoints: fixed-shape compiled predictors.

The reference has no serving layer (inference is ad-hoc ``model.predict``
calls). On TPU, production wants pre-compiled fixed-shape programs so
requests never retrace:

- ``Predictor`` — one program per (cond, gen, batch_size);
- ``AnySubsetPredictor`` — ONE program serving any conditioning pattern,
  per request row (PoE-family models);
- ``export()`` — serialize the compiled program (StableHLO via
  ``jax.export``) for a serving process without the model's Python code.

Run::

    python examples/serving_endpoint.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax

from multivae_tpu.data import MultimodalBaseDataset
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.serving import AnySubsetPredictor, Predictor
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

DIMS = {"image": (1, 8, 8), "audio": (16,)}

# A (briefly) trained model to serve.
rng = np.random.default_rng(0)
train_data = MultimodalBaseDataset({
    "image": rng.uniform(size=(128, *DIMS["image"])).astype(np.float32),
    "audio": rng.normal(size=(128, *DIMS["audio"])).astype(np.float32),
})
model = MVTCAE(MVTCAEConfig(
    n_modalities=2, latent_dim=8, input_dims=DIMS,
    decoders_dist={"image": "bernoulli", "audio": "normal"},
), seed=0)
with tempfile.TemporaryDirectory() as out:
    BaseTrainer(model, train_data, training_config=BaseTrainerConfig(
        output_dir=out, num_epochs=2, per_device_train_batch_size=32,
        learning_rate=1e-3)).train()

# 1. A fixed conditioning endpoint: image -> audio, batches up to 32.
pred = Predictor(model, cond_mod=["image"], gen_mod=["audio"],
                 batch_size=32).warmup()
out = pred({"image": rng.uniform(size=(5, *DIMS["image"])).astype(
    np.float32)})
print("audio from image:", out.audio.shape)

# 2. One endpoint for ANY conditioning pattern, per request row: rows
# 0-1 condition on {image}, row 2 on {image, audio}, row 3 on {audio}.
any_pred = AnySubsetPredictor(model, batch_size=32).warmup()
out = any_pred(
    {"image": rng.uniform(size=(4, *DIMS["image"])).astype(np.float32),
     "audio": rng.normal(size=(4, *DIMS["audio"])).astype(np.float32)},
    masks={"image": np.array([1, 1, 1, 0], np.float32),
           "audio": np.array([0, 0, 1, 1], np.float32)},
)
print("mixed-pattern batch:", {m: v.shape for m, v in out.items()})

# 3. Export the compiled program for a model-code-free serving process.
with tempfile.TemporaryDirectory() as td:
    path = pred.export(os.path.join(td, "endpoint.bin"))
    call = Predictor.load_exported(path)
    served = call(model.params,
                  {"image": np.zeros((32, *DIMS["image"]), np.float32)},
                  jax.random.key(0))
    print("exported endpoint output:",
          {m: v.shape for m, v in served.items()})
