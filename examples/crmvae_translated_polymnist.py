"""Reproduce CRMVAE on Translated PolyMNIST (reference
``examples/crmvae/train_on_translated_polymnist.py``): resnet nets,
latent 512, beta 0.1, laplace decoders scale 0.75::

    python examples/crmvae_translated_polymnist.py --seed 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data import random_split
from multivae_tpu.data.datasets import TranslatedMMNIST
from multivae_tpu.models import CRMVAE, CRMVAEConfig
from multivae_tpu.nn.mmnist import DecoderResnetMMNIST, EncoderResnetMMNIST
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

DATA_PATH = os.environ.get("MULTIVAE_DATA_PATH", ".data")
SAVE_PATH = os.environ.get("MULTIVAE_SAVE_PATH", "experiments")
BACKGROUNDS = os.path.join(DATA_PATH, "mmnist_backgrounds")

parser = argparse.ArgumentParser()
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--num_epochs", type=int, default=500)
args = parser.parse_args()

modalities = ["m0", "m1", "m2", "m3", "m4"]
full_train = TranslatedMMNIST(DATA_PATH, scale=0.75, translate=True,
                              n_modalities=5, background_path=BACKGROUNDS,
                              split="train")
train_data, eval_data = random_split(full_train, [0.85, 0.15],
                                     seed=args.seed)

model_config = CRMVAEConfig(
    n_modalities=5,
    latent_dim=512,
    input_dims={m: (3, 28, 28) for m in modalities},
    uses_likelihood_rescaling=False,
    decoders_dist={m: "laplace" for m in modalities},
    decoder_dist_params={m: {"scale": 0.75} for m in modalities},
    beta=0.1,
)
model = CRMVAE(
    model_config,
    encoders={m: EncoderResnetMMNIST(private_latent_dim=0,
                                     shared_latent_dim=512)
              for m in modalities},
    decoders={m: DecoderResnetMMNIST(latent_dim=512) for m in modalities},
    seed=args.seed,
)

trainer_config = BaseTrainerConfig(
    output_dir=os.path.join(SAVE_PATH, "reproduce_crmvae",
                            f"seed_{args.seed}"),
    per_device_train_batch_size=256,
    per_device_eval_batch_size=256,
    num_epochs=args.num_epochs,
    learning_rate=5e-4,
    optimizer_cls="Adam",
    drop_last=True,
    # device-resident data pipeline (dataset fits HBM); falls back
    # to the host loader automatically when it doesn't
    cache_on_device=True,
    steps_per_execution=25,
    steps_predict=5,
    seed=args.seed,
)
BaseTrainer(model, train_data, eval_dataset=eval_data,
            training_config=trainer_config).train()
