"""Reproduce the MMVAE+ PolyMNIST results (reference
``examples/mmvae_plus/mmnist.py``): resnet encoders/decoders, latent 32 +
private 32, laplace decoders with scale 0.75, beta 2.5, iwae_looser.

K=10 trains 50 epochs; K=1 trains 150 (paper protocol)::

    python examples/mmvae_plus_polymnist.py --K 1 --seed 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data.datasets import MMNISTDataset
from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig
from multivae_tpu.nn.mmnist import DecoderResnetMMNIST, EncoderResnetMMNIST
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

DATA_PATH = os.environ.get("MULTIVAE_DATA_PATH", ".data")
SAVE_PATH = os.environ.get("MULTIVAE_SAVE_PATH", "experiments")

parser = argparse.ArgumentParser()
parser.add_argument("--K", type=int, default=1)
parser.add_argument("--seed", type=int, default=0)
args = parser.parse_args()

modalities = ["m0", "m1", "m2", "m3", "m4"]
model_config = MMVAEPlusConfig(
    n_modalities=5,
    K=args.K,
    decoders_dist={m: "laplace" for m in modalities},
    decoder_dist_params={m: {"scale": 0.75} for m in modalities},
    prior_and_posterior_dist="laplace_with_softmax",
    beta=2.5,
    modalities_specific_dim=32,
    latent_dim=32,
    input_dims={m: (3, 28, 28) for m in modalities},
    learn_shared_prior=False,
    learn_modality_prior=True,
    loss="iwae_looser",
    use_remat=True,  # resnets at K=10 need rematerialization to fit HBM
)

encoders = {m: EncoderResnetMMNIST(
    private_latent_dim=model_config.modalities_specific_dim,
    shared_latent_dim=model_config.latent_dim) for m in modalities}
decoders = {m: DecoderResnetMMNIST(
    latent_dim=model_config.latent_dim + model_config.modalities_specific_dim)
    for m in modalities}

model = MMVAEPlus(model_config, encoders=encoders, decoders=decoders,
                  seed=args.seed)

train_data = MMNISTDataset(data_path=DATA_PATH, split="train")

training_config = BaseTrainerConfig(
    per_device_train_batch_size=32,
    per_device_eval_batch_size=32,
    num_epochs=50 if model_config.K == 10 else 150,
    learning_rate=1e-3,
    output_dir=os.path.join(SAVE_PATH, "reproduce_mmvaePlus",
                            f"K__{model_config.K}"),
    steps_predict=5,
    optimizer_cls="Adam",
    optimizer_params=dict(amsgrad=True),
    seed=args.seed,
)

trainer = BaseTrainer(model, train_data, training_config=training_config)
trainer.train()
