"""Train MVTCAE on CUB (images + captions) (reference
``examples/mvtcae/training_on_cub.py``): resnet image nets + transformer
text encoder, categorical text decoder, beta 5.0, alpha 0.9::

    python examples/mvtcae_cub.py --seed 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data.datasets import CUB
from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.nn import BaseAEConfig
from multivae_tpu.nn.cub import (
    CUB_Resnet_Decoder,
    CUB_Resnet_Encoder,
    CubTextDecoderMLP,
    CubTextEncoder,
)
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

DATA_PATH = os.environ.get("MULTIVAE_DATA_PATH", ".data")
SAVE_PATH = os.environ.get("MULTIVAE_SAVE_PATH", "experiments")

parser = argparse.ArgumentParser()
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--num_epochs", type=int, default=100)
args = parser.parse_args()

train_data = CUB(DATA_PATH, "train", im_size=(64, 64), output_type="tokens")
eval_data = CUB(DATA_PATH, "eval", im_size=(64, 64), output_type="tokens")

model_config = MVTCAEConfig(
    n_modalities=2,
    input_dims={
        "image": (3, 64, 64),
        "text": (train_data.max_words_in_caption, train_data.vocab_size),
    },
    latent_dim=64,
    decoders_dist={"image": "laplace", "text": "categorical"},
    beta=5.0,
    alpha=0.9,
)
encoders = {
    "image": CUB_Resnet_Encoder(latent_dim=model_config.latent_dim),
    "text": CubTextEncoder(
        latent_dim=model_config.latent_dim,
        max_sentence_length=train_data.max_words_in_caption,
        ntokens=train_data.vocab_size,
        embed_size=512, ff_size=128, n_layers=2, nhead=2, dropout=0.1,
    ),
}
decoders = {
    "image": CUB_Resnet_Decoder(latent_dim=model_config.latent_dim),
    "text": CubTextDecoderMLP(BaseAEConfig(
        latent_dim=model_config.latent_dim,
        input_dim=(train_data.max_words_in_caption, train_data.vocab_size),
    )),
}
model = MVTCAE(model_config, encoders=encoders, decoders=decoders,
               seed=args.seed)

trainer_config = BaseTrainerConfig(
    output_dir=os.path.join(SAVE_PATH, "mvtcae_cub", f"seed_{args.seed}"),
    per_device_train_batch_size=64,
    num_epochs=args.num_epochs,
    learning_rate=1e-3,
    optimizer_cls="Adam",
    steps_predict=5,
    seed=args.seed,
)
BaseTrainer(model, train_data, eval_dataset=eval_data,
            training_config=trainer_config).train()
