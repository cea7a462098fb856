"""Reproduce CMVAE on PolyMNIST + cluster pruning (reference
``examples/cmvae/polymnist/{train,prune}.py``)::

    python examples/cmvae_polymnist.py --seed 0          # train
    python examples/cmvae_polymnist.py --prune PATH      # prune a model
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data.datasets import MMNISTDataset
from multivae_tpu.models import CMVAE, CMVAEConfig, AutoModel
from multivae_tpu.nn.mmnist import DecoderResnetMMNIST, EncoderResnetMMNIST
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

DATA_PATH = os.environ.get("MULTIVAE_DATA_PATH", ".data")
SAVE_PATH = os.environ.get("MULTIVAE_SAVE_PATH", "experiments")

parser = argparse.ArgumentParser()
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--num_epochs", type=int, default=150)
parser.add_argument("--prune", type=str, default=None,
                    help="path to a trained model folder: run entropy-based "
                         "cluster pruning instead of training")
args = parser.parse_args()

train_data = MMNISTDataset(data_path=DATA_PATH, split="train")

if args.prune:
    model = AutoModel.load_from_folder(args.prune)
    entropies = model.prune_clusters(train_data, batch_size=256)
    print("cluster entropies:", entropies)
    print("clusters kept:", model.n_clusters)
    model.save(os.path.join(args.prune, "pruned"))
    sys.exit(0)

modalities = ["m0", "m1", "m2", "m3", "m4"]
model_config = CMVAEConfig(
    n_modalities=5,
    K=1,
    latent_dim=32,
    modalities_specific_dim=32,
    number_of_clusters=40,
    input_dims={m: (3, 28, 28) for m in modalities},
    decoders_dist={m: "laplace" for m in modalities},
    decoder_dist_params={m: {"scale": 0.75} for m in modalities},
    prior_and_posterior_dist="laplace_with_softmax",
    learn_modality_prior=True,
    loss="iwae_looser",
    beta=2.5,
)
model = CMVAE(
    model_config,
    encoders={m: EncoderResnetMMNIST(private_latent_dim=32,
                                     shared_latent_dim=32)
              for m in modalities},
    decoders={m: DecoderResnetMMNIST(latent_dim=64) for m in modalities},
    seed=args.seed,
)

trainer_config = BaseTrainerConfig(
    output_dir=os.path.join(SAVE_PATH, "reproduce_cmvae",
                            f"seed_{args.seed}"),
    per_device_train_batch_size=32,
    num_epochs=args.num_epochs,
    learning_rate=1e-3,
    optimizer_cls="Adam",
    optimizer_params=dict(amsgrad=True),
    # device-resident data pipeline (dataset fits HBM); falls back
    # to the host loader automatically when it doesn't
    cache_on_device=True,
    steps_per_execution=25,
    steps_predict=5,
    seed=args.seed,
)
BaseTrainer(model, train_data, training_config=trainer_config).train()
