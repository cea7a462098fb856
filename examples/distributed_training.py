"""Multi-host data-parallel training on TPU pods.

TPU-native counterpart of the reference ``examples/distributed_training.py``
(which launches torch DDP via SLURM env vars). Here the parallelism is a
``jax.sharding.Mesh`` over every chip of every host: each process loads its
shard of the batch, the jitted train step consumes globally-sharded arrays,
and XLA inserts the gradient all-reduce over ICI/DCN.

Launch one process per host, e.g. with SLURM:

    srun python distributed_training.py

The coordinator is configured through env vars (JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID) or TPU-pod auto-detection.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from multivae_tpu.data.datasets import MMNISTDataset
from multivae_tpu.models import MoPoE, MoPoEConfig
from multivae_tpu.trainers import BaseTrainer, BaseTrainerConfig

train_data = MMNISTDataset(data_path="./data", split="train")
eval_data = MMNISTDataset(data_path="./data", split="test")

model = MoPoE(MoPoEConfig(
    n_modalities=5,
    latent_dim=512,
    input_dims={f"m{i}": (3, 28, 28) for i in range(5)},
    decoders_dist={f"m{i}": "laplace" for i in range(5)},
    decoder_dist_params={f"m{i}": {"scale": 0.75} for i in range(5)},
))

trainer_config = BaseTrainerConfig(
    output_dir="./checkpoints",
    num_epochs=800,
    learning_rate=1e-3,
    per_device_train_batch_size=32,   # global batch = 32 * n_chips
    per_device_eval_batch_size=32,
    scheduler_cls="ReduceLROnPlateau",
    scheduler_params={"patience": 30},
    steps_saving=50,
    # multi-host rendezvous (filled from env if unset):
    coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS"),
    num_processes=(int(os.environ["JAX_NUM_PROCESSES"])
                   if "JAX_NUM_PROCESSES" in os.environ else None),
    process_id=(int(os.environ["JAX_PROCESS_ID"])
                if "JAX_PROCESS_ID" in os.environ else None),
    # Optional extensions beyond DDP parity:
    #   fsdp=True              -> ZeRO-shard params/optimizer over "data"
    #   n_model_devices=2      -> 2-D (data, model) mesh, Megatron-style
    #                             column sharding of the dense kernels
    #   checkpoint_backend="orbax" -> sharded TrainState checkpoints
    #                             (exact-trajectory resume, no host gather)
    #   cache_on_device=True   -> dataset resident in HBM, zero per-step
    #                             host transfers (single-host meshes);
    #   device_cache_layout="sharded" -> rows sharded over the data axis
    #                             (1/N of the dataset per device — caches
    #                             datasets N x larger than one chip's
    #                             budget; batches stay bit-identical)
)

trainer = BaseTrainer(model, train_data, eval_dataset=eval_data,
                      training_config=trainer_config)
trainer.train()
