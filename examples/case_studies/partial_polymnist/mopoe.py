"""MoPoE on partial PolyMNIST (reference case-study parity:
``examples/case_studies/benchmarking_on_partial_polymnist/mopoe.py``)."""

from global_config import (
    argument_parser,
    base_config,
    eval_model,
    get_datasets,
    make_callbacks,
    make_decoders,
    make_encoders,
    make_trainer_config,
)

from multivae_tpu.models import MoPoE, MoPoEConfig
from multivae_tpu.trainers import BaseTrainer

args = argument_parser().parse_args()
train_data, test_data = get_datasets(args)

model_config = MoPoEConfig(beta=2.5, **base_config)
model = MoPoE(model_config, encoders=make_encoders(), decoders=make_decoders(),
             seed=args.seed)

trainer_config = make_trainer_config(model, args, drop_last=True)
trainer = BaseTrainer(
    model, train_data, training_config=trainer_config,
    callbacks=make_callbacks(trainer_config, model_config),
)
trainer.train()

best = trainer.best_model
eval_model(best, trainer.training_dir, test_data)
