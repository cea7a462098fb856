"""MVTCAE on partial PolyMNIST (reference case-study parity:
``examples/case_studies/benchmarking_on_partial_polymnist/mvtcae.py``)."""

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

from multivae_tpu.models import MVTCAE, MVTCAEConfig
from multivae_tpu.trainers import BaseTrainer

args = argument_parser().parse_args()
train_data, test_data = get_datasets(args)

model_config = MVTCAEConfig(beta=2.5, alpha=5.0 / 6.0, **base_config)
model = MVTCAE(model_config, encoders=make_encoders(), decoders=make_decoders(),
             seed=args.seed)

trainer_config = make_trainer_config(model, args, num_epochs=400)
trainer = BaseTrainer(
    model, train_data, training_config=trainer_config,
    callbacks=make_callbacks(trainer_config, model_config),
)
trainer.train()

best = trainer.best_model
eval_model(best, trainer.training_dir, test_data)
