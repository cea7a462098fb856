"""MMVAE on partial PolyMNIST (reference case-study parity:
``examples/case_studies/benchmarking_on_partial_polymnist/mmvae.py``)."""

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

from multivae_tpu.models import MMVAE, MMVAEConfig
from multivae_tpu.trainers import BaseTrainer

args = argument_parser().parse_args()
train_data, test_data = get_datasets(args)

model_config = MMVAEConfig(K=10, prior_and_posterior_dist='laplace_with_softmax', learn_prior=False, **base_config)
model = MMVAE(model_config, encoders=make_encoders(), decoders=make_decoders(),
             seed=args.seed)

trainer_config = make_trainer_config(model, args)
trainer = BaseTrainer(
    model, train_data, training_config=trainer_config,
    callbacks=make_callbacks(trainer_config, model_config),
)
trainer.train()

best = trainer.best_model
eval_model(best, trainer.training_dir, test_data)
