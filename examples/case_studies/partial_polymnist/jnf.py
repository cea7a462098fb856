"""JNF on partial PolyMNIST (reference case-study parity:
``examples/case_studies/benchmarking_on_partial_polymnist/jnf.py``).
JNF is two-stage (joint VAE, then flows) -> MultistageTrainer."""

from global_config import (
    argument_parser,
    base_config,
    base_training_config,
    eval_model,
    get_datasets,
    make_callbacks,
    make_decoders,
    make_encoders,
    model_save_path,
)

from multivae_tpu.models import JNF, JNFConfig
from multivae_tpu.trainers import MultistageTrainer, MultistageTrainerConfig

args = argument_parser().parse_args()
train_data, test_data = get_datasets(args)

model_config = JNFConfig(
    warmup=base_training_config["num_epochs"] // 2, **base_config,
)
model = JNF(model_config, encoders=make_encoders(), decoders=make_decoders(),
            seed=args.seed)

trainer_config = MultistageTrainerConfig(
    **base_training_config, seed=args.seed,
    output_dir=model_save_path(model, args),
)
trainer = MultistageTrainer(
    model, train_data, training_config=trainer_config,
    callbacks=make_callbacks(trainer_config, model_config),
)
trainer.train()

best = trainer.best_model
eval_model(best, trainer.training_dir, test_data)
