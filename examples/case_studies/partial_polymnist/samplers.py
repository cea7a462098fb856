"""Joint-generation metrics with post-hoc samplers on a trained model
(reference case-study parity:
``examples/case_studies/benchmarking_on_partial_polymnist/samplers.py``).

Loads any saved model, fits a MAF sampler and a GMM sampler on the train
latents, then computes joint coherence and unconditional FID with each
sampler and with the model prior::

    python samplers.py --model_path experiments/.../final_model
"""

import os

from global_config import (
    CLASSIFIER_PATH,
    FID_WEIGHTS,
    argument_parser,
    get_datasets,
)

from multivae_tpu.metrics import (
    CoherenceEvaluator,
    CoherenceEvaluatorConfig,
    FIDEvaluator,
    FIDEvaluatorConfig,
)
from multivae_tpu.metrics.classifiers.mmnist import load_mmnist_classifiers
from multivae_tpu.models import AutoModel
from multivae_tpu.samplers import GaussianMixtureSampler, MAFSampler

parser = argument_parser()
parser.add_argument("--model_path", type=str, required=True)
args = parser.parse_args()

model = AutoModel.load_from_folder(args.model_path)
train_data, test_data = get_datasets(args)
output_dir = os.path.join(os.path.dirname(args.model_path), "metrics")

maf_sampler = MAFSampler(model)
maf_sampler.fit(train_data, num_epochs=20, batch_size=256,
                learning_rate=1e-3)

gmm_sampler = GaussianMixtureSampler(model)
gmm_sampler.fit(train_data)

classifiers = load_mmnist_classifiers(CLASSIFIER_PATH)

for sampler in [maf_sampler, gmm_sampler, None]:
    coh = CoherenceEvaluator(
        model, classifiers, test_data, output=output_dir,
        eval_config=CoherenceEvaluatorConfig(batch_size=128, num_classes=10),
        sampler=sampler,
    )
    coh.joint_coherence()
    coh.finish()

    if os.path.exists(FID_WEIGHTS):
        fid = FIDEvaluator(
            model, test_data, output=output_dir,
            eval_config=FIDEvaluatorConfig(
                batch_size=128, inception_weights_path=FID_WEIGHTS),
            sampler=sampler,
        )
        fid.eval()
        fid.finish()
