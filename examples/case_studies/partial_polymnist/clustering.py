"""Latent-clustering metrics on a trained model (reference case-study
parity: ``examples/case_studies/benchmarking_on_partial_polymnist/
clustering.py``)::

    python clustering.py --model_path experiments/.../final_model
"""

import os

from global_config import argument_parser, get_datasets

from multivae_tpu.metrics import Clustering, ClusteringConfig
from multivae_tpu.models import AutoModel

parser = argument_parser()
parser.add_argument("--model_path", type=str, required=True)
args = parser.parse_args()

model = AutoModel.load_from_folder(args.model_path)
train_data, test_data = get_datasets(args)
output_dir = os.path.join(os.path.dirname(args.model_path), "metrics")

clustering = Clustering(
    model=model, test_dataset=test_data, train_dataset=train_data,
    eval_config=ClusteringConfig(number_of_runs=4),
    output=output_dir,
)
clustering.eval()
clustering.finish()
