"""Reconstruction evaluator: SSIM / MSE of self-reconstructions.

Reference: ``src/multivae/metrics/reconstruction/reconstruction.py``. SSIM
is our jax implementation (``ops/ssim.py``) instead of torchmetrics.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ...ops.ssim import ssim
from ...utils.model_output import ModelOutput
from ..base.evaluator_class import Evaluator
from .reconstruction_config import ReconstructionConfig


class Reconstruction(Evaluator):
    """Reconstruction metrics per conditioning subset."""

    def __init__(self, model, test_dataset, output=None, eval_config=None):
        if eval_config is None:
            eval_config = ReconstructionConfig()
        super().__init__(model, test_dataset, output, eval_config)
        self.metric_name = eval_config.metric

    def reconstruction_from_subset(self, subset: List[str]):
        """Reference ``reconstruction_from_subset`` (``:39-80``)."""
        if self.metric_name == "SSIM":
            vals = []
            weights = []
            for batch in self.test_loader:
                valid = np.asarray(batch.weights) > 0
                # decode ALL modalities and read the subset: keeps the
                # whole subset sweep on one decode program (see
                # docs/PERFORMANCE.md, subset-sweep section)
                output = self.model.predict(batch, list(subset),
                                            list(self.model.encoders),
                                            ignore_incomplete=True)
                for mod in subset:
                    preds = np.asarray(output[mod])[valid]
                    target = np.asarray(batch.data[mod])[valid]
                    vals.append(float(ssim(preds, target)))
                    weights.append(valid.sum())
            mean_recon_error = float(np.average(vals, weights=weights))
        elif self.metric_name == "MSE":
            total = 0.0
            n_data = 0
            for batch in self.test_loader:
                valid = np.asarray(batch.weights) > 0
                # decode ALL modalities and read the subset: keeps the
                # whole subset sweep on one decode program (see
                # docs/PERFORMANCE.md, subset-sweep section)
                output = self.model.predict(batch, list(subset),
                                            list(self.model.encoders),
                                            ignore_incomplete=True)
                for mod in subset:
                    diff2 = (np.asarray(output[mod])[valid]
                             - np.asarray(batch.data[mod])[valid]) ** 2
                    total += diff2.sum()
                    n_data += diff2.shape[0]
            mean_recon_error = total / n_data
        else:
            raise AttributeError(
                "Unrecognized metric name for reconstruction error."
            )

        self.logger.info("Subset %s reconstruction : %s", subset,
                         mean_recon_error)
        self.metrics[
            f"{subset} reconstruction error ({self.metric_name})"
        ] = mean_recon_error
        return mean_recon_error

    def eval(self):
        """Joint + unimodal reconstruction metrics (reference ``:82-92``)."""
        self.reconstruction_from_subset(list(self.model.encoders.keys()))
        for mod in self.model.encoders.keys():
            self.reconstruction_from_subset([mod])
        self.log_to_wandb()
        return ModelOutput(**self.metrics)
