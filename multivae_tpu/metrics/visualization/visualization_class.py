"""Visualization module: unconditional / conditional sample grids -> PIL.

Reference: ``src/multivae/metrics/visualization/visualization_class.py``.
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np

from ...data.utils import adapt_shape, grid_to_pil, make_grid
from ...utils.model_output import ModelOutput
from ..base.evaluator_class import Evaluator
from .visualize_config import VisualizationConfig


class Visualization(Evaluator):
    """Grid visualizations of model generations."""

    def __init__(self, model, test_dataset, output=None, eval_config=None,
                 sampler=None):
        if eval_config is None:
            eval_config = VisualizationConfig()
        super().__init__(model, test_dataset, output, eval_config, sampler)
        self.n_samples = eval_config.n_samples
        self.n_data_cond = eval_config.n_data_cond

    def _to_image(self, recon: dict, nrow: int):
        recon, _ = adapt_shape(recon)
        grid = make_grid(np.concatenate(list(recon.values()), axis=0),
                         nrow=nrow)
        return grid_to_pil(grid)

    def unconditional_samples(self, **kwargs):
        """Reference ``unconditional_samples`` (``:72-118``)."""
        if self.sampler is None:
            samples = self.model.generate_from_prior(self.n_samples)
        else:
            samples = self.sampler.sample(self.n_samples)
        recon = self.model.decode(samples)
        recon = {
            m: self.test_dataset.transform_for_plotting(
                np.asarray(recon[m]), m)
            for m in recon
        }
        image = self._to_image(recon, self.n_samples)
        if self.output is not None:
            image.save(os.path.join(self.output, "unconditional.png"))
        if self.wandb_run is not None:  # pragma: no cover
            import wandb

            self.wandb_run.log({"unconditional_generation":
                                wandb.Image(image)})
        return image

    def conditional_samples_subset(self, subset: list,
                                   gen_mod: Union[list, str] = "all"):
        """Reference ``conditional_samples_subset`` (``:120-198``)."""
        idx = np.random.default_rng(0).permutation(
            len(self.test_dataset))[: self.n_data_cond]
        raw = self.test_dataset.get_batch(idx)
        from ...data.batch import batch_from_arrays

        batch = batch_from_arrays(data=raw["data"])

        recon = self.model.predict(batch, cond_mod=subset, gen_mod=gen_mod,
                                   N=self.n_samples, flatten=True,
                                   ignore_incomplete=True)
        out = {}
        for m in subset:
            out[f"original_{m}"] = self.test_dataset.transform_for_plotting(
                np.asarray(batch.data[m]), m)
        for m in recon:
            out[m] = self.test_dataset.transform_for_plotting(
                np.asarray(recon[m]), m)
        image = self._to_image(out, self.n_data_cond)
        if self.output is not None:
            image.save(os.path.join(
                self.output, f"conditional_from_subset_{subset}.png"))
        if self.wandb_run is not None:  # pragma: no cover
            import wandb

            self.wandb_run.log({f"conditional_from_subset_{subset}":
                                wandb.Image(image)})
        return image

    def reconstruction(self, modality: str, **kwargs):
        return self.conditional_samples_subset([modality], gen_mod=modality)

    def eval(self):
        image = self.unconditional_samples()
        return ModelOutput(unconditional_generation=image)
