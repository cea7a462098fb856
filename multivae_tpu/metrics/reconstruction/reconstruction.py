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
from ..base.subset_sweep import is_fused_fallback_error
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

    def _fused_eval(self):
        """All evaluated subsets (joint + unimodal) in one compiled call
        per batch: per-sample SSIM/MSE computed in-graph, only (S, M, B)
        floats return to the host. Returns False when the model lacks
        the traced-subset encode (fall back to the loop)."""
        import jax.numpy as jnp

        from ...ops.ssim import ssim
        from ..base.subset_sweep import make_subset_sweep_fn, subset_rngs

        model = self.model
        mods = list(model.encoders.keys())
        subsets = [tuple(mods)] + [(m,) for m in mods]

        def post(m):
            if self.metric_name == "SSIM":
                def fn(recon, batch):
                    return ssim(recon, batch.data[m], reduce=False)
            elif self.metric_name == "MSE":
                def fn(recon, batch):
                    d2 = (recon - batch.data[m]) ** 2
                    return jnp.sum(
                        d2.reshape(d2.shape[0], -1), axis=-1,
                        dtype=jnp.float32)
            else:
                raise AttributeError(
                    "Unrecognized metric name for reconstruction error."
                )
            return fn

        sweep = make_subset_sweep_fn(model, subsets, N=1,
                                     postprocess={m: post(m) for m in mods})
        if sweep is None:
            return False

        params = model._ensure_params()
        # per (subset, mod-in-subset): running [weighted sum, count]
        sums = {s: {m: [0.0, 0] for m in s} for s in subsets}
        for batch in self.test_loader:
            rngs = subset_rngs(model, len(subsets))
            vals_dev = sweep(params, batch, rngs)
            # ONE device->host transfer for all modalities (per-array
            # fetches cost a full tunnel round trip apiece)
            stacked = np.asarray(
                jnp.stack([vals_dev[m] for m in mods]))
            vals = {m: stacked[i] for i, m in enumerate(mods)}
            valid = np.asarray(batch.weights) > 0
            for si, s in enumerate(subsets):
                for m in s:
                    sums[s][m][0] += float(vals[m][si][valid].sum())
                    sums[s][m][1] += int(valid.sum())
        for s in subsets:
            total = sum(sums[s][m][0] for m in s)
            n = sum(sums[s][m][1] for m in s)
            mean_recon_error = total / n
            subset_list = list(s)
            self.logger.info("Subset %s reconstruction : %s", subset_list,
                             mean_recon_error)
            self.metrics[
                f"{subset_list} reconstruction error ({self.metric_name})"
            ] = mean_recon_error
        return True

    def eval(self):
        """Joint + unimodal reconstruction metrics (reference ``:82-92``)."""
        fused = False
        if getattr(self.eval_config, "fused_sweep", True):
            try:
                fused = self._fused_eval()
            except Exception as e:
                # non-jittable metric/transform or device OOM only (see
                # is_fused_fallback_error); real bugs must raise
                if not is_fused_fallback_error(e):
                    raise
                self.logger.warning(
                    "fused reconstruction sweep unavailable "
                    "(%s); falling back to the per-subset "
                    "loop", e)
                fused = False
        if not fused:
            self.reconstruction_from_subset(list(self.model.encoders.keys()))
            for mod in self.model.encoders.keys():
                self.reconstruction_from_subset([mod])
        self.log_to_wandb()
        return ModelOutput(**self.metrics)
