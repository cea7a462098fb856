"""Joint-NLL evaluator — the north-star evaluation (SURVEY §3.4).

Reference: ``src/multivae/metrics/likelihoods/likelihoods.py``. Each
model's ``compute_joint_nll`` is already a single compiled chunk-scanned
program on TPU; this module just batches the dataset through it.
"""

from __future__ import annotations

import numpy as np

from ...utils.model_output import ModelOutput
from ..base.evaluator_class import Evaluator
from .likelihoods_config import LikelihoodsEvaluatorConfig


class LikelihoodsEvaluator(Evaluator):
    """Computes the K-sample IWAE estimate of the joint NLL."""

    def __init__(self, model, test_dataset, output=None, eval_config=None,
                 sampler=None):
        if eval_config is None:
            eval_config = LikelihoodsEvaluatorConfig()
        super().__init__(model, test_dataset, output, eval_config, sampler)
        self.num_samples = eval_config.num_samples
        self.batch_size_k = eval_config.batch_size_k
        self.unified = eval_config.unified_implementation

    def eval(self):
        self.joint_nll()
        self.log_to_wandb()
        return ModelOutput(**self.metrics)

    def joint_nll(self):
        """Sum the per-batch NLLs.

        Loader padding rows carry ``weights == 0``: the scalar
        ``compute_joint_nll`` kernels mask them on-device, and the
        vector-valued ``compute_joint_nll_paper`` is masked here — so the
        final partial batch keeps the padded shape and never retraces
        (VERDICT r1 item 7).
        """
        # per-batch results stay device-side during the loop (each
        # float()/np.asarray is a full device round trip — 44 ms on a
        # tunneled TPU); ONE batched fetch at the end.
        import jax.numpy as jnp

        partials = []
        for batch in self.test_loader:
            if self.unified or not hasattr(self.model,
                                           "compute_joint_nll_paper"):
                partials.append(self.model.compute_joint_nll(
                    batch, self.num_samples, self.batch_size_k
                ))
            else:
                self.logger.info("Using the paper version of the joint nll.")
                nll = self.model.compute_joint_nll_paper(
                    batch, self.num_samples, self.batch_size_k
                )
                if getattr(nll, "ndim", 0) == 0:
                    # scalar variants (e.g. MoPoE) mask weights on-device
                    partials.append(nll)
                else:
                    # vector variants (e.g. MMVAE) return per-sample NLLs
                    partials.append(jnp.sum(
                        jnp.asarray(nll) * (batch.weights > 0),
                        dtype=jnp.float32))
        ll = float(np.sum(np.asarray(jnp.stack(
            [jnp.asarray(p, jnp.float32) for p in partials]))))
        joint_nll = ll / self.n_data
        self.logger.info("Mean Joint likelihood : %s", joint_nll)
        self.metrics["joint_likelihood"] = joint_nll
        return joint_nll

    def joint_nll_from_subset(self, subset):
        """Subset-posterior NLL (MoPoE only, reference ``:58-77``)."""
        if hasattr(self.model, "_compute_joint_nll_from_subset_encoding"):
            ll = 0.0
            for batch in self.test_loader:
                ll += float(self.model._compute_joint_nll_from_subset_encoding(
                    subset, batch, self.num_samples, self.batch_size_k
                ))
            joint_nll = ll / self.n_data
            self.logger.info("Joint likelihood from subset %s", joint_nll)
            self.metrics[f"Joint likelihood from subset {subset}"] = joint_nll
            return joint_nll
        return None
