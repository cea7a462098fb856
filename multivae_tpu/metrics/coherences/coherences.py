"""Coherence evaluator: cross-modal + joint generation coherence.

Reference: ``src/multivae/metrics/coherences/coherences.py``. Classifier
accuracy (torchmetrics MulticlassAccuracy(average=None) there) is a simple
per-class confusion count here. Classifiers are arbitrary callables mapping
a generated modality batch to class logits (e.g. a bound flax module).
"""

from __future__ import annotations

from itertools import combinations
from typing import Dict, List, Optional

import numpy as np

from ...utils.model_output import ModelOutput
from ..base.evaluator_class import Evaluator
from ..base.subset_sweep import is_fused_fallback_error
from .coherences_config import CoherenceEvaluatorConfig


class _PerClassAccuracy:
    """Running per-class accuracy (recall per true class)."""

    def __init__(self, num_classes: int):
        self.correct = np.zeros(num_classes)
        self.total = np.zeros(num_classes)
        self.num_classes = num_classes

    def update(self, preds_logits, labels):
        preds = np.argmax(np.asarray(preds_logits), axis=-1).ravel()
        self.update_preds(preds, labels)

    def update_preds(self, preds, labels):
        """Update from already-argmaxed class predictions (the fused
        sweep computes the argmax in-graph)."""
        preds = np.asarray(preds).ravel()
        labels = np.asarray(labels).astype(int).ravel()
        for c in range(self.num_classes):
            sel = labels == c
            self.total[c] += sel.sum()
            self.correct[c] += (preds[sel] == c).sum()

    def compute(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.where(self.total > 0, self.correct / self.total, 0.0)
        return acc


class CoherenceEvaluator(Evaluator):
    """Cross and joint coherence via pretrained classifiers."""

    def __init__(self, model, classifiers: Dict, test_dataset,
                 output: Optional[str] = None, eval_config=None,
                 sampler=None):
        if eval_config is None:
            eval_config = CoherenceEvaluatorConfig()
        super().__init__(model, test_dataset, output, eval_config, sampler)
        self.clfs = classifiers
        self.include_recon = eval_config.include_recon
        self.nb_samples_for_joint = eval_config.nb_samples_for_joint
        self.nb_samples_for_cross = eval_config.nb_samples_for_cross
        self.num_classes = eval_config.num_classes
        self.give_details_per_classes = eval_config.give_details_per_class
        assert self.num_classes is not None, \
            "Please provide the number of classes"

    def cross_coherences(self):
        """All subset -> modality coherences (reference ``:51-109``).

        With ``fused_sweep`` (default) the whole 2^M-2 subset sweep runs
        as ONE compiled device call per test batch — the (S, M) subset
        matrix is vmapped over the traced-subset ``_encode_masked``,
        decode-all and the classifier argmax stay in-graph, and only
        (S, n_mods, N*B) int predictions come back to the host. The
        reference instead loops subsets x batches x modalities host-side
        (``coherences.py:51-188``)."""
        modalities = list(self.model.encoders.keys())
        per_subset = None
        if getattr(self.eval_config, "fused_sweep", True):
            per_subset = self._fused_subset_accuracies()
        if per_subset is None:
            return self._cross_coherences_sequential()

        accs, accs_per_class = [], []
        for n in range(1, self.model.n_modalities):
            accs.append([])
            accs_per_class.append([])
            for s in combinations(modalities, n):
                subset_dict, mean_acc, mean_acc_per_class = per_subset[s]
                self.metrics.update(subset_dict)
                accs[-1].append(mean_acc)
                accs_per_class[-1].append(mean_acc_per_class)
        return self._aggregate_cross(accs, accs_per_class)

    def _fused_subset_accuracies(self):
        """One device call per batch for ALL subsets; returns
        {subset_tuple: (subset_dict, mean_acc, mean_acc_per_class)} or
        None when the model/classifiers can't run the fused path."""
        import jax.numpy as jnp

        from ..base.subset_sweep import (
            all_subsets,
            make_subset_sweep_fn,
            subset_rngs,
        )

        model = self.model
        modalities = list(model.encoders.keys())
        subsets = all_subsets(modalities, 1, model.n_modalities - 1)
        clfs = self.clfs

        def post(m):
            def fn(recon, batch):
                return jnp.argmax(clfs[m](recon), axis=-1)
            return fn

        sweep = make_subset_sweep_fn(
            model, subsets, N=self.nb_samples_for_cross,
            postprocess={m: post(m) for m in modalities})
        if sweep is None:
            return None

        trackers = {
            (s, m): _PerClassAccuracy(self.num_classes)
            for s in subsets for m in modalities
            if (m not in s) or self.include_recon
        }
        params = model._ensure_params()
        first = True
        for batch in self.test_loader:
            if batch.labels is None:
                raise AttributeError(
                    "Cross-modal coherence cannot be computed on a dataset "
                    "without labels"
                )
            rngs = subset_rngs(model, len(subsets))
            if first:
                # compile probe: non-jittable classifiers / exotic models
                # drop to the sequential path
                try:
                    preds_dev = sweep(params, batch, rngs)
                except Exception as e:
                    # non-jittable classifier or device OOM only (see
                    # is_fused_fallback_error); real bugs must raise
                    if not is_fused_fallback_error(e):
                        raise
                    self.logger.warning(
                        "fused subset sweep unavailable "
                        "(%s); falling back to the per-subset "
                        "loop", e)
                    return None
                first = False
            else:
                preds_dev = sweep(params, batch, rngs)
            # ONE device->host transfer for all modalities (each
            # individual np.asarray is a full tunnel round trip,
            # measured ~44 ms apiece)
            mods_order = list(preds_dev)
            stacked = np.asarray(
                jnp.stack([preds_dev[m] for m in mods_order]))
            preds = {m: stacked[i] for i, m in enumerate(mods_order)}

            valid = np.asarray(batch.weights) > 0
            labels = np.asarray(batch.labels)
            if self.nb_samples_for_cross > 1:
                labels = np.concatenate(
                    [labels] * self.nb_samples_for_cross)
                valid = np.concatenate([valid] * self.nb_samples_for_cross)
            for si, s in enumerate(subsets):
                for m in modalities:
                    if (s, m) not in trackers:
                        continue
                    trackers[(s, m)].update_preds(
                        preds[m][si][valid], labels[valid])

        out = {}
        for s in subsets:
            subset_name = "_".join(s)
            acc_per_class = {
                f"{subset_name}_to_{m}": trackers[(s, m)].compute()
                for m in modalities if (s, m) in trackers
            }
            acc = {k: float(v.mean()) for k, v in acc_per_class.items()}
            self.logger.info("Subset %s accuracies %s", list(s), acc)
            mean_pair_acc = float(np.mean(list(acc.values())))
            mean_acc_per_class = np.mean(
                np.stack(list(acc_per_class.values())), axis=0)
            out[s] = (acc, mean_pair_acc, mean_acc_per_class)
        return out

    def _cross_coherences_sequential(self):
        """Per-subset loop (reference semantics; fallback path)."""
        modalities = list(self.model.encoders.keys())
        accs, accs_per_class = [], []
        for n in range(1, self.model.n_modalities):
            accs.append([])
            accs_per_class.append([])
            for s in combinations(modalities, n):
                subset_dict, mean_acc, mean_acc_per_class = (
                    self.coherence_from_subset(
                        list(s), return_accuracies_per_labels=True)
                )
                self.metrics.update(subset_dict)
                accs[-1].append(mean_acc)
                accs_per_class[-1].append(mean_acc_per_class)
        return self._aggregate_cross(accs, accs_per_class)

    def _aggregate_cross(self, accs, accs_per_class):
        mean_accs = [float(np.mean(a)) for a in accs]
        std_accs = [float(np.std(a)) for a in accs]
        mean_accs_per_class = [np.mean(np.stack(a), axis=0)
                               for a in accs_per_class]

        for i, (m, s) in enumerate(zip(mean_accs, std_accs)):
            self.logger.info(
                "Conditional accuracies for %s modalities : %s +- %s",
                i + 1, m, s,
            )
            self.metrics[f"mean_coherence_{i + 1}"] = m
            self.metrics[f"std_coherence_{i + 1}"] = s
            if self.give_details_per_classes:
                for c in range(self.num_classes):
                    self.metrics[f"mean_coherence_{i + 1}_class_{c}"] = float(
                        mean_accs_per_class[i][c]
                    )
        return mean_accs, std_accs

    def coherence_from_subset(self, subset: List[str],
                              return_accuracies_per_labels: bool = False):
        """Reference ``coherence_from_subset`` (``:111-188``)."""
        pred_mods = [m for m in self.model.encoders
                     if (m not in subset) or self.include_recon]
        subset_name = "_".join(subset)
        trackers = {m: _PerClassAccuracy(self.num_classes)
                    for m in pred_mods}

        for batch in self.test_loader:
            if batch.labels is None:
                raise AttributeError(
                    "Cross-modal coherence cannot be computed on a dataset "
                    "without labels"
                )
            valid = np.asarray(batch.weights) > 0
            # generate ALL modalities (decode is deterministic, so the
            # pred_mods outputs are identical) and read only pred_mods:
            # with the shared masked-subset encode this keeps the whole
            # 2^M-1 subset sweep on ONE encode + ONE decode XLA program
            # instead of one per subset — compiles dominate eval time on
            # the TPU tunnel.
            output = self.model.predict(
                batch, list(subset), list(self.model.encoders),
                N=self.nb_samples_for_cross, flatten=True,
                ignore_incomplete=True,
            )
            labels = np.asarray(batch.labels)
            if self.nb_samples_for_cross > 1:
                labels_rep = np.concatenate(
                    [labels] * self.nb_samples_for_cross)
                valid_rep = np.concatenate(
                    [valid] * self.nb_samples_for_cross)
            else:
                labels_rep, valid_rep = labels, valid
            for m in pred_mods:
                preds = np.asarray(self.clfs[m](output[m]))
                trackers[m].update(preds[valid_rep], labels_rep[valid_rep])

        acc_per_class = {
            f"{subset_name}_to_{m}": trackers[m].compute() for m in trackers
        }
        acc = {k: float(v.mean()) for k, v in acc_per_class.items()}
        self.logger.info("Subset %s accuracies %s", subset, acc)
        mean_pair_acc = float(np.mean(list(acc.values())))
        mean_acc_per_class = np.mean(
            np.stack(list(acc_per_class.values())), axis=0)
        if return_accuracies_per_labels:
            return acc, mean_pair_acc, mean_acc_per_class
        return acc, mean_pair_acc

    def _fused_joint_same_fn(self):
        """Jitted decode + classifier-argmax + agreement check: one
        dispatch and one scalar-sized fetch per chunk instead of one
        fetch per modality. Only for models whose ``_decode_mods`` IS
        the public decode path (the same ten families as the fused
        cross sweep); None otherwise."""
        if getattr(self.model, "_encode_masked", None) is None:
            return None
        import jax
        import jax.numpy as jnp

        model = self.model
        mods = tuple(model.decoders)
        clfs = self.clfs

        def fn(params, z, modalities_z):
            dec = model._decode_mods(params, z, mods,
                                     modalities_z=modalities_z)
            preds = [jnp.argmax(clfs[m](dec[m]), axis=-1) for m in mods]
            same = jnp.stack([p == preds[0] for p in preds]).all(axis=0)
            return same.astype(jnp.float32)

        return jax.jit(fn)

    def joint_coherence(self):
        """Generate from the prior/sampler and check label agreement
        (reference ``:190-236``)."""
        all_same = []
        samples_to_generate = self.nb_samples_for_joint
        fused_fn = (self._fused_joint_same_fn()
                    if getattr(self.eval_config, "fused_sweep", True)
                    else None)
        params = self.model._ensure_params()
        while samples_to_generate > 0:
            n = min(self.batch_size, samples_to_generate)
            if self.sampler is None:
                output_prior = self.model.generate_from_prior(n)
            else:
                output_prior = self.sampler.sample(n)
            if fused_fn is not None:
                z = output_prior["z"]
                if z.ndim == 1:
                    z = z[None]
                modalities_z = (None
                                if output_prior.get("one_latent_space", True)
                                else output_prior["modalities_z"])
                try:
                    same = np.asarray(fused_fn(params, z, modalities_z))
                except Exception as e:
                    # ONLY the non-jittable-classifier signature
                    # (TypeError: JAX's TracerArrayConversionError /
                    # ConcretizationTypeError are subclasses) or a
                    # device RESOURCE_EXHAUSTED — see
                    # is_fused_fallback_error. Anything else — shape
                    # bugs, other XLA failures — must surface, not
                    # silently degrade the metric to the slow path.
                    if not is_fused_fallback_error(e):
                        raise
                    self.logger.warning(
                        "fused joint-coherence unavailable "
                        "(%s); falling back to the "
                        "per-modality loop", e)
                    fused_fn = None
            if fused_fn is None:
                output_decode = self.model.decode(output_prior)
                labels = []
                for m in output_decode.keys():
                    preds = np.asarray(self.clfs[m](output_decode[m]))
                    labels.append(np.argmax(preds, axis=1))
                same = np.all(
                    np.stack([lab == labels[0] for lab in labels]), axis=0)
            all_same.append(np.asarray(same, np.float32))
            samples_to_generate -= n
        joint_coherence = float(np.concatenate(all_same).mean())
        sampler_name = "prior" if self.sampler is None else self.sampler.name
        self.logger.info("Joint coherence with sampler %s: %s", sampler_name,
                         joint_coherence)
        self.metrics[f"joint_coherence_{sampler_name}"] = joint_coherence
        return joint_coherence

    def eval(self):
        self.cross_coherences()
        self.joint_coherence()
        self.log_to_wandb()
        return ModelOutput(**self.metrics)
