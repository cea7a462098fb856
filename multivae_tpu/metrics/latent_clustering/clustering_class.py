"""Latent clustering evaluator: k-means + majority-label accuracy.

Reference: ``src/multivae/metrics/latent_clustering/clustering_class.py``.
k-means stays sklearn on the host (offline fit); embeddings come from the
jitted encode path.
"""

from __future__ import annotations

import numpy as np

from ...data.loader import DataLoader
from ...utils.model_output import ModelOutput
from ..base.evaluator_class import Evaluator
from .clustering_config import ClusteringConfig


class Clustering(Evaluator):
    """k-means on joint embeddings, majority-label cluster accuracy."""

    def __init__(self, model, test_dataset, train_dataset, output=None,
                 eval_config=None):
        if eval_config is None:
            eval_config = ClusteringConfig()
        super().__init__(model, test_dataset, output, eval_config)
        self.num_samples_for_fit = eval_config.num_samples_for_fit
        self.n_fits = eval_config.number_of_runs
        self.use_mean = eval_config.use_mean
        if eval_config.clustering_method == "kmeans":
            from sklearn.cluster import KMeans

            self.clustering = KMeans(n_clusters=eval_config.n_clusters,
                                     max_iter=300, n_init="auto")
        self.train_dataset = train_dataset

    def fit_clustering(self, mods="all"):
        """Fit k-means on train embeddings; majority label per cluster
        (reference ``:54-85``)."""
        dl = DataLoader(self.train_dataset,
                        min(self.batch_size, len(self.train_dataset)),
                        shuffle=True)
        list_z, labels = [], []
        n_samples = 0
        for batch in dl:
            if (self.num_samples_for_fit is not None
                    and n_samples > self.num_samples_for_fit):
                break
            valid = np.asarray(batch.weights) > 0
            z = self.model.encode(batch, mods, return_mean=self.use_mean,
                                  ignore_incomplete=True).z
            list_z.append(np.asarray(z)[valid])
            if batch.labels is not None:
                labels.append(np.asarray(batch.labels)[valid])
            n_samples += int(valid.sum())

        all_z = np.concatenate(list_z)
        cluster_labels = self.clustering.fit_predict(all_z)
        self.labels_dict = {str(c): c for c in np.unique(cluster_labels)}
        if labels:
            labels = np.concatenate(labels).astype(np.int64)
            if len(labels) == len(cluster_labels):
                for c in np.unique(cluster_labels):
                    maj = np.bincount(labels[cluster_labels == c]).argmax()
                    self.labels_dict[str(c)] = maj

    def cluster_accuracy(self, mods="all"):
        """Reference ``cluster_accuracy`` (``:87-113``)."""
        mean_acc = []
        for _ in range(self.n_fits):
            self.fit_clustering(mods)
            acc = 0
            n_samples = 0
            for batch in self.test_loader:
                valid = np.asarray(batch.weights) > 0
                z = self.model.encode(batch, mods,
                                      return_mean=self.use_mean,
                                      ignore_incomplete=True).z
                clabels = self.clustering.predict(np.asarray(z)[valid])
                pred = np.array([self.labels_dict[str(c)] for c in clabels])
                true = np.asarray(batch.labels)[valid]
                acc += np.sum(pred == true)
                n_samples += len(pred)
            mean_acc.append(acc / n_samples)
        accuracy = float(np.mean(mean_acc))
        self.metrics["cluster_accuracy"] = accuracy
        self.logger.info("Cluster accuracy is %s", accuracy)
        return ModelOutput(cluster_accuracy=accuracy)

    def eval(self):
        output = self.cluster_accuracy("all")
        self.log_to_wandb()
        return output
