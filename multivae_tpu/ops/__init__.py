from .gaussian import (
    kl_divergence,
    poe,
    stable_poe,
    masked_poe,
    rsample_from_gaussian,
    gaussian_log_prob,
)
from .dists import set_decoder_dist, cross_entropy
from .subsets import all_subsets_mask, subsets_to_mask
from .gmm import fit_gmm, sample_gmm, GMMParams

__all__ = [
    "fit_gmm",
    "sample_gmm",
    "GMMParams",
    "kl_divergence",
    "poe",
    "stable_poe",
    "masked_poe",
    "rsample_from_gaussian",
    "gaussian_log_prob",
    "set_decoder_dist",
    "cross_entropy",
    "all_subsets_mask",
    "subsets_to_mask",
]
