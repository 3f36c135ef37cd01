"""Simple LD-score-regression heritability estimate.

The reference initializes sigma_epsilon/tau_beta from magenpy's ``simple_ldsc``
(use-site VIPRS.py:284-292). Method-of-moments estimator:

    E[chi2_j] = 1 + n * h2 * l_j / M       (no intercept/confounding term)
    h2_hat    = M * (mean(chi2) - 1) / (n * mean(l))

with l_j the LD score of variant j (sum over k of r_jk^2).
"""

import numpy as np

from ..utils.compute import dict_concat


def simple_ldsc(dataset):
    """h2 estimate from the dataset's summary statistics and LD scores.

    Cached per dataset (alongside its device-input caches): the estimate is a
    pure function of the dataset, and every fresh model fit over the same
    data re-derives it during ``initialize_theta`` (reference
    VIPRS.py:284-292) — ~16 ms of host reduction at 1.1M variants that the
    sub-second fit path should not repay."""
    cache = getattr(dataset, '_mesh_ld_cache', None)
    if cache is not None and 'ldsc_h2' in cache:
        return cache['ldsc_h2']
    ld_scores = dict_concat(dataset.compute_ld_scores())
    std_beta = dict_concat(dataset.std_beta)
    n = dict_concat(dataset.n_per_snp).astype(np.float64)

    # recover chi2 from the pseudo-correlation r = z/sqrt(n + z^2):
    r2 = np.clip(np.asarray(std_beta, dtype=np.float64) ** 2, 0.0, 1.0 - 1e-12)
    chi2 = n * r2 / (1.0 - r2)

    m = len(std_beta)
    denom = np.mean(n) * np.mean(ld_scores)
    h2 = 0.0 if denom <= 0 else float(m * (np.mean(chi2) - 1.0) / denom)
    if cache is not None:
        cache['ldsc_h2'] = h2
    return h2
