"""PUMAS-style summary-statistics train/validation splitting.

Re-implements the capability the reference gets from magenpy's
``sumstats_train_test_split`` (used at BayesPRSModel.py:151-187): subsample GWAS
summary statistics *without individual-level data* (Zhao et al. 2021):

    beta_train ~ N(beta_hat, (1/n_t - 1/n) * Sigma),   n_t = prop_train * n
    beta_test  = (n * beta_hat - n_t * beta_train) / (n - n_t)

For standardized effects, Sigma is the LD matrix; we draw LD-correlated noise
using per-block Cholesky factors of the blocked LD (falling back to independent
noise when a block is not PSD even after jitter).
"""

import numpy as np

from ..ops.block_ld import blockld_to_dense


def _block_chol(R, jitter=1e-3):
    m = R.shape[0]
    for j in (0.0, jitter, 10 * jitter, 100 * jitter):
        try:
            return np.linalg.cholesky(R + j * np.eye(m)), True
        except np.linalg.LinAlgError:
            continue
    return None, False


def sumstats_train_test_split(dataset, prop_train=0.8, seed=None,
                              ld_aware=True):
    """Split the dataset's standardized betas into train/test pseudo-replicates.

    :param dataset: a SummaryStatsDataset.
    :param prop_train: fraction of the GWAS sample assigned to training.
    :returns: {chrom: {'train_beta': ..., 'test_beta': ...}}
    """
    rng = np.random.default_rng(seed)
    out = {}

    # Build per-chromosome noise, correlated within LD blocks when possible:
    for ci, c in enumerate(dataset.layout.chromosomes):
        beta = np.asarray(dataset.std_beta[c], dtype=np.float64)
        n = np.asarray(dataset.n_per_snp[c], dtype=np.float64)
        m_c = len(beta)
        n_t = prop_train * n
        var_scale = np.maximum(1.0 / n_t - 1.0 / n, 0.0)

        z = rng.standard_normal(m_c)
        if ld_aware:
            # correlate the noise within each diagonal LD block:
            b0, b1 = dataset.layout.chrom_block_range[ci]
            B = dataset.layout.block_size
            diag = np.asarray(dataset.ld.diag[b0:b1], dtype=np.float64) * dataset.ld.scale
            # map chromosome-local indices to block-local positions:
            flat = dataset.layout.flat_index
            # chromosome c occupies a contiguous range of flat_index entries:
            start = sum(dataset.layout.chrom_sizes[:ci])
            idx = flat[start:start + m_c] - b0 * B
            corr = np.empty(m_c)
            for b in range(b1 - b0):
                sel = (idx >= b * B) & (idx < (b + 1) * B)
                if not sel.any():
                    continue
                loc = idx[sel] - b * B
                Rb = diag[b][np.ix_(loc, loc)]
                L, ok = _block_chol(Rb)
                corr[sel] = (L @ z[sel]) if ok else z[sel]
            z = corr

        noise = np.sqrt(var_scale) * z
        train_beta = beta + noise
        test_beta = (n * beta - n_t * train_beta) / (n - n_t)
        out[c] = {'train_beta': train_beta, 'test_beta': test_beta}

    return out
