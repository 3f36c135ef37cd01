"""LD matrix estimation from genotype data.

Parity with the magenpy estimators the reference consumes
(``GWADataLoader.compute_ld`` with estimators {sample, windowed, block,
shrinkage}; SURVEY.md §2.6). All estimators return per-chromosome lists of dense
LD blocks ready for :func:`viprs_tpu.ops.block_ld.pack_dense_blocks`:

- ``sample``: one dense block per chromosome (R = X'X/n).
- ``block``: blocks delimited by LDetect-style boundary files — the production
  estimator (exactly block-diagonal).
- ``windowed``: banded R with entries zeroed beyond a kb window, emitted as
  boundary blocks at low-LD cut points (approximation of the band).
- ``shrinkage``: Wen-Stephens (2010) shrinkage of the sample correlations using
  genetic-map distances, applied on top of the block estimator.
"""

import logging

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def _corr(X):
    n = X.shape[0]
    lib = None
    try:
        from .native import load_native
        lib = load_native()
    except Exception:
        pass
    m = X.shape[1]
    if lib is not None and m >= 64:
        R = np.zeros((m, m), dtype=np.float64)
        Xc = np.ascontiguousarray(X, dtype=np.float64)
        lib.ld_block_accumulate(Xc.ctypes.data_as(lib.f64p), n, m,
                                R.ctypes.data_as(lib.f64p))
        return R / n
    return (X.T @ X) / n


def read_ldetect_blocks(block_file):
    """Parse an LDetect block boundary file (columns: chr start stop)."""
    df = pd.read_csv(block_file, sep=r'\s+')
    df.columns = [c.strip().lower() for c in df.columns]
    chrom_col = 'chr' if 'chr' in df.columns else df.columns[0]
    df[chrom_col] = df[chrom_col].astype(str).str.replace('chr', '', regex=False)
    return df.rename(columns={chrom_col: 'chr'})


def sample_ld(genotype, chrom=None):
    """Full sample correlation per chromosome: {chrom: [R]}"""
    out = {}
    for c in genotype.chromosomes if chrom is None else [chrom]:
        idx = np.where(genotype.bim['CHR'].values == c)[0]
        X = genotype.standardized(idx)
        out[c] = [_corr(X)]
    return out


def block_ld(genotype, ldetect_blocks=None, max_block_size=4096):
    """Block-diagonal LD with LDetect boundaries (or uniform chunks of
    ``max_block_size`` variants when no boundary file is given)."""
    out = {}
    for c in genotype.chromosomes:
        c_mask = genotype.bim['CHR'].values == c
        idx = np.where(c_mask)[0]
        pos = genotype.bim['POS'].values[idx]
        blocks = []
        if ldetect_blocks is not None:
            bdf = ldetect_blocks[ldetect_blocks['chr'].astype(str) == str(c)]
            bounds = sorted(set(bdf['start']).union(bdf['stop']))
            edges = np.searchsorted(pos, bounds)
            edges = sorted(set([0] + list(edges) + [len(idx)]))
        else:
            edges = list(range(0, len(idx), max_block_size)) + [len(idx)]
            edges = sorted(set(edges))
        for lo, hi in zip(edges[:-1], edges[1:]):
            if hi > lo:
                X = genotype.standardized(idx[lo:hi])
                blocks.append(_corr(X))
        out[c] = blocks
    return out


def windowed_ld(genotype, window_kb=1000):
    """Banded LD: correlations zeroed beyond ``window_kb``; emitted as blocks
    cut at window boundaries (each block spans <= 2x the window)."""
    out = {}
    for c in genotype.chromosomes:
        idx = np.where(genotype.bim['CHR'].values == c)[0]
        pos = genotype.bim['POS'].values[idx].astype(np.float64)
        blocks = []
        lo = 0
        while lo < len(idx):
            hi = int(np.searchsorted(pos, pos[lo] + 2 * window_kb * 1e3))
            hi = max(hi, lo + 1)
            X = genotype.standardized(idx[lo:hi])
            R = _corr(X)
            # zero entries beyond the window within the block:
            d = np.abs(pos[lo:hi, None] - pos[None, lo:hi])
            R[d > window_kb * 1e3] = 0.0
            blocks.append(R)
            lo = hi
        out[c] = blocks
    return out


def shrinkage_ld(genotype, ldetect_blocks=None, genetic_map_cm=None,
                 n_eff=11418.0, m_ref=183, cutoff=1e-3, max_block_size=4096):
    """Wen-Stephens shrinkage estimator: r_jk * exp(-rho_jk) with
    rho_jk = 4 * n_eff * d_cM/100 / (2 * m_ref), hard-thresholded at ``cutoff``.

    :param genetic_map_cm: per-variant genetic-map positions (cM); falls back to
        1 cM/Mb interpolation from base-pair positions.
    """
    raw = block_ld(genotype, ldetect_blocks, max_block_size=max_block_size)
    out = {}
    for c, blocks in raw.items():
        idx = np.where(genotype.bim['CHR'].values == c)[0]
        if genetic_map_cm is not None:
            cm = np.asarray(genetic_map_cm[c], dtype=np.float64)
        else:
            cm = genotype.bim['POS'].values[idx].astype(np.float64) / 1e6
        shrunk = []
        lo = 0
        for R in blocks:
            m_b = R.shape[0]
            d = np.abs(cm[lo:lo + m_b, None] - cm[None, lo:lo + m_b])
            rho = 4.0 * n_eff * (d / 100.0) / (2.0 * m_ref)
            S = R * np.exp(-rho)
            S[np.abs(S) < cutoff] = 0.0
            np.fill_diagonal(S, 1.0)
            shrunk.append(S)
            lo += m_b
        out[c] = shrunk
    return out


ESTIMATORS = {
    'sample': sample_ld,
    'block': block_ld,
    'windowed': windowed_ld,
    'shrinkage': shrinkage_ld,
}
