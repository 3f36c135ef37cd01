"""plink BED/BIM/FAM genotype access.

Owns the genotype capability the reference gets from magenpy (BED-backed
``GWADataLoader`` construction, scoring, GWAS; SURVEY.md §2.6). The 2-bit BED
decoder prefers the native C++ kernel (native/ -> libviprs_native.so via ctypes)
and falls back to a vectorized NumPy lookup-table decode.
"""

import logging
import os

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

# plink1 BED 2-bit codes (SNP-major): 00 -> 2 copies of A1, 10 -> 1, 11 -> 0,
# 01 -> missing.
_CODE_TO_DOSAGE = np.array([2.0, np.nan, 1.0, 0.0], dtype=np.float64)

_BYTE_LUT = None


def _byte_lut():
    """(256, 4) lookup: byte value -> 4 dosages."""
    global _BYTE_LUT
    if _BYTE_LUT is None:
        lut = np.empty((256, 4), dtype=np.float64)
        for b in range(256):
            for i in range(4):
                lut[b, i] = _CODE_TO_DOSAGE[(b >> (2 * i)) & 0b11]
        _BYTE_LUT = lut
    return _BYTE_LUT


def _native_lib():
    from .native import load_native
    return load_native()


class GenotypeMatrix:
    """Lazy plink BED-backed genotype matrix (samples x variants).

    :ivar bim: variant table (CHR SNP CM POS A1 A2).
    :ivar fam: sample table (FID IID ... PHENO).
    """

    def __init__(self, bed_prefix, keep_samples=None, extract_snps=None):
        prefix = bed_prefix[:-4] if bed_prefix.endswith('.bed') else bed_prefix
        self.bed_path = prefix + '.bed'
        self.bim = pd.read_csv(prefix + '.bim', sep=r'\s+', header=None,
                               names=['CHR', 'SNP', 'CM', 'POS', 'A1', 'A2'])
        self.fam = pd.read_csv(prefix + '.fam', sep=r'\s+', header=None,
                               names=['FID', 'IID', 'father', 'mother',
                                      'sex', 'PHENO'])

        with open(self.bed_path, 'rb') as f:
            magic = f.read(3)
        assert magic == b'\x6c\x1b\x01', \
            f"{self.bed_path} is not a variant-major plink BED file."

        self._sample_idx = np.arange(len(self.fam))
        if keep_samples is not None:
            keep_set = set(map(tuple, keep_samples)) \
                if not isinstance(keep_samples, (set, frozenset)) else keep_samples
            mask = [(fid, iid) in keep_set or iid in keep_set
                    for fid, iid in zip(self.fam['FID'], self.fam['IID'])]
            self._sample_idx = np.where(mask)[0]
            self.fam = self.fam.iloc[self._sample_idx].reset_index(drop=True)

        self._snp_idx = np.arange(len(self.bim))
        if extract_snps is not None:
            mask = self.bim['SNP'].isin(set(extract_snps)).values
            self._snp_idx = np.where(mask)[0]
            self.bim = self.bim.iloc[self._snp_idx].reset_index(drop=True)

        self._n_total_samples = self._bed_samples_per_variant()

    def _bed_samples_per_variant(self):
        # full .fam row count defines the stride in the bed file:
        with open(self.bed_path[:-4] + '.fam') as f:
            return sum(1 for _ in f)

    @property
    def n(self):
        return len(self.fam)

    @property
    def m(self):
        return len(self.bim)

    @property
    def shape(self):
        return (self.n, self.m)

    @property
    def chromosomes(self):
        return sorted(self.bim['CHR'].unique())

    # ------------------------------------------------------------------ decode
    def dosages(self, snp_indices=None, impute=True):
        """Decode dosage matrix (n_samples, n_variants) float64; missing values
        mean-imputed when ``impute``."""
        snp_sel = self._snp_idx if snp_indices is None else self._snp_idx[snp_indices]
        stride = (self._n_total_samples + 3) // 4
        out = np.empty((len(self._sample_idx), len(snp_sel)), dtype=np.float64)

        raw = np.fromfile(self.bed_path, dtype=np.uint8, offset=3)
        raw = raw.reshape(-1, stride)

        lib = _native_lib()
        lut = _byte_lut()
        for j, v in enumerate(np.asarray(snp_sel)):
            if lib is not None:
                col = np.empty(self._n_total_samples, dtype=np.float64)
                lib.bed_decode_variant(raw[v].ctypes.data_as(lib.u8p),
                                       int(stride), int(self._n_total_samples),
                                       col.ctypes.data_as(lib.f64p))
            else:
                col = lut[raw[v]].reshape(-1)[:self._n_total_samples]
            out[:, j] = col[self._sample_idx]

        if impute:
            col_means = np.nanmean(out, axis=0)
            col_means = np.nan_to_num(col_means)
            nan_mask = np.isnan(out)
            out[nan_mask] = np.broadcast_to(col_means, out.shape)[nan_mask]
        return out

    def standardized(self, snp_indices=None):
        x = self.dosages(snp_indices)
        x -= x.mean(axis=0, keepdims=True)
        sd = x.std(axis=0, keepdims=True)
        sd[sd == 0] = 1.0
        return x / sd

    # ------------------------------------------------------------------- score
    def score(self, beta, standardize=True, chunk=4096):
        """Linear PRS scoring: genotype . beta.

        :param beta: {chrom: array} or flat array aligned with self.bim.
        """
        if isinstance(beta, dict):
            parts = []
            for c in self.chromosomes:
                b = np.asarray(beta[c])
                parts.append(b.reshape(len(b), -1))
            beta = np.concatenate(parts, axis=0)
        else:
            beta = np.asarray(beta).reshape(len(beta), -1)
        assert beta.shape[0] == self.m, \
            f"beta has {beta.shape[0]} rows; expected {self.m}"

        prs = np.zeros((self.n, beta.shape[1]))
        for start in range(0, self.m, chunk):
            sel = np.arange(start, min(start + chunk, self.m))
            x = self.standardized(sel) if standardize else self.dosages(sel)
            prs += x @ beta[sel]
        return prs.squeeze()

    predict = score

    # -------------------------------------------------------------------- GWAS
    def perform_gwas(self, phenotype, chunk=4096):  # noqa: C901 (kept flat)
        """Marginal standardized regression per variant:
        beta_j = x_j' y / n with x, y standardized. Returns a SumstatsTable."""
        from .sumstats import SumstatsTable

        y = np.asarray(phenotype, dtype=np.float64)
        y = (y - y.mean()) / y.std()
        n = self.n
        betas = np.empty(self.m)
        for start in range(0, self.m, chunk):
            sel = np.arange(start, min(start + chunk, self.m))
            x = self.standardized(sel)
            betas[sel] = x.T @ y / n

        se = np.sqrt(np.maximum(1.0 - betas ** 2, 1e-12) / n)
        tab = pd.DataFrame({
            'CHR': self.bim['CHR'], 'SNP': self.bim['SNP'], 'POS': self.bim['POS'],
            'A1': self.bim['A1'], 'A2': self.bim['A2'],
            'N': n, 'BETA': betas, 'SE': se, 'Z': betas / se,
        })
        from scipy.stats import norm
        tab['P'] = 2 * norm.sf(np.abs(tab['Z']))
        return SumstatsTable(tab)


class MultiGenotypeMatrix:
    """Several BED filesets (e.g. one per chromosome) over the same samples,
    presented with the single-fileset interface."""

    def __init__(self, bed_prefixes, keep_samples=None, extract_snps=None):
        self.parts = [GenotypeMatrix(p, keep_samples=keep_samples,
                                     extract_snps=extract_snps)
                      for p in bed_prefixes]
        base_iids = self.parts[0].fam['IID'].tolist()
        for p in self.parts[1:]:
            assert p.fam['IID'].tolist() == base_iids, \
                "All BED filesets must cover the same samples in the same order."
        self.bim = pd.concat([p.bim for p in self.parts], ignore_index=True)
        self.fam = self.parts[0].fam

    @property
    def n(self):
        return self.parts[0].n

    @property
    def m(self):
        return len(self.bim)

    @property
    def shape(self):
        return (self.n, self.m)

    @property
    def chromosomes(self):
        return sorted(self.bim['CHR'].unique())

    def score(self, beta, standardize=True, chunk=4096):
        if isinstance(beta, dict):
            flat = []
            for c in self.chromosomes:
                b = np.asarray(beta[c])
                flat.append(b.reshape(len(b), -1))
            beta = np.concatenate(flat, axis=0)
        else:
            beta = np.asarray(beta).reshape(len(beta), -1)
        assert beta.shape[0] == self.m
        prs = 0.0
        offset = 0
        for p in self.parts:
            prs = prs + np.atleast_2d(
                p.score(beta[offset:offset + p.m], standardize=standardize,
                        chunk=chunk).T).T
            offset += p.m
        return prs.squeeze()

    predict = score

    def perform_gwas(self, phenotype, chunk=4096):
        from .sumstats import SumstatsTable
        tables = [p.perform_gwas(phenotype, chunk=chunk).table
                  for p in self.parts]
        return SumstatsTable(pd.concat(tables, ignore_index=True))

    def standardized(self, snp_indices=None):
        raise NotImplementedError(
            "Dense access across filesets is not supported; use the per-part "
            "GenotypeMatrix objects (.parts).")


def open_genotypes(bed_files, keep_samples=None, extract_snps=None):
    """Open one or many BED filesets with a uniform interface."""
    if isinstance(bed_files, (list, tuple)) and len(bed_files) > 1:
        return MultiGenotypeMatrix(bed_files, keep_samples=keep_samples,
                                   extract_snps=extract_snps)
    prefix = bed_files[0] if isinstance(bed_files, (list, tuple)) else bed_files
    return GenotypeMatrix(prefix, keep_samples=keep_samples,
                          extract_snps=extract_snps)
