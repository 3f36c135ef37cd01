"""GWAS summary-statistics tables and file-format parsers.

Owns the capability the reference delegates to magenpy's ``SumstatsTable``
(consumed surface documented in SURVEY.md §2.6): reading the common association
output formats, deriving Z-scores / standardized betas, and per-SNP sample sizes.

Supported formats (parity with ``viprs_fit --sumstats-format``):
plink1.9, plink2, cojo, magenpy, fastgwa, ssf (= gwas-ssf), gwascatalog, saige,
and ``custom`` via an explicit column mapping.
"""

import logging

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

# canonical column names:
CANONICAL = ['CHR', 'SNP', 'POS', 'A1', 'A2', 'MAF', 'N', 'BETA', 'SE', 'Z', 'P']

# per-format mapping {format: {file_column: canonical_column}}:
_FORMAT_MAPS = {
    'magenpy': {
        'CHR': 'CHR', 'SNP': 'SNP', 'POS': 'POS', 'A1': 'A1', 'A2': 'A2',
        'MAF': 'MAF', 'N': 'N', 'BETA': 'BETA', 'Z': 'Z', 'SE': 'SE', 'P': 'P',
    },
    'fastgwa': {
        'CHR': 'CHR', 'SNP': 'SNP', 'POS': 'POS', 'A1': 'A1', 'A2': 'A2',
        'N': 'N', 'AF1': 'MAF', 'BETA': 'BETA', 'SE': 'SE', 'P': 'P',
    },
    'plink1.9': {
        'CHR': 'CHR', 'SNP': 'SNP', 'BP': 'POS', 'A1': 'A1', 'A2': 'A2',
        'NMISS': 'N', 'BETA': 'BETA', 'OR': 'OR', 'SE': 'SE', 'STAT': 'Z',
        'T': 'Z', 'P': 'P',
    },
    'plink2': {
        '#CHROM': 'CHR', 'ID': 'SNP', 'POS': 'POS', 'A1': 'A1', 'REF': 'REF',
        'ALT': 'ALT', 'A2': 'A2', 'OBS_CT': 'N', 'BETA': 'BETA', 'SE': 'SE',
        'T_STAT': 'Z', 'Z_STAT': 'Z', 'P': 'P', 'A1_FREQ': 'MAF',
    },
    'cojo': {
        'SNP': 'SNP', 'A1': 'A1', 'A2': 'A2', 'freq': 'MAF', 'b': 'BETA',
        'se': 'SE', 'p': 'P', 'N': 'N',
    },
    'ssf': {
        'chromosome': 'CHR', 'variant_id': 'SNP', 'rsid': 'SNP',
        'base_pair_location': 'POS', 'effect_allele': 'A1',
        'other_allele': 'A2', 'beta': 'BETA', 'standard_error': 'SE',
        'effect_allele_frequency': 'MAF', 'p_value': 'P', 'n': 'N',
    },
    'gwascatalog': {
        'hm_chrom': 'CHR', 'hm_rsid': 'SNP', 'hm_pos': 'POS',
        'hm_effect_allele': 'A1', 'hm_other_allele': 'A2', 'hm_beta': 'BETA',
        'hm_effect_allele_frequency': 'MAF', 'standard_error': 'SE',
        'p_value': 'P', 'n': 'N',
    },
    'saige': {
        'CHR': 'CHR', 'MarkerID': 'SNP', 'POS': 'POS', 'Allele2': 'A1',
        'Allele1': 'A2', 'AF_Allele2': 'MAF', 'N': 'N', 'BETA': 'BETA',
        'SE': 'SE', 'p.value': 'P',
    },
}
_FORMAT_MAPS['gwas-ssf'] = _FORMAT_MAPS['ssf']


class SumstatsTable:
    """A harmonization-ready summary-statistics table for one or more chromosomes.

    Canonical columns: CHR SNP POS A1 A2 [MAF] N BETA [SE] Z [P]. Derived
    quantities follow the reference's magenpy surface:

    - ``z_score``: BETA/SE when Z is absent;
    - ``get_snp_pseudo_corr()``: standardized marginal beta r = z/sqrt(n + z^2)
      (equals the sample correlation of a standardized regression);
    - ``n_per_snp``: per-variant sample size (scalar N broadcast if needed).
    """

    def __init__(self, table: pd.DataFrame):
        t = table.copy()
        assert 'SNP' in t.columns, "Summary statistics must contain a SNP column."
        assert 'A1' in t.columns, "Summary statistics must contain the effect allele (A1)."

        if 'Z' not in t.columns or t['Z'].isna().all():
            if 'BETA' in t.columns and 'SE' in t.columns:
                t['Z'] = t['BETA'] / t['SE']
            elif 'BETA' in t.columns and 'P' in t.columns:
                from scipy.stats import norm
                t['Z'] = np.sign(t['BETA']) * np.abs(norm.ppf(t['P'] / 2))
            else:
                raise ValueError("Cannot derive Z-scores: need (BETA, SE) or (BETA, P).")
        self.table = t

    def __len__(self):
        return len(self.table)

    @property
    def chromosomes(self):
        if 'CHR' in self.table.columns:
            return sorted(self.table['CHR'].unique())
        return [0]

    @property
    def snps(self):
        return self.table['SNP'].values

    @property
    def a1(self):
        return self.table['A1'].values

    @property
    def a2(self):
        return self.table['A2'].values if 'A2' in self.table.columns else None

    @property
    def z_score(self):
        return self.table['Z'].values.astype(np.float64)

    @property
    def marginal_beta(self):
        if 'BETA' in self.table.columns:
            return self.table['BETA'].values.astype(np.float64)
        return self.z_score / np.sqrt(self.n_per_snp)

    @property
    def n_per_snp(self):
        if 'N' in self.table.columns:
            return self.table['N'].values.astype(np.float64)
        raise ValueError("Per-SNP sample size (N) not available; "
                         "call set_sample_size() first.")

    def set_sample_size(self, n):
        """Set a scalar (or per-variant) GWAS sample size."""
        self.table['N'] = n

    def get_snp_pseudo_corr(self):
        """Standardized marginal beta: r = z / sqrt(n + z^2)."""
        z = self.z_score
        return z / np.sqrt(self.n_per_snp + z ** 2)

    def split_by_chromosome(self):
        if 'CHR' not in self.table.columns:
            return {0: self}
        return {c: SumstatsTable(sub.reset_index(drop=True))
                for c, sub in self.table.groupby('CHR')}

    def filter_snps(self, extract_snps):
        keep = self.table['SNP'].isin(set(extract_snps))
        self.table = self.table.loc[keep].reset_index(drop=True)
        return self

    def to_table(self, col_subset=None, per_chromosome=False):
        cols = [c for c in (col_subset or self.table.columns) if c in self.table.columns]
        if 'STD_BETA' in (col_subset or []):
            t = self.table.copy()
            t['STD_BETA'] = self.get_snp_pseudo_corr()
            cols = [c for c in col_subset if c in t.columns]
            out = t[cols]
        else:
            out = self.table[cols]
        if per_chromosome:
            return {c: sub.reset_index(drop=True) for c, sub in out.groupby('CHR')}
        return out


def read_sumstats(f_name, sumstats_format='magenpy', sep=None,
                  column_map=None, n=None) -> SumstatsTable:
    """Parse a summary-statistics file into a SumstatsTable.

    :param sumstats_format: one of the supported formats, or 'custom' with an
        explicit ``column_map`` {file_column: canonical_column}.
    :param n: fallback scalar GWAS sample size when the file lacks an N column.
    """
    if sumstats_format == 'custom':
        assert column_map, "custom format requires a column_map."
        mapping = column_map
    else:
        assert sumstats_format in _FORMAT_MAPS, \
            f"Unknown summary statistics format: {sumstats_format}"
        mapping = _FORMAT_MAPS[sumstats_format]

    df = pd.read_csv(f_name, sep=sep or r'\s+', engine='python')
    present = {fc: cc for fc, cc in mapping.items() if fc in df.columns}
    df = df.rename(columns=present)
    # drop duplicate canonical columns (e.g. both T_STAT and Z_STAT mapped to Z):
    df = df.loc[:, ~df.columns.duplicated()]

    # plink2: A2 is whichever of REF/ALT is not A1
    if sumstats_format == 'plink2' and 'A2' not in df.columns \
            and {'REF', 'ALT', 'A1'} <= set(df.columns):
        df['A2'] = np.where(df['A1'] == df['ALT'], df['REF'], df['ALT'])

    # odds ratios -> log-odds betas:
    if 'OR' in df.columns and 'BETA' not in df.columns:
        df['BETA'] = np.log(df['OR'])

    keep = [c for c in CANONICAL if c in df.columns]
    df = df[keep]
    if 'N' not in df.columns:
        if n is None:
            raise ValueError(f"File {f_name} has no sample-size column; pass n=.")
        df['N'] = n
    return SumstatsTable(df)
