"""Variant harmonization: allele-aware merging of SNP/effect tables.

The silent-correctness-critical piece of the data layer (reference consumes
magenpy's ``merge_snp_tables``; use-sites at BayesPRSModel.py:288-304 and
eval/pseudo_metrics.py:57-60). Semantics implemented here:

- match variants by SNP id;
- if the A1/A2 alleles in the right table match the reference table -> keep;
- if they are swapped (A1<->A2) -> flip the sign of every signed statistic;
- strand flips (A<->T, C<->G complements) are resolved the same way after
  complementing; palindromic/ambiguous variants (A/T, C/G) are kept as-is by
  default or dropped when ``drop_ambiguous=True``;
- variants that match neither orientation are dropped (inner join) or NaN'd
  (left join).
"""

import numpy as np
import pandas as pd

_COMPLEMENT = {'A': 'T', 'T': 'A', 'C': 'G', 'G': 'C'}


def _complement_series(s):
    return s.map(lambda a: ''.join(_COMPLEMENT.get(ch, ch) for ch in str(a)))


def is_palindromic(a1, a2):
    return np.asarray(a1) == np.asarray(_complement_series(pd.Series(a2)))


def merge_snp_tables(ref_table: pd.DataFrame,
                     other_table: pd.DataFrame,
                     how: str = 'inner',
                     on: str = 'SNP',
                     signed_statistics=('BETA',),
                     drop_ambiguous: bool = False) -> pd.DataFrame:
    """Merge ``other_table`` onto ``ref_table``, flipping the sign of
    ``signed_statistics`` where the effect allele orientation is reversed.

    :param ref_table: DataFrame with at least [on, 'A1', 'A2'].
    :param other_table: DataFrame with [on, 'A1', 'A2'] + statistics columns.
    :returns: merged DataFrame in ref_table's variant order, with harmonized
        signed statistics and ref_table's A1/A2.
    """
    for col in (on, 'A1', 'A2'):
        assert col in ref_table.columns, f"reference table missing column {col}"
        assert col in other_table.columns, f"other table missing column {col}"

    right = other_table.rename(columns={'A1': '_A1_r', 'A2': '_A2_r'})
    drop_cols = [c for c in ('CHR', 'POS') if c in right.columns and c in ref_table.columns]
    right = right.drop(columns=drop_cols)
    merged = ref_table.merge(right, how=how, on=on)

    a1, a2 = merged['A1'].astype(str), merged['A2'].astype(str)
    r1, r2 = merged['_A1_r'].astype(str), merged['_A2_r'].astype(str)
    c1, c2 = _complement_series(r1), _complement_series(r2)

    # Precedence matters for palindromic (A/T, C/G) variants, where exact-swap
    # and complement-same coincide: exact matches win over strand-complement
    # interpretations.
    same_exact = (a1 == r1) & (a2 == r2)
    flip_exact = (a1 == r2) & (a2 == r1) & ~same_exact
    same_comp = (a1 == c1) & (a2 == c2) & ~same_exact & ~flip_exact
    flip_comp = (a1 == c2) & (a2 == c1) & ~same_exact & ~flip_exact & ~same_comp
    same = same_exact | same_comp
    flipped = flip_exact | flip_comp
    unmatched = ~(same | flipped) & merged['_A1_r'].notna()

    sign = np.where(flipped, -1.0, 1.0)
    for col in signed_statistics:
        if col in merged.columns:
            merged[col] = merged[col] * sign

    if unmatched.any():
        for col in signed_statistics:
            if col in merged.columns:
                merged.loc[unmatched, col] = np.nan
        if how == 'inner':
            merged = merged.loc[~unmatched]

    if drop_ambiguous:
        pal = (a1 == _complement_series(a2)).values
        merged = merged.loc[~pal[:len(merged)] if len(pal) == len(merged) else ~pal]

    return merged.drop(columns=['_A1_r', '_A2_r'])
