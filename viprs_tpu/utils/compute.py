"""Small host-side numeric helpers.

Covers the chromosome-keyed dict algebra of the reference
(viprs/utils/compute_utils.py) — retained at the *API surface* for users migrating
from the reference; internally the TPU framework operates on flat blocked arrays.
"""

import numpy as np
import pandas as pd


def fits_in_memory(alloc_size_mb, max_prop=0.9):
    """Check whether `alloc_size_mb` MB fits within available host memory."""
    import psutil

    avail_mem = psutil.virtual_memory().available / (1024.0 ** 2)
    return (alloc_size_mb / avail_mem) <= max_prop


def dict_concat(d, axis=0):
    if len(d) == 1:
        return d[next(iter(d))]
    return np.concatenate([d[c] for c in sorted(d.keys())], axis=axis)


def dict_max(d, axis=None):
    return np.max(np.array([np.max(v, axis=axis) for v in d.values()]), axis=axis)


def dict_mean(d, axis=None):
    return np.mean(np.array([np.mean(v, axis=axis) for v in d.values()]), axis=axis)


def dict_sum(d, axis=None, transform=None):
    if transform is None:
        return np.sum(np.array([np.sum(v, axis=axis) for v in d.values()]), axis=axis)
    return np.sum(np.array([np.sum(transform(v), axis=axis) for v in d.values()]), axis=axis)


def dict_elementwise_transform(d, transform):
    return {c: np.vectorize(transform)(v) for c, v in d.items()}


def dict_elementwise_dot(d1, d2):
    return {c: d1[c] * d2[c] for c in d1}


def dict_dot(d1, d2):
    return np.sum([np.dot(d1[c], d2[c]) for c in d1.keys()])


def dict_set(d, value):
    for c in d:
        d[c][:] = value
    return d


def dict_repeat(value, shapes):
    return {c: value * np.ones(shp) for c, shp in shapes.items()}


def expand_column_names(c_name, shape, sep='_'):
    """Column names for a matrix-valued parameter: BETA -> [BETA_0, BETA_1, ...].

    Vector-shaped (or single-column) parameters keep the bare name.
    Parity: viprs/utils/compute_utils.py:114-140.
    """
    if len(shape) < 2 or shape[1] == 1:
        return [c_name]
    return [f'{c_name}{sep}{i}' for i in range(shape[1])]


def combine_coefficient_tables(coef_tables, coef_col='BETA'):
    """Merge per-model coefficient tables into one wide table (BETA_0, BETA_1, ...).

    Parity: viprs/utils/compute_utils.py:143-169.
    """
    assert all(coef_col in t.columns for t in coef_tables), \
        "All tables must contain the coefficient column."
    assert all(len(t) == len(coef_tables[0]) for t in coef_tables), \
        "All tables must have the same number of rows."

    if len(coef_tables) == 1:
        return coef_tables[0]

    ref_table = coef_tables[0].copy()
    ref_table.rename(columns={coef_col: f'{coef_col}_0'}, inplace=True)

    return pd.concat(
        [ref_table] + [t[[coef_col]].rename(columns={coef_col: f'{coef_col}_{i}'})
                       for i, t in enumerate(coef_tables[1:], 1)],
        axis=1,
    )
