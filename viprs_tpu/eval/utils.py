"""Evaluation helpers (parity: viprs/eval/eval_utils.py)."""

import numpy as np

from .glm import fit_linear_model  # noqa: F401  (re-exported)


def r2_stats(r2_val, n):
    """SE / CI / p-value for an R^2 estimate (Momin et al. 2023)."""
    assert 0. < r2_val < 1., "R^2 value must be between 0 and 1."

    r2_var = (4. * r2_val * (1. - r2_val) ** 2 * (n - 2) ** 2) / ((n ** 2 - 1) * (n + 3))
    r2_se = np.sqrt(r2_var)
    lower_r2 = r2_val - 1.97 * r2_se
    upper_r2 = r2_val + 1.97 * r2_se

    from scipy import stats
    pval = stats.chi2.sf((r2_val / r2_se) ** 2, df=1)

    return {'R2': r2_val, 'Lower_R2': lower_r2, 'Upper_R2': upper_r2,
            'P_Value': pval, 'SE': r2_se}
