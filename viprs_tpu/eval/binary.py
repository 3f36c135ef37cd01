"""Binary-phenotype (case/control) prediction metrics
(parity: viprs/eval/binary_metrics.py, incl. the liability-scale R^2 family)."""

import numpy as np
import pandas as pd

from .glm import fit_linear_model
from .continuous import incremental_r2


def roc_auc(true_val, pred_val):
    from sklearn.metrics import roc_auc_score
    return roc_auc_score(true_val, pred_val)


def pr_auc(true_val, pred_val):
    from sklearn.metrics import precision_recall_curve, auc
    precision, recall, _ = precision_recall_curve(true_val, pred_val)
    return auc(recall, precision)


def avg_precision(true_val, pred_val):
    from sklearn.metrics import average_precision_score
    return average_precision_score(true_val, pred_val)


def f1(true_val, pred_val, threshold=0.5):
    """F1 after fitting phenotype ~ logistic(PRS) and thresholding."""
    from sklearn.metrics import f1_score
    assert 0. <= threshold <= 1., "The F1 threshold must be between 0 and 1."
    logit_result = fit_linear_model(true_val, pd.DataFrame({'pred_val': pred_val}),
                                    family='binomial', add_intercept=True)
    pred_labels = (logit_result.predict() >= threshold).astype(int)
    return f1_score(true_val, pred_labels)


def _null_full_binom(true_val, pred_val, covariates, link=None):
    if covariates is None:
        add_intercept = False
        covariates = pd.DataFrame(np.ones((len(true_val), 1)), columns=['const'])
    else:
        add_intercept = True
    null_result = fit_linear_model(true_val, covariates, family='binomial',
                                   link=link, add_intercept=add_intercept)
    full_result = fit_linear_model(
        true_val, pd.DataFrame(covariates).assign(pred_val=np.asarray(pred_val)),
        family='binomial', link=link, add_intercept=add_intercept)
    return null_result, full_result


def mcfadden_r2(true_val, pred_val, covariates=None):
    null_result, full_result = _null_full_binom(true_val, pred_val, covariates)
    return 1. - (full_result.llf / null_result.llf)


def cox_snell_r2(true_val, pred_val, covariates=None):
    null_result, full_result = _null_full_binom(true_val, pred_val, covariates)
    n = len(true_val)
    return 1. - np.exp(-2 * (full_result.llf - null_result.llf) / n)


def nagelkerke_r2(true_val, pred_val, covariates=None):
    null_result, full_result = _null_full_binom(true_val, pred_val, covariates)
    n = len(true_val)
    cox_snell = 1. - np.exp(-2 * (full_result.llf - null_result.llf) / n)
    return cox_snell / (1. - np.exp(2 * null_result.llf / n))


def liability_r2(true_val, pred_val, covariates=None, return_all_r2=False):
    """Observed-scale incremental R^2 rescaled to the liability scale
    (Lee et al. 2012): multiply by K(1-K)/z^2 at prevalence K."""
    r2_obs = incremental_r2(true_val, pred_val, covariates, return_all_r2=return_all_r2)

    from scipy.stats import norm
    k = np.mean(true_val)
    z2 = norm.pdf(norm.ppf(1. - k)) ** 2
    mult = k * (1. - k) / z2

    if return_all_r2:
        return {key: val * mult for key, val in r2_obs.items()}
    return r2_obs * mult


def _liability_var_r2(true_val, pred_val, covariates, link, denom_extra):
    null_result, full_result = _null_full_binom(true_val, pred_val, covariates,
                                                link=link)
    null_var = np.var(null_result.predict())
    full_var = np.var(full_result.predict())
    null_r2 = null_var / (null_var + denom_extra)
    full_r2 = full_var / (full_var + denom_extra)
    return null_r2, full_r2


def liability_probit_r2(true_val, pred_val, covariates=None, return_all_r2=False):
    """R^2_probit = Var(pred)/(Var(pred) + 1)."""
    null_r2, full_r2 = _liability_var_r2(true_val, pred_val, covariates,
                                         'probit', 1.0)
    if return_all_r2:
        return {'Null_R2': null_r2, 'Full_R2': full_r2,
                'Incremental_R2': full_r2 - null_r2}
    return full_r2 - null_r2


def liability_logit_r2(true_val, pred_val, covariates=None, return_all_r2=False):
    """R^2_logit = Var(pred)/(Var(pred) + pi^2/3)."""
    null_r2, full_r2 = _liability_var_r2(true_val, pred_val, covariates,
                                         None, np.pi ** 2 / 3)
    if return_all_r2:
        return {'Null_R2': null_r2, 'Full_R2': full_r2,
                'Incremental_R2': full_r2 - null_r2}
    return full_r2 - null_r2
