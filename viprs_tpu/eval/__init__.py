"""Metric registry (parity: viprs/eval/__init__.py:6-38)."""

from .binary import (  # noqa: F401
    roc_auc, pr_auc, avg_precision, f1, mcfadden_r2, cox_snell_r2,
    nagelkerke_r2, liability_r2, liability_probit_r2, liability_logit_r2,
)
from .continuous import (  # noqa: F401
    r2, mse, spearman_r, pearson_r, r2_residualized_target,
    incremental_r2, partial_correlation,
)
from .pseudo import pseudo_r2, pseudo_pearson_r  # noqa: F401
from .utils import r2_stats, fit_linear_model  # noqa: F401

eval_metric_names = {
    'Pearson_R': pearson_r,
    'Spearman_R': spearman_r,
    'MSE': mse,
    'R2': r2,
    'R2_residualized_target': r2_residualized_target,
    'Incremental_R2': incremental_r2,
    'Partial_Correlation': partial_correlation,
    'AUROC': roc_auc,
    'AUPRC': pr_auc,
    'Avg_Precision': avg_precision,
    'F1_Score': f1,
    'Liability_R2': liability_r2,
    'Liability_Probit_R2': liability_probit_r2,
    'Liability_Logit_R2': liability_logit_r2,
    'Nagelkerke_R2': nagelkerke_r2,
    'CoxSnell_R2': cox_snell_r2,
    'McFadden_R2': mcfadden_r2,
}

# Metrics that accept (or require) covariates:
eval_incremental_metrics = [
    'Incremental_R2',
    'R2_residualized_target',
    'Partial_Correlation',
    'Liability_R2',
    'Liability_Probit_R2',
    'Liability_Logit_R2',
    'Nagelkerke_R2',
    'CoxSnell_R2',
    'McFadden_R2',
]
