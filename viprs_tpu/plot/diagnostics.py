"""Optimization diagnostics plotting (parity: viprs/plot/diagnostics.py)."""

import numpy as np


def plot_history(viprs_model, quantities=None, col_wrap=3):
    """Plot tracked quantities vs. iteration number as a seaborn FacetGrid.

    :param viprs_model: a fitted model with a populated ``history`` dict.
    :param quantities: subset of history keys to plot (default: all).
    :returns: the seaborn FacetGrid.
    """
    import pandas as pd
    import seaborn as sns

    history = viprs_model.history
    quantities = quantities or list(history.keys())

    rows = []
    for key in quantities:
        vals = history.get(key, [])
        for i, v in enumerate(vals):
            v = np.asarray(v)
            if v.ndim == 0:
                rows.append({'Iteration': i, 'Quantity': key, 'Value': float(v)})
            else:
                # grid models: one trace per model
                for s, vs in enumerate(np.ravel(v)):
                    rows.append({'Iteration': i, 'Quantity': f'{key}_{s}',
                                 'Value': float(vs)})

    df = pd.DataFrame(rows)
    g = sns.FacetGrid(df, col='Quantity', col_wrap=col_wrap, sharey=False)
    g.map(sns.lineplot, 'Iteration', 'Value')
    return g
