"""viprs_evaluate — evaluate polygenic score predictive performance.

CLI parity with the reference's bin/viprs_evaluate: merge PRS and phenotype
(+covariate) tables, infer the phenotype likelihood, compute the requested
metrics with standard errors, write a .eval table.
"""

import argparse
import logging
import sys

logger = logging.getLogger("viprs_evaluate")


def build_parser():
    parser = argparse.ArgumentParser(
        prog='viprs_evaluate',
        description="Evaluate PRS predictive performance against a phenotype.")
    parser.add_argument('--prs-file', dest='prs_file', required=True,
                        help="PRS file (FID IID PRS) from viprs_score.")
    parser.add_argument('--phenotype-file', dest='pheno_file', required=True,
                        help="Phenotype file (FID IID phenotype).")
    parser.add_argument('--phenotype-col', dest='pheno_col', type=int, default=2)
    parser.add_argument('--phenotype-likelihood', dest='pheno_lik', default='infer',
                        choices=['infer', 'gaussian', 'binomial'])
    parser.add_argument('--keep', dest='keep_file', default=None)
    parser.add_argument('--output-file', dest='output_file', required=True)
    parser.add_argument('--metrics', dest='metrics', nargs='+', default=None,
                        help="Metric names (see the eval registry); defaults "
                             "depend on the phenotype likelihood.")
    parser.add_argument('--covariates-file', dest='covariates_file', default=None,
                        help="Covariates file (FID IID cov1 cov2 ...).")
    parser.add_argument('--log-level', dest='log_level', default='WARNING')
    return parser


DEFAULT_METRICS = {
    'gaussian': ['Pearson_R', 'R2', 'MSE'],
    'binomial': ['AUROC', 'AUPRC', 'McFadden_R2'],
}
DEFAULT_METRICS_COVARIATES = {
    'gaussian': ['Incremental_R2', 'Partial_Correlation'],
    'binomial': ['AUROC', 'Liability_R2', 'Nagelkerke_R2'],
}


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=getattr(logging, args.log_level.upper(), logging.WARNING))

    import numpy as np
    import pandas as pd
    from .. import eval as eval_mod

    prs = pd.read_csv(args.prs_file, sep=r'\s+')
    pheno = pd.read_csv(args.pheno_file, sep=r'\s+', header=None)
    pheno = pheno.rename(columns={0: 'FID', 1: 'IID',
                                  args.pheno_col: 'phenotype'})
    pheno = pheno[['FID', 'IID', 'phenotype']]

    merged = prs.merge(pheno.astype({'FID': prs['FID'].dtype,
                                     'IID': prs['IID'].dtype}),
                       on=['FID', 'IID'])
    if args.keep_file:
        keep = set(pd.read_csv(args.keep_file, sep=r'\s+',
                               header=None).iloc[:, -1].astype(str))
        merged = merged[merged['IID'].astype(str).isin(keep)]

    merged = merged.dropna(subset=['phenotype'])
    assert len(merged) > 0, "No overlapping samples between PRS and phenotype."

    covariates = None
    if args.covariates_file:
        cov = pd.read_csv(args.covariates_file, sep=r'\s+', header=None)
        cov = cov.rename(columns={0: 'FID', 1: 'IID'})
        merged = merged.merge(cov.astype({'FID': merged['FID'].dtype,
                                          'IID': merged['IID'].dtype}),
                              on=['FID', 'IID'])
        covariates = merged[[c for c in merged.columns
                             if c not in ('FID', 'IID', 'phenotype')
                             and not str(c).startswith('PRS')]]

    y = merged['phenotype'].values.astype(np.float64)
    likelihood = args.pheno_lik
    if likelihood == 'infer':
        uniq = set(np.unique(y))
        if uniq <= {0.0, 1.0} or uniq <= {1.0, 2.0}:
            likelihood = 'binomial'
            if uniq <= {1.0, 2.0} and 2.0 in uniq:
                y = y - 1.0
        else:
            likelihood = 'gaussian'
    logger.info("> Phenotype likelihood: %s", likelihood)

    if args.metrics:
        metrics = args.metrics
    elif covariates is not None:
        metrics = DEFAULT_METRICS_COVARIATES[likelihood]
    else:
        metrics = DEFAULT_METRICS[likelihood]

    prs_cols = [c for c in merged.columns if str(c).startswith('PRS')]
    rows = []
    for prs_col in prs_cols:
        pred = merged[prs_col].values.astype(np.float64)
        for name in metrics:
            fn = eval_mod.eval_metric_names.get(name)
            if fn is None:
                logger.warning("Unknown metric: %s (skipped)", name)
                continue
            try:
                if name in eval_mod.eval_incremental_metrics:
                    val = fn(y, pred, covariates)
                else:
                    val = fn(y, pred)
            except Exception as e:
                logger.warning("Metric %s failed: %s", name, e)
                continue
            row = {'PRS': prs_col, 'Metric': name, 'Value': val}
            if 'R2' in name and np.isscalar(val) and 0 < val < 1:
                stats = eval_mod.r2_stats(float(val), len(y))
                row.update({'SE': stats['SE'], 'P_Value': stats['P_Value']})
            rows.append(row)

    out = pd.DataFrame(rows)
    fname = args.output_file if args.output_file.endswith('.eval') \
        else args.output_file + '.eval'
    out.to_csv(fname, sep="\t", index=False)
    print(f"viprs_evaluate wrote {fname}")
    return 0


if __name__ == '__main__':
    sys.exit(main())
