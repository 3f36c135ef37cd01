"""viprs_score — linear scoring of individuals with inferred effect sizes.

CLI parity with the reference's bin/viprs_score: load BED genotypes and .fit
files, harmonize (allele-aware), score genotype . beta, write FID/IID/PRS.
"""

import argparse
import logging
import sys

logger = logging.getLogger("viprs_score")


def build_parser():
    parser = argparse.ArgumentParser(
        prog='viprs_score',
        description="Compute polygenic scores from inferred effect sizes.")
    parser.add_argument('-f', '--fit-files', dest='fit_files', required=True,
                        nargs='+', help="Path(s) to .fit files from viprs_fit.")
    parser.add_argument('--bfile', '--bed-files', dest='bed_files',
                        required=True, nargs='+',
                        help="Path(s)/glob of plink BED fileset(s) to score "
                             "(e.g. one per chromosome).")
    parser.add_argument('--output-file', dest='output_file', required=True)
    parser.add_argument('--keep', dest='keep_file', default=None,
                        help="File listing sample IDs to keep.")
    parser.add_argument('--extract', dest='extract_file', default=None,
                        help="File listing variant IDs to use.")
    parser.add_argument('--compress', dest='compress', action='store_true')
    parser.add_argument('--temp-dir', dest='temp_dir', default='temp',
                        help="Accepted for reference compatibility.")
    parser.add_argument('--backend', dest='backend', default='native',
                        help="Accepted for reference compatibility; genotype "
                             "IO is native.")
    parser.add_argument('--threads', dest='threads', type=int, default=1,
                        help="Accepted for reference compatibility.")
    parser.add_argument('--log-level', dest='log_level', default='WARNING')
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=getattr(logging, args.log_level.upper(), logging.WARNING))

    import re

    import numpy as np
    import pandas as pd
    from ..data.genotype import open_genotypes
    from ..data.harmonize import merge_snp_tables
    from ..data.loader import get_filenames

    keep = None
    if args.keep_file:
        keep = set(pd.read_csv(args.keep_file, sep=r'\s+',
                               header=None).iloc[:, -1].astype(str))
    extract = None
    if args.extract_file:
        extract = pd.read_csv(args.extract_file, header=None).iloc[:, 0].tolist()

    logger.info("> Loading genotype data...")
    prefixes = sorted({re.sub(r'\.(bed|bim|fam)$', '', f)
                       for f in get_filenames(args.bed_files)})
    genotype = open_genotypes(prefixes, keep_samples=keep,
                              extract_snps=extract)

    logger.info("> Loading inferred parameters...")
    fit_tables = pd.concat([pd.read_csv(f, sep=r'\s+') for f in args.fit_files],
                           ignore_index=True)
    beta_cols = [c for c in fit_tables.columns
                 if 'BETA' in c and 'VAR' not in c]
    assert beta_cols, "The fit files must contain BETA columns."

    merged = merge_snp_tables(genotype.bim[['SNP', 'A1', 'A2']], fit_tables,
                              how='left', signed_statistics=beta_cols)
    beta = merged[beta_cols].fillna(0.).values
    n_matched = int(merged[beta_cols[0]].notna().sum())
    logger.info("> Matched %d of %d scoring variants.", n_matched, len(fit_tables))
    if n_matched == 0:
        raise ValueError("No variants in the fit files matched the genotype data.")

    logger.info("> Scoring...")
    prs = genotype.score(beta)

    out = genotype.fam[['FID', 'IID']].copy()
    prs2 = np.atleast_2d(np.asarray(prs).T).T
    if prs2.shape[1] == 1:
        out['PRS'] = prs2[:, 0]
    else:
        for i in range(prs2.shape[1]):
            out[f'PRS_{i}'] = prs2[:, i]

    fname = args.output_file
    if args.compress and not fname.endswith('.gz'):
        fname = fname + '.prs.gz'
    elif not fname.endswith(('.prs', '.gz')):
        fname = fname + '.prs'
    out.to_csv(fname, sep="\t", index=False,
               compression='gzip' if fname.endswith('.gz') else None)
    print(f"viprs_score wrote {fname}")
    return 0


if __name__ == '__main__':
    sys.exit(main())
