"""Summary-statistics-only (pseudo) validation metrics
(parity: viprs/eval/pseudo_metrics.py).

Corr(PRS, y) ~= r'b / sqrt(b'Sb) where r are standardized marginal betas from an
independent validation set, b the PRS weights, S the LD matrix (Mak et al. 2017;
Yang & Zhou 2020). The squared correlation is used instead of 2r'b - b'Sb, which
is biased under sparsified LD (reference pseudo_metrics.py:91-101).
"""

import numpy as np


def _match_variant_stats(test_dataset, prs_beta_table):
    """Align validation standardized betas with a PRS table and compute the
    LD-weighted PRS weights S.b with the blocked LD operator.

    :returns: (validation std betas, PRS betas, LD-weighted betas) arrays.
    """
    from ..data.harmonize import merge_snp_tables
    from ..ops.cavi_jax import compute_q
    import jax.numpy as jnp

    snp_tables = (test_dataset.snp_table if test_dataset.snp_table is not None
                  else test_dataset.default_snp_table())

    required = ['CHR', 'SNP', 'A1', 'A2']
    for col in required:
        assert col in prs_beta_table.columns, \
            f"The PRS effect sizes table must contain a column named {col}."

    if 'BETA' in prs_beta_table.columns:
        beta_cols = ['BETA']
    else:
        beta_cols = [c for c in prs_beta_table.columns
                     if 'BETA' in c and 'VAR' not in c]
        assert beta_cols, ("The PRS effect sizes table must contain a column "
                           "named BETA or BETA_0, BETA_1, etc.")

    per_chrom = dict(tuple(prs_beta_table.groupby('CHR')))

    validation_beta, prs_beta_chr = [], {}
    for c in test_dataset.chromosomes:
        validation_beta.append(np.asarray(test_dataset.std_beta[c], dtype=np.float64))
        if c in per_chrom:
            merged = merge_snp_tables(snp_tables[c][['SNP', 'A1', 'A2']],
                                      per_chrom[c], how='left',
                                      signed_statistics=beta_cols)
            prs_beta_chr[c] = merged[beta_cols].fillna(0.).values
        else:
            prs_beta_chr[c] = np.zeros((test_dataset.shapes[c], len(beta_cols)))

    lay = test_dataset.layout
    n_cols = len(beta_cols)
    flat = np.stack([lay.to_flat({c: prs_beta_chr[c][:, i]
                                  for c in test_dataset.chromosomes})
                     for i in range(n_cols)])
    q = compute_q(test_dataset.ld,
                  jnp.asarray(flat.reshape(n_cols, lay.nb, lay.block_size),
                              jnp.float32))
    q = np.asarray(q).reshape(n_cols, -1)
    beta_flat = flat.reshape(n_cols, -1)
    # ldw = S.b = q + b (q excludes the diagonal)
    ldw = q + beta_flat

    idx = lay.flat_index
    return (np.concatenate(validation_beta),
            beta_flat[:, idx].T,
            ldw[:, idx].T)


def pseudo_r2(test_dataset, prs_beta_table):
    """Squared pseudo correlation (see module docstring)."""
    return pseudo_pearson_r(test_dataset, prs_beta_table) ** 2


def pseudo_pearson_r(test_dataset, prs_beta_table):
    """r'b / sqrt(b'Sb) per PRS column."""
    std_beta, prs_beta, ldw = _match_variant_stats(test_dataset, prs_beta_table)
    rb = np.sum(prs_beta * std_beta[:, None], axis=0)
    bsb = np.sum(prs_beta * ldw, axis=0)
    out = rb / np.sqrt(bsb)
    return out if out.size > 1 else float(out[0])


def _streamlined_pseudo_r2(validation_beta, prs_beta, ldw_prs_beta):
    """Pseudo-R^2 reusing precomputed LD-weighted betas (the model's cached q;
    reference pseudo_metrics.py:130-152)."""
    validation_beta = np.asarray(validation_beta)
    prs_beta = np.asarray(prs_beta)
    ldw_prs_beta = np.asarray(ldw_prs_beta)
    if prs_beta.ndim == 1:
        rb = np.sum(prs_beta * validation_beta)
        bsb = np.sum(prs_beta * ldw_prs_beta)
        return rb ** 2 / bsb
    rb = np.sum(prs_beta * validation_beta[:, None], axis=0)
    bsb = np.sum(prs_beta * ldw_prs_beta, axis=0)
    return rb ** 2 / bsb
