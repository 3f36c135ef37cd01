#!/usr/bin/env python3
"""Execute the end-to-end walkthrough and write docs/walkthrough.md.

The reference ships an executed notebook (notebooks/viprs_cli_example.ipynb)
as living documentation AND the provenance of its only published benchmark
(57.4 s genome-wide fit, pseudo-R² 0.3347). This script plays that role
here: it simulates a multi-chromosome panel WITH individual genotypes,
writes the on-disk artifacts (LD store, sumstats, BED), then drives the real
CLIs —

    viprs_fit  (EM)  ->  viprs_fit (grid search + BMA)  ->
    viprs_score      ->  viprs_evaluate

— capturing wall-clock timings and outputs, and renders everything into
``docs/walkthrough.md``. Re-run it to regenerate the document:

    python tools/run_walkthrough.py [--m 6000] [--n 8000] [--out docs/walkthrough.md]

On a TPU host the fit runs on the chip; on CPU set JAX_PLATFORMS=cpu.
"""

import argparse
import os
import os.path as osp
import subprocess
import sys
import tempfile
import time

import numpy as np
import pandas as pd

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, 'tests'))


def sh(cmd, env=None):
    t0 = time.time()
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO)
    dt = time.time() - t0
    if res.returncode != 0:
        print(res.stdout, file=sys.stderr)
        print(res.stderr, file=sys.stderr)
        raise RuntimeError(f"command failed: {' '.join(cmd)}")
    return dt, res.stdout.strip()


def simulate_panel(workdir, m_total=6_000, n=8_000, n_chroms=4, seed=42):
    # NOTE n > m: the GWAS and the LD are estimated in-sample from the same
    # genotypes, and with m >> n the in-sample LD is rank-deficient enough
    # that summary statistics 'explain' more than Var(y) (negative MSE, a
    # correct error-stop in both frameworks). Real pipelines pair ~1M
    # variants with external LD panels and N in the hundreds of thousands.
    """Multi-chromosome panel with genotypes: BED + GWAS sumstats + LD store."""
    from plink_utils import write_plink_bed
    from viprs_tpu.data.genotype import GenotypeMatrix
    from viprs_tpu.data.loader import GWADataLoader
    from viprs_tpu.data import ld_store

    rng = np.random.default_rng(seed)
    m_per = m_total // n_chroms
    chroms = list(range(1, n_chroms + 1))
    maf = rng.uniform(0.05, 0.5, m_per * n_chroms)
    dosages = rng.binomial(2, maf, size=(n, m_per * n_chroms)).astype(np.float64)
    a1 = rng.choice(list('ACGT'), size=m_per * n_chroms)
    a2 = np.where(a1 == 'A', 'G', 'A')
    bim = pd.DataFrame({
        'CHR': np.repeat(chroms, m_per),
        'SNP': [f'rs{i}' for i in range(m_per * n_chroms)],
        'CM': 0.0,
        'POS': np.tile(np.arange(1, m_per + 1) * 1000, n_chroms),
        'A1': a1, 'A2': a2})
    # GWAS-realistic signal: at h2 ~ 0.5 the restart ladder's fixed
    # sigma_epsilon = 0.95 (reference semantics) leaves the summary-stats
    # MSE marginally negative and the fit correctly error-stops — on the
    # reference too (verified via tests/ref_shim.py). Keep the showcase
    # panel in the well-posed regime:
    h2, prop_causal = 0.25, 0.01
    causal = rng.random(m_per * n_chroms) < prop_causal
    beta = np.where(causal, rng.standard_normal(m_per * n_chroms), 0.0)
    x_std = (dosages - dosages.mean(0)) / np.maximum(dosages.std(0), 1e-9)
    g = x_std @ beta
    beta *= np.sqrt(h2 / max(g.var(), 1e-12))
    g = x_std @ beta
    y = g + rng.standard_normal(n) * np.sqrt(1.0 - h2)
    y = (y - y.mean()) / y.std()
    fam = pd.DataFrame({'FID': [f'F{i}' for i in range(n)],
                        'IID': [f'I{i}' for i in range(n)],
                        'father': 0, 'mother': 0, 'sex': 1, 'PHENO': y})

    prefix = osp.join(workdir, 'panel')
    write_plink_bed(prefix, dosages, bim, fam)
    gm = GenotypeMatrix(prefix)
    ss = gm.perform_gwas(y).table
    ss_file = osp.join(workdir, 'sumstats.txt')
    ss.to_csv(ss_file, sep="\t", index=False)
    loader = GWADataLoader(bed_files=prefix)
    loader.compute_ld(estimator='block', max_block_size=250)
    store = osp.join(workdir, 'ld_store')
    ld_store.save_ld_store(store, loader.ld_blocks, loader.ld_snp_tables,
                           quantize=True)
    pheno_file = osp.join(workdir, 'pheno.txt')
    fam[['FID', 'IID', 'PHENO']].to_csv(pheno_file, sep="\t", header=False,
                                        index=False)
    return dict(prefix=prefix, ss_file=ss_file, store=store,
                pheno_file=pheno_file, m=m_per * n_chroms, n=n,
                n_chroms=n_chroms, h2=h2, prop_causal=prop_causal)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--m', type=int, default=6_000)
    ap.add_argument('--n', type=int, default=8_000)
    ap.add_argument('--out', default=osp.join(REPO, 'docs', 'walkthrough.md'))
    args = ap.parse_args()

    import jax
    backend = jax.default_backend()
    devices = str(jax.devices())

    with tempfile.TemporaryDirectory() as wd:
        t0 = time.time()
        panel = simulate_panel(wd, m_total=args.m, n=args.n)
        t_sim = time.time() - t0

        out_em = osp.join(wd, 'em', 'height')
        t_em, log_em = sh([sys.executable, osp.join(REPO, 'bin', 'viprs_fit'),
                           '-l', panel['store'], '-s', panel['ss_file'],
                           '--output-file', out_em, '--block-size', '256',
                           '--max-iter', '500', '--seed', '11',
                           '--output-profiler-metrics'])
        hyp_em = pd.read_csv(out_em + '.hyp', sep="\t")

        out_gs = osp.join(wd, 'gs', 'height')
        t_gs, log_gs = sh([sys.executable, osp.join(REPO, 'bin', 'viprs_fit'),
                           '-l', panel['store'], '-s', panel['ss_file'],
                           '--output-file', out_gs, '--block-size', '256',
                           '--hyp-search', 'GS', '--pi-steps', '10',
                           '--grid-metric', 'pseudo_validation',
                           '--max-iter', '500', '--seed', '11'])
        val_gs = pd.read_csv(out_gs + '.validation', sep="\t")

        out_prs = osp.join(wd, 'em', 'prs')
        t_sc, log_sc = sh([sys.executable, osp.join(REPO, 'bin', 'viprs_score'),
                           '-f', out_em + '.fit.gz',
                           '--bed-files', panel['prefix'],
                           '--output-file', out_prs])

        out_eval = osp.join(wd, 'em', 'eval')
        t_ev, log_ev = sh([sys.executable,
                           osp.join(REPO, 'bin', 'viprs_evaluate'),
                           '--prs-file', out_prs + '.prs',
                           '--phenotype-file', panel['pheno_file'],
                           '--output-file', out_eval])
        eval_tab = pd.read_csv(out_eval + '.eval', sep="\t")
        fit_head = pd.read_csv(out_em + '.fit.gz', sep="\t").head(5)

    r2 = float(eval_tab.loc[eval_tab.Metric == 'R2', 'Value'].iloc[0])
    h2_est = float(hyp_em.loc[hyp_em.Parameter == 'Heritability',
                              'Value'].iloc[0])

    def tab(df):
        return df.to_markdown(index=False, floatfmt='.6g')

    doc = f"""# Executed walkthrough: fit → score → evaluate

*(Generated by `tools/run_walkthrough.py` — re-run it to reproduce. This
plays the role of the reference's executed `viprs_cli_example.ipynb`:
living documentation whose numbers come from a real run.)*

- **Run date:** {time.strftime('%Y-%m-%d %H:%M')}
- **Backend:** `{backend}` — devices: `{devices}`
- **Panel:** {panel['m']:,} variants on {panel['n_chroms']} chromosomes,
  N = {panel['n']:,} individuals, simulated h² = {panel['h2']},
  proportion causal = {panel['prop_causal']} (block LD, int8-quantized
  store). Simulation + GWAS + LD store build: {t_sim:.1f} s.

## 1. EM fit (`viprs_fit`)

```text
$ viprs_fit -l ld_store -s sumstats.txt --output-file em/height \\
    --block-size 256 --max-iter 500 --seed 11
{log_em.splitlines()[-1] if log_em else ''}
```

Wall-clock: **{t_em:.2f} s** (including data load + packing + compile-cache
hits). Estimated hyperparameters:

{tab(hyp_em)}

True simulated h² was {panel['h2']}; the EM fit recovers
h² ≈ {h2_est:.3f}. First rows of the posterior table (`.fit.gz`):

{tab(fit_head)}

## 2. Grid search + pseudo-validation (`viprs_fit --hyp-search GS`)

```text
$ viprs_fit -l ld_store -s sumstats.txt --output-file gs/height \\
    --block-size 256 --hyp-search GS --pi-steps 10 \\
    --grid-metric pseudo_validation --max-iter 500 --seed 11
{log_gs.splitlines()[-1] if log_gs else ''}
```

Wall-clock: **{t_gs:.2f} s** for all 10 grid models fit SIMULTANEOUSLY
(one vmapped dispatch with converged-lane masking — the reference fits grid
points serially or in worker processes). Validation table:

{tab(val_gs)}

## 3. Scoring (`viprs_score`)

```text
$ viprs_score -f em/height.fit.gz --bed-files panel --output-file em/prs
{log_sc.splitlines()[-1] if log_sc else ''}
```

Wall-clock: **{t_sc:.2f} s** (harmonization against the BED variant table,
allele-flip handling, linear scoring).

## 4. Evaluation (`viprs_evaluate`)

```text
$ viprs_evaluate --prs-file em/prs.prs --phenotype-file pheno.txt \\
    --output-file em/eval
{log_ev.splitlines()[-1] if log_ev else ''}
```

Wall-clock: **{t_ev:.2f} s**.

{tab(eval_tab)}

With h² = {panel['h2']} the PRS/phenotype R² ceiling is ≈ {panel['h2']};
the achieved **R² = {r2:.3f}** on the training panel reflects the simulated
signal recovered by the posterior mean effect sizes.

## Genome-scale numbers

This document runs a small panel so it regenerates in seconds anywhere.
The genome-scale (~1.1M variants) benchmarks of the SAME code paths — the
0.98 s EM fit, the 5.9 s grid(100)+BMA, capacity plans and multi-chip
scaling — are recorded with their harnesses in [BENCH.md](../BENCH.md).
"""
    with open(args.out, 'w') as f:
        f.write(doc)
    print(f"wrote {args.out}: EM {t_em:.2f}s, GS {t_gs:.2f}s, "
          f"score {t_sc:.2f}s, eval {t_ev:.2f}s, R2={r2:.3f}, "
          f"h2={h2_est:.3f}")


if __name__ == '__main__':
    main()
