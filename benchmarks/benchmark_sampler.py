#!/usr/bin/env python3
"""Posterior-check benchmark: MCMC (Gibbs / tempered SMC / HMC) vs VI at scale.

The exact-inference counterpart of BASELINE.json config #5: run the blocked
Gibbs sampler, SMC over a hyperparameter grid, and HMC refinement on a
>=150k-variant synthetic problem, and report wall-clock plus agreement with
the variational fit (PIP and posterior-mean correlations). This doubles as
the documented entry point for the sampler stack (viprs_tpu/model/sampler.py).

Usage: python benchmarks/benchmark_sampler.py [m_variants]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import viprs_tpu  # noqa: F401
    import jax
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench', Path(__file__).resolve().parent.parent / 'bench.py')
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from viprs_tpu.data.dataset import SummaryStatsDataset
    from viprs_tpu.model import VIPRS
    from viprs_tpu.model.sampler import GibbsSampler, smc_over_grid, hmc_refine

    m_target = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 150_000
    log(f"devices: {jax.devices()}")

    t0 = time.time()
    ld_blocks, std_beta, n_per_snp = bench.synthesize_genome(
        m_target=m_target, h2=0.25, prop_causal=0.002)
    ds = SummaryStatsDataset.from_dense_blocks(
        ld_blocks, std_beta, n_per_snp, block_size=1024, quantize=True)
    log(f"data: {time.time() - t0:.1f}s  M={ds.m} NB={ds.layout.nb}")

    # ---- VI reference fit ----
    np.random.seed(0)
    model = VIPRS(ds)
    t0 = time.time()
    model.fit(max_iter=1000)
    t_vi = time.time() - t0
    vi_pip = np.concatenate([model.pip[c] for c in model.chromosomes])
    vi_eta = np.concatenate([model.post_mean_beta[c]
                             for c in model.chromosomes])
    log(f"VI fit: {t_vi:.2f}s ({model.optim_result.nit} iters, "
        f"h2={model.get_heritability():.4f}, pi={model.pi:.5f})")

    def agree(pip, eta, name, secs):
        pip_r = np.corrcoef(vi_pip, pip)[0, 1]
        eta_r = np.corrcoef(vi_eta, eta)[0, 1]
        # PIP agreement on the decision-relevant variants:
        top = vi_pip > 0.5
        hit = float(np.mean(pip[top] > 0.5)) if top.any() else float('nan')
        log(f"{name}: {secs:.2f}s  PIP corr {pip_r:.4f}  eta corr {eta_r:.4f}"
            f"  P(MCMC PIP>.5 | VI PIP>.5) {hit:.3f}")
        return dict(name=name, seconds=secs, pip_corr=pip_r, eta_corr=eta_r,
                    top_agreement=hit)

    rows = []

    # ---- blocked Gibbs at the VI-fitted hyperparameters ----
    sampler = GibbsSampler(ds, pi=float(model.pi),
                           tau_beta=float(model.tau_beta),
                           sigma_eps=float(model.sigma_epsilon),
                           n_chains=4, seed=1)
    t0 = time.time()
    out = sampler.run(n_iter=400, burn_in=150)
    t_gibbs = time.time() - t0
    g_pip = np.concatenate([out['pip'][c] for c in model.chromosomes])
    g_eta = np.concatenate([out['post_mean_beta'][c]
                            for c in model.chromosomes])
    rows.append(agree(g_pip, g_eta, "Gibbs(4 chains, 400 sweeps)", t_gibbs))

    # ---- tempered SMC over a pi grid ----
    import pandas as pd
    pis = np.geomspace(2e-4, 2e-2, 8)
    grid = pd.DataFrame({'pi': pis, 'tau_beta': pis * ds.m / 0.25,
                         'sigma_epsilon': 0.75})
    t0 = time.time()
    smc = smc_over_grid(ds, grid, n_stages=6, sweeps_per_stage=5, seed=2)
    t_smc = time.time() - t0
    s_pip = np.concatenate([smc['posterior']['pip'][c]
                            for c in model.chromosomes])
    s_eta = np.concatenate([smc['posterior']['post_mean_beta'][c]
                            for c in model.chromosomes])
    rows.append(agree(s_pip, s_eta, "SMC(8 particles, 6 stages)", t_smc))
    log(f"SMC best particle: pi={smc['best_hyper']['pi']:.5f} "
        f"(VI: {model.pi:.5f}); weights={np.round(smc['weights'], 3)}")

    # ---- HMC refinement on the VI-selected configuration ----
    gmask = {c: (model.pip[c] > 0.5).astype(np.float64)
             for c in model.chromosomes}
    t0 = time.time()
    hmc = hmc_refine(ds, gmask, pi=float(model.pi),
                     tau_beta=float(model.tau_beta),
                     sigma_eps=float(model.sigma_epsilon),
                     n_samples=120, n_leapfrog=10, seed=3)
    t_hmc = time.time() - t0
    # steady-state (the first call pays the two scan compiles):
    t0 = time.time()
    hmc = hmc_refine(ds, gmask, pi=float(model.pi),
                     tau_beta=float(model.tau_beta),
                     sigma_eps=float(model.sigma_epsilon),
                     n_samples=120, n_leapfrog=10, seed=4)
    t_hmc_steady = time.time() - t0
    h_eta = np.concatenate([hmc['post_mean_beta'][c]
                            for c in model.chromosomes])
    sel = np.concatenate([gmask[c] for c in model.chromosomes]) > 0
    eta_r = np.corrcoef(vi_eta[sel], h_eta[sel])[0, 1] if sel.any() else np.nan
    log(f"HMC(4 chains, 120 samples): cold {t_hmc:.2f}s / steady "
        f"{t_hmc_steady:.2f}s  accept {hmc['accept_rate']:.2f} "
        f"(warmup {hmc['warmup_accept_rate']:.2f}, eps {hmc['step_size']:.3f})"
        f"  eta corr (selected) {eta_r:.4f}")
    rows.append(dict(name="HMC(refine)", seconds=t_hmc_steady,
                     seconds_cold=t_hmc, eta_corr_selected=eta_r,
                     accept=hmc['accept_rate'],
                     warmup_accept=hmc['warmup_accept_rate'],
                     step_size=hmc['step_size']))

    import json
    print(json.dumps({'m': ds.m, 'vi_seconds': t_vi, 'rows': rows}))


if __name__ == '__main__':
    main()
