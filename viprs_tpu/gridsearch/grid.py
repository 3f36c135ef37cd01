"""Hyperparameter grid construction for grid-search VIPRS models.

Parity with the reference's gridsearch/HyperparameterGrid.py: h2-informed grids
for sigma_epsilon and tau_beta (normal percentiles of the (h2_est, h2_se)
estimate), log-spaced pi grids bounded by [10/M, min(1e4/M, 0.2)], and lambda_min
grids scaled by an empirical minimum eigenvalue; Cartesian combination.
"""

import itertools

import numpy as np
import pandas as pd


class HyperparameterGrid:
    """
    :ivar sigma_epsilon: grid for the residual variance.
    :ivar tau_beta: grid for the prior effect-size precision.
    :ivar pi: grid for the proportion of causal variants.
    :ivar lambda_min: grid for the spectral (ridge) regularizer.
    :ivar h2_est, h2_se: heritability estimate and standard error informing the
        sigma_epsilon / tau_beta grids.
    :ivar n_snps: variant count used for scale-aware grid bounds.
    """

    def __init__(self,
                 sigma_epsilon_grid=None,
                 sigma_epsilon_steps=None,
                 tau_beta_grid=None,
                 tau_beta_steps=None,
                 pi_grid=None,
                 pi_steps=None,
                 lambda_min_grid=None,
                 lambda_min_steps=None,
                 h2_est=None,
                 h2_se=None,
                 n_snps=1e6):

        self.h2_est = h2_est or 0.1
        self.h2_se = h2_se or 0.1
        self.n_snps = n_snps
        self._search_params = []

        self.sigma_epsilon = sigma_epsilon_grid
        if self.sigma_epsilon is not None:
            self._search_params.append('sigma_epsilon')
        elif sigma_epsilon_steps is not None:
            self.generate_sigma_epsilon_grid(steps=sigma_epsilon_steps)

        self.tau_beta = tau_beta_grid
        if self.tau_beta is not None:
            self._search_params.append('tau_beta')
        elif tau_beta_steps is not None:
            self.generate_tau_beta_grid(steps=tau_beta_steps)

        self.pi = pi_grid
        if self.pi is not None:
            self._search_params.append('pi')
        elif pi_steps is not None:
            self.generate_pi_grid(steps=pi_steps)

        self.lambda_min = lambda_min_grid
        if self.lambda_min is not None:
            self._search_params.append('lambda_min')
        elif lambda_min_steps is not None:
            self.generate_lambda_min_grid(steps=lambda_min_steps)

    def _generate_h2_grid(self, steps=5):
        """Heritability values at evenly spaced percentiles (10th-90th) of the
        N(h2_est, h2_se) sampling distribution."""
        assert steps > 0
        h2_se = self.h2_se if self.h2_se is not None else self.h2_est * 0.5
        assert 0. < self.h2_est < 1.
        assert h2_se > 0

        from scipy.stats import norm

        p_start = max(0.1, norm.cdf(1e-5, loc=self.h2_est, scale=h2_se))
        p_stop = min(0.9, norm.cdf(1. - 1e-5, loc=self.h2_est, scale=h2_se))
        return norm.ppf(np.linspace(p_start, p_stop, steps),
                        loc=self.h2_est, scale=h2_se)

    def generate_sigma_epsilon_grid(self, steps=5):
        self.sigma_epsilon = 1. - self._generate_h2_grid(steps)
        if 'sigma_epsilon' not in self._search_params:
            self._search_params.append('sigma_epsilon')

    def generate_tau_beta_grid(self, steps=5):
        # assumes ~1% of variants are causal:
        self.tau_beta = 0.01 * self.n_snps / self._generate_h2_grid(steps)
        if 'tau_beta' not in self._search_params:
            self._search_params.append('tau_beta')

    def generate_pi_grid(self, steps=5, max_pi=0.2):
        assert steps > 0
        min_pi = np.log10(max(10. / self.n_snps, 1e-5))
        max_pi = np.log10(min(10000 / self.n_snps, max_pi))
        assert min_pi < max_pi
        self.pi = np.logspace(min_pi, max_pi, steps)
        if 'pi' not in self._search_params:
            self._search_params.append('pi')

    def generate_lambda_min_grid(self, steps=5, emp_lambda_min=None):
        assert steps > 0
        self.lambda_min = np.concatenate([[0.], np.logspace(-4, 1., steps - 1)])
        if emp_lambda_min is not None:
            self.lambda_min *= emp_lambda_min
        if 'lambda_min' not in self._search_params:
            self._search_params.append('lambda_min')

    def combine_grids(self):
        """Cartesian product of the active grids as a list of dicts."""
        hyp_names = [name for name, value in self.__dict__.items()
                     if value is not None and name in self._search_params]
        if not hyp_names:
            raise ValueError("All the grids are empty!")
        hyp_values = itertools.product(
            *[grid for name, grid in self.__dict__.items() if name in hyp_names])
        return [dict(zip(hyp_names, vals)) for vals in hyp_values]

    def to_table(self):
        return pd.DataFrame(self.combine_grids())
