"""Worker process for the multi-host test (tests/test_multihost.py).

Each of N processes owns 4 virtual CPU devices, joins a jax.distributed
cluster, builds the SAME deterministic problem, shards it over the global
('blocks', 'grid') mesh, runs the fused EM loop, and writes its view of the
per-model final ELBOs to a JSON file. Run as:

    python tests/multihost_worker.py <process_id> <num_processes> <port> <out>
"""

import json
import os
import sys

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_problem():
    """Deterministic multi-model problem (identical on every process)."""
    import numpy as np
    import jax.numpy as jnp
    from viprs_tpu.data.simulate import simulate_sumstats_blocks
    from viprs_tpu.ops.block_ld import pack_dense_blocks
    from viprs_tpu.ops.cavi_jax import CaviState, Hyper

    sim = simulate_sumstats_blocks(n=2000, block_sizes=(96, 96, 96, 96),
                                   h2=0.3, prop_causal=0.05, seed=77)
    ld, lay = pack_dense_blocks({22: sim['ld_blocks'][22]}, block_size=128)
    nb, B = lay.nb, lay.block_size
    S = 2
    pis = np.array([0.01, 0.1])

    def logit(p):
        return np.log(p) - np.log1p(-p)

    state = CaviState(
        logits=jnp.asarray(np.tile(logit(pis)[:, None, None], (1, nb, B)),
                           jnp.float32),
        mu=jnp.zeros((S, nb, B), jnp.float32),
        eta=jnp.zeros((S, nb, B), jnp.float32),
        q=jnp.zeros((S, nb, B), jnp.float32))
    hyper = Hyper(sigma_eps=jnp.full(S, 0.8, jnp.float32),
                  tau_beta=jnp.full(S, 100.0, jnp.float32),
                  pi=jnp.asarray(pis, jnp.float32),
                  lambda_min=jnp.zeros(S, jnp.float32))
    sb = jnp.asarray(lay.to_flat(sim['std_beta']).reshape(nb, B), jnp.float32)
    nf = jnp.asarray(lay.to_flat(sim['n_per_snp']).reshape(nb, B), jnp.float32)
    return ld, lay, state, hyper, sb, nf, sim


def run(mesh=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from viprs_tpu.ops import em_loop, updates
    from viprs_tpu.parallel.mesh import make_mesh, shard_problem

    ld, lay, state, hyper, sb, nf, sim = build_problem()
    if mesh is None:
        mesh = make_mesh(n_grid_axis=2)
    ld, state, sb, nf = shard_problem(mesh, ld, state, sb, nf)

    S = 2
    fix = updates.FixMask(sigma_eps=jnp.zeros(S, bool),
                          tau_beta=jnp.zeros(S, bool),
                          pi=jnp.ones(S, bool))
    res = em_loop.em_fit(ld, state, sb, nf, hyper, fix,
                         n_sample=2000.0, m_total=float(lay.m),
                         init_elbo=jnp.zeros(S, jnp.float64),
                         active0=jnp.ones(S, bool),
                         max_iter=60, f_abs_tol=1e-8)
    def to_host(x):
        """Global (S,) array -> host numpy, whatever sharding GSPMD chose."""
        if getattr(x, 'is_fully_replicated', True):
            return np.asarray(x)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return to_host(res.final_elbo), to_host(res.nit)


def main():
    process_id, num_processes, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                                            int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    assert jax.device_count() == 4 * num_processes

    elbos, nits = run()
    with open(out, 'w') as f:
        json.dump({'process': process_id,
                   'n_global_devices': jax.device_count(),
                   'elbos': [float(e) for e in elbos],
                   'nits': [int(n) for n in nits]}, f)


if __name__ == '__main__':
    main()
