"""Multi-host execution test (SURVEY.md §2.4/P7).

Spawns 2 real processes, each owning 4 virtual CPU devices, joined through
``jax.distributed`` with a localhost coordinator. Both run the sharded fused
EM loop over the global 8-device ('blocks', 'grid') mesh and must agree with
each other and with a single-process 8-device run of the identical problem —
exercising viprs_tpu/parallel/distributed.py + mesh.py across a real process
boundary (the reference has nothing here; multi-host is a first-class
deliverable of the TPU framework).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'multihost_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_em_matches_single_process(tmp_path):
    port = _free_port()
    n_proc = 2
    outs = [str(tmp_path / f'proc{i}.json') for i in range(n_proc)]

    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop('XLA_FLAGS', None)  # worker sets its own 4-device flag
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(n_proc), str(port), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(n_proc)]
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        with open(out) as f:
            results.append(json.load(f))

    assert all(r['n_global_devices'] == 8 for r in results)
    e0, e1 = (np.asarray(r['elbos']) for r in results)
    assert np.all(np.isfinite(e0))
    # both processes observe the identical global optimization:
    np.testing.assert_array_equal(e0, e1)
    assert results[0]['nits'] == results[1]['nits']

    # single-process ground truth on this process's own 8 virtual devices
    # (conftest forces xla_force_host_platform_device_count=8):
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    import multihost_worker
    single_elbos, single_nits = multihost_worker.run()
    # different GSPMD partitionings reorder f32 accumulations; agreement is
    # within float32 round-off over the run, not bitwise:
    np.testing.assert_allclose(e0, single_elbos, rtol=1e-6)
    assert results[0]['nits'] == list(np.asarray(single_nits))
