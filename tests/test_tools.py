"""Tests for tools/ and system utilities."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


class TestConvertLDStore:

    def _banded(self, block_sizes, w=30, seed=0):
        """Banded arrays whose band pinches off at block boundaries."""
        rng = np.random.default_rng(seed)
        m = sum(block_sizes)
        R = np.zeros((m, m))
        off = 0
        for bs in block_sizes:
            X = rng.standard_normal((4 * bs, bs))
            X = (X - X.mean(0)) / X.std(0)
            blk = X.T @ X / (4 * bs)
            R[off:off + bs, off:off + bs] = blk
            off += bs
        data, indptr, left = [], [0], []
        for j in range(m):
            cols = np.nonzero(R[j])[0]
            lo, hi = cols.min(), cols.max() + 1
            data.extend(R[j, lo:hi])
            indptr.append(len(data))
            left.append(lo)
        return (np.asarray(data), np.asarray(indptr), np.asarray(left)), R

    def test_banded_to_blocks_exact(self):
        from convert_ld_store import banded_to_blocks
        (data, indptr, left), R = self._banded([40, 60, 30])
        blocks = banded_to_blocks(data, indptr, left)
        assert blocks is not None
        sizes = [b.shape[0] for b in blocks]
        assert sum(sizes) == R.shape[0]
        off = 0
        for b in blocks:
            np.testing.assert_allclose(b, R[off:off + b.shape[0],
                                            off:off + b.shape[0]], atol=1e-9)
            off += b.shape[0]

    def test_cli_roundtrip(self, tmp_path):
        (data, indptr, left), R = self._banded([50, 40])
        np.savez(tmp_path / 'banded.npz', data=data, indptr=indptr,
                 left_bound=left)
        out = str(tmp_path / 'store')
        env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, 'tools', 'convert_ld_store.py'),
             str(tmp_path / 'banded.npz'), out, '--chrom', '21',
             '--no-quantize'],
            capture_output=True, text=True, env=env, timeout=300)
        assert res.returncode == 0, res.stderr
        from viprs_tpu.data import ld_store
        blocks, _ = ld_store.load_ld_store(out)
        assert '21' in {str(k) for k in blocks}


class TestSystemUtils:

    def test_makedir_and_writable(self, tmp_path):
        from viprs_tpu.utils.system import makedir, is_path_writable
        target = str(tmp_path / 'a' / 'b')
        makedir(target)
        assert os.path.isdir(target)
        assert is_path_writable(str(tmp_path / 'new' / 'file.txt'))

    def test_is_numeric(self):
        from viprs_tpu.utils.system import is_numeric
        assert is_numeric(3) and is_numeric('2.5') and not is_numeric('abc')

    def test_peak_memory_profiler(self):
        from viprs_tpu.utils.system import PeakMemoryProfiler
        with PeakMemoryProfiler(interval=0.01) as prof:
            _ = np.ones((1000, 1000))
        assert prof.get_peak_memory() > 0

    def test_get_filenames(self, tmp_path):
        from viprs_tpu.utils.system import get_filenames
        for name in ('a.txt', 'b.txt'):
            (tmp_path / name).write_text('x')
        assert len(get_filenames(str(tmp_path / '*.txt'))) == 2
