"""Zarr v2 reader/writer + magenpy LD-store ingestion tests.

The published UKB LD panels are magenpy LDMatrix objects in Zarr v2 groups
(reference use-site viprs/model/VIPRS.py:147-207). These tests exercise the
dependency-free reader against byte-real fixtures written with the actual
default zarr compressor (blosc/lz4/shuffle via the system libblosc), both row
layouts (symmetric and upper-triangular/low-memory), int8 quantized data, and
the hard-error paths that replace the old silent left-bound guessing.
"""

import numpy as np
import pandas as pd
import pytest

from viprs_tpu.data import zarr_v2, ld_store
from viprs_tpu.ops.block_ld import pack_banded, blockld_to_dense


# ------------------------------------------------------------------ helpers
def _banded_from_blocks(blocks, quantize=True):
    """Dense diagonal blocks -> symmetric banded (data, indptr, left)."""
    R_list = []
    offset = 0
    m = sum(b.shape[0] for b in blocks)
    data, indptr, left = [], [0], []
    for blk in blocks:
        bs = blk.shape[0]
        for j in range(bs):
            row = blk[j]
            data.extend(row)
            indptr.append(len(data))
            left.append(offset)
        offset += bs
        R_list.append(blk)
    data = np.asarray(data)
    if quantize:
        data = np.clip(np.rint(data * 127.0), -127, 127).astype(np.int8)
    return data, np.asarray(indptr, np.int64), np.asarray(left, np.int64)


def _sim_blocks(sizes=(40, 25, 30), seed=3):
    rng = np.random.default_rng(seed)
    blocks = []
    for bs in sizes:
        X = rng.standard_normal((6 * bs, bs))
        X = (X - X.mean(0)) / X.std(0)
        blocks.append(X.T @ X / (6 * bs))
    return blocks


# ------------------------------------------------------------- zarr_v2 core
class TestZarrV2:

    @pytest.mark.parametrize('compressor', [
        None,
        {'id': 'zlib', 'level': 1},
        {'id': 'zstd', 'level': 3},
        pytest.param({'id': 'blosc', 'cname': 'lz4', 'clevel': 5, 'shuffle': 1},
                     marks=pytest.mark.skipif(not zarr_v2.blosc_available(),
                                              reason='libblosc not found')),
        pytest.param({'id': 'blosc', 'cname': 'zstd', 'clevel': 7, 'shuffle': 2},
                     marks=pytest.mark.skipif(not zarr_v2.blosc_available(),
                                              reason='libblosc not found')),
    ])
    @pytest.mark.parametrize('dtype', ['<i8', '|i1', '<f4', '<f8', '<i4'])
    def test_roundtrip_dtypes_compressors(self, tmp_path, compressor, dtype):
        rng = np.random.default_rng(0)
        arr = (rng.standard_normal(1000) * 50).astype(np.dtype(dtype))
        store = str(tmp_path / 'store')
        zarr_v2.write_array(store, 'x', arr, chunks=(256,),
                            compressor=compressor)
        g = zarr_v2.open_group(store)
        out = g['x'][...]
        assert out.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(out, arr)

    def test_2d_chunked_and_f_order(self, tmp_path):
        rng = np.random.default_rng(1)
        arr = rng.standard_normal((37, 53)).astype(np.float32)
        store = str(tmp_path / 'store')
        zarr_v2.write_array(store, 'a/b/mat', arr, chunks=(16, 20),
                            compressor={'id': 'zlib', 'level': 1})
        zarr_v2.write_array(store, 'a/b/matF', arr, chunks=(16, 20),
                            compressor=None, order='F')
        g = zarr_v2.open_group(store)
        np.testing.assert_array_equal(g['a/b/mat'][...], arr)
        np.testing.assert_array_equal(g['a/b/matF'][...], arr)
        assert 'a/b/mat' in g and 'a' in g
        assert g['a'].group_keys() == ['b']
        assert sorted(g['a/b'].array_keys()) == ['mat', 'matF']

    def test_vlen_strings(self, tmp_path):
        snps = np.asarray([f'rs{i}' * (1 + i % 3) for i in range(500)],
                          dtype=object)
        store = str(tmp_path / 'store')
        zarr_v2.write_array(store, 'meta/snps', snps, chunks=(128,))
        out = zarr_v2.open_group(store)['meta/snps'][...]
        assert out.dtype == object
        assert list(out) == list(snps)

    def test_fixed_width_unicode(self, tmp_path):
        arr = np.asarray(['A', 'C', 'GT', 'T'], dtype='<U2')
        store = str(tmp_path / 'store')
        zarr_v2.write_array(store, 'a1', arr, compressor={'id': 'zlib'})
        np.testing.assert_array_equal(zarr_v2.open_group(store)['a1'][...], arr)

    def test_missing_chunk_fill_value(self, tmp_path):
        import json
        import os
        store = str(tmp_path / 'store')
        arr = np.arange(100, dtype=np.int64)
        zarr_v2.write_array(store, 'x', arr, chunks=(30,), compressor=None)
        # drop one chunk and declare a fill value:
        os.remove(str(tmp_path / 'store' / 'x' / '1'))
        meta_path = str(tmp_path / 'store' / 'x' / '.zarray')
        meta = json.load(open(meta_path))
        meta['fill_value'] = -1
        json.dump(meta, open(meta_path, 'w'))
        out = zarr_v2.open_group(store)['x'][...]
        np.testing.assert_array_equal(out[:30], np.arange(30))
        assert (out[30:60] == -1).all()
        np.testing.assert_array_equal(out[60:], np.arange(60, 100))

    def test_group_attrs(self, tmp_path):
        store = str(tmp_path / 'store')
        zarr_v2.write_group_attrs(store, {'Chromosome': 22, 'Sample size': 1000})
        g = zarr_v2.open_group(store)
        assert g.attrs['Chromosome'] == 22


# ------------------------------------------------------- magenpy ingestion
class TestMagenpyStore:

    @pytest.mark.parametrize('triangular', [False, True])
    @pytest.mark.parametrize('quantize', [True, False])
    def test_roundtrip_into_blockld(self, tmp_path, triangular, quantize):
        """save -> load -> pack_banded reproduces the quantized matrix exactly
        (byte-exact for int8 storage)."""
        blocks = _sim_blocks()
        data, indptr, left = _banded_from_blocks(blocks, quantize=quantize)
        m = len(indptr) - 1
        snp_tab = pd.DataFrame({
            'SNP': [f'rs{i}' for i in range(m)],
            'A1': np.random.default_rng(0).choice(['A', 'C'], m),
            'A2': 'G', 'POS': np.arange(m) * 700})

        store = str(tmp_path / 'ukb_mini.zarr')
        ld_store.save_magenpy_zarr(store, data, indptr, left,
                                   snp_table=snp_tab, chrom=22,
                                   sample_size=5000, triangular=triangular)
        banded, tables = ld_store.load_magenpy_zarr(store)
        assert list(banded) == [22]
        data2, indptr2, left2 = banded[22]

        ld, lay = pack_banded({22: (data2, indptr2, left2)}, block_size=64,
                              quantize=quantize)
        R = blockld_to_dense(ld)[:m, :m]

        # ground truth from the original banded arrays:
        R_true = np.zeros((m, m))
        vals = data.astype(np.float64) / 127.0 if quantize else data
        for j in range(m):
            row = vals[indptr[j]:indptr[j + 1]]
            R_true[j, left[j]:left[j] + len(row)] = row
        np.fill_diagonal(R_true, 1.0)
        np.testing.assert_allclose(R, R_true, atol=1e-12)

        # variant metadata round-trips:
        tab = tables[22]
        assert list(tab['SNP']) == list(snp_tab['SNP'])
        assert list(tab['A1']) == list(snp_tab['A1'])
        np.testing.assert_array_equal(tab['POS'].values, snp_tab['POS'].values)

    def test_int8_byte_exact(self, tmp_path):
        """int8 chunks survive compression/decompression bit-for-bit."""
        blocks = _sim_blocks(sizes=(30, 20))
        data, indptr, left = _banded_from_blocks(blocks, quantize=True)
        store = str(tmp_path / 's.zarr')
        ld_store.save_magenpy_zarr(store, data, indptr, left, chrom=1)
        (data2, indptr2, left2) = ld_store.load_magenpy_zarr(store)[0][1]
        assert data2.dtype == np.int8
        np.testing.assert_array_equal(data2, data)
        np.testing.assert_array_equal(indptr2, indptr)
        np.testing.assert_array_equal(left2, left)

    @pytest.mark.parametrize('at_root', [False, True])
    def test_zip_archive_byte_exact(self, tmp_path, at_root):
        """Zip-archived stores (the published chromosome-level UKB LD zips,
        reference docs/download_ld.md) load identically to the directory
        store — both root-level and single-top-directory archive layouts."""
        import zipfile

        blocks = _sim_blocks(sizes=(30, 20))
        data, indptr, left = _banded_from_blocks(blocks, quantize=True)
        m = len(indptr) - 1
        snp_tab = pd.DataFrame({'SNP': [f'rs{i}' for i in range(m)],
                                'A1': 'A', 'A2': 'G',
                                'POS': np.arange(m) * 500})
        store = str(tmp_path / 'chr_9')
        ld_store.save_magenpy_zarr(store, data, indptr, left,
                                   snp_table=snp_tab, chrom=9,
                                   sample_size=4000)

        zpath = str(tmp_path / 'chr_9.zip')
        with zipfile.ZipFile(zpath, 'w') as zf:
            for root, _, files in __import__('os').walk(store):
                for f in files:
                    full = __import__('os').path.join(root, f)
                    rel = __import__('os').path.relpath(full, store)
                    zf.write(full, rel if at_root else f'chr_9/{rel}')

        banded_dir, tables_dir = ld_store.load_magenpy_zarr(store)
        banded_zip, tables_zip = ld_store.load_magenpy_zarr(zpath)
        assert list(banded_zip) == [9]
        for a, b in zip(banded_dir[9], banded_zip[9]):
            np.testing.assert_array_equal(a, b)
        assert banded_zip[9][0].dtype == np.int8
        pd.testing.assert_frame_equal(tables_dir[9], tables_zip[9])

    def test_loader_accepts_zip_store(self, tmp_path):
        """GWADataLoader consumes a zip-archived Zarr store directly."""
        import zipfile
        from viprs_tpu.data.loader import GWADataLoader

        blocks = _sim_blocks(sizes=(25,))
        data, indptr, left = _banded_from_blocks(blocks, quantize=True)
        m = len(indptr) - 1
        snp_tab = pd.DataFrame({'SNP': [f'rs{i}' for i in range(m)],
                                'A1': 'A', 'A2': 'G',
                                'POS': np.arange(m) * 500})
        store = str(tmp_path / 'chr_7')
        ld_store.save_magenpy_zarr(store, data, indptr, left,
                                   snp_table=snp_tab, chrom=7,
                                   sample_size=4000)
        zpath = str(tmp_path / 'chr_7.zip')
        with zipfile.ZipFile(zpath, 'w') as zf:
            for root, _, files in __import__('os').walk(store):
                for f in files:
                    full = __import__('os').path.join(root, f)
                    zf.write(full, __import__('os').path.relpath(full, store))

        loader = GWADataLoader(ld_store_files=zpath)
        assert 7 in loader.ld_blocks
        assert loader.ld_snp_tables is not None
        assert len(loader.ld_snp_tables[7]) == m

    def test_hf_path_resolution_end_to_end(self, tmp_path, monkeypatch):
        """hf:// LD-store paths (the reference's cloud-streamable panels,
        docs/download_ld.md:20-55) resolve through huggingface_hub
        glob -> download -> zip-Zarr ingestion. huggingface_hub is mocked
        (zero-egress environment): the 'download' returns a local zip store.
        """
        import sys
        import types
        import zipfile
        from viprs_tpu.data.loader import GWADataLoader

        # build a zip-archived magenpy Zarr store (the published UKB format):
        blocks = _sim_blocks(sizes=(25,))
        data, indptr, left = _banded_from_blocks(blocks, quantize=True)
        m = len(indptr) - 1
        snp_tab = pd.DataFrame({'SNP': [f'rs{i}' for i in range(m)],
                                'A1': 'A', 'A2': 'G',
                                'POS': np.arange(m) * 500})
        store = str(tmp_path / 'chr_9')
        ld_store.save_magenpy_zarr(store, data, indptr, left,
                                   snp_table=snp_tab, chrom=9,
                                   sample_size=4000)
        zpath = str(tmp_path / 'chr_9.zip')
        with zipfile.ZipFile(zpath, 'w') as zf:
            for root, _, files in __import__('os').walk(store):
                for f in files:
                    full = __import__('os').path.join(root, f)
                    zf.write(full, __import__('os').path.relpath(full, store))

        calls = {}

        class FakeFS:
            def glob(self, pattern):
                calls['glob'] = pattern
                assert pattern == 'datasets/org/ukb-ld/chr_*.zip'
                return ['datasets/org/ukb-ld/chr_9.zip']

        def fake_download(repo_id, filename, repo_type):
            calls['download'] = (repo_id, filename, repo_type)
            assert repo_id == 'org/ukb-ld' and repo_type == 'dataset'
            assert filename == 'chr_9.zip'
            return zpath

        fake_hub = types.ModuleType('huggingface_hub')
        fake_hub.HfFileSystem = FakeFS
        fake_hub.hf_hub_download = fake_download
        monkeypatch.setitem(sys.modules, 'huggingface_hub', fake_hub)

        from viprs_tpu.utils.system import get_filenames as sys_get
        assert sys_get('hf://datasets/org/ukb-ld/chr_*.zip') == [zpath]

        # end-to-end: the loader consumes the hf:// pattern directly:
        loader = GWADataLoader(
            ld_store_files='hf://datasets/org/ukb-ld/chr_*.zip')
        assert 'glob' in calls and 'download' in calls
        assert loader.ld_snp_tables is not None
        assert len(loader.ld_snp_tables[9]) == m
        assert 9 in loader.ld_blocks and len(loader.ld_blocks[9]) >= 1

    def test_int16_dequantized(self, tmp_path):
        blocks = _sim_blocks(sizes=(25,))
        data, indptr, left = _banded_from_blocks(blocks, quantize=False)
        q16 = np.clip(np.rint(data * 32767), -32767, 32767).astype(np.int16)
        store = str(tmp_path / 's16.zarr')
        ld_store.save_magenpy_zarr(store, q16, indptr, left, chrom=2)
        (data2, _, _) = ld_store.load_magenpy_zarr(store)[0][2]
        assert data2.dtype == np.float32
        np.testing.assert_allclose(data2, data, atol=1.0 / 32767)

    def test_missing_boundaries_is_hard_error(self, tmp_path):
        import shutil
        blocks = _sim_blocks(sizes=(20,))
        data, indptr, left = _banded_from_blocks(blocks)
        store = str(tmp_path / 'bad.zarr')
        ld_store.save_magenpy_zarr(store, data, indptr, left, chrom=3)
        shutil.rmtree(str(tmp_path / 'bad.zarr' / 'metadata' / 'ld_boundaries'))
        with pytest.raises(ValueError, match='ld_boundaries'):
            ld_store.load_magenpy_zarr(store)

    def test_inconsistent_boundaries_is_hard_error(self, tmp_path):
        blocks = _sim_blocks(sizes=(20,))
        data, indptr, left = _banded_from_blocks(blocks)
        store = str(tmp_path / 'bad2.zarr')
        ld_store.save_magenpy_zarr(store, data, indptr, left, chrom=3)
        # corrupt the boundaries (shift all ends by 2):
        g = zarr_v2.open_group(store)
        bounds = g['metadata/ld_boundaries'][...]
        bounds[1] += 2
        zarr_v2.write_array(store, 'metadata/ld_boundaries', bounds)
        with pytest.raises(ValueError, match='refusing to guess'):
            ld_store.load_magenpy_zarr(store)

    def test_banded_to_blocks_guard(self):
        # a band that never pinches off raises instead of densifying:
        # row j covers [j, j+2) (diagonal + right neighbor), so every
        # boundary is crossed by some stored entry.
        m = 300
        widths = np.where(np.arange(m) < m - 1, 2, 1)
        indptr = np.concatenate([[0], np.cumsum(widths)])
        left = np.arange(m)
        data = np.ones(int(indptr[-1]))
        with pytest.raises(ValueError, match='pinch'):
            ld_store.banded_to_blocks(data, indptr, left,
                                      max_dense_block=100)


# --------------------------------------------------------- end-to-end fit
class TestZarrPipeline:

    def test_loader_fit_from_zarr_store(self, tmp_path):
        """GWADataLoader consumes a magenpy Zarr store end-to-end and VIPRS
        fits from it (the reference ecosystem's primary data path)."""
        from viprs_tpu.data.loader import GWADataLoader
        from viprs_tpu.model import VIPRS
        from viprs_tpu.data.simulate import simulate_sumstats_blocks

        sim = simulate_sumstats_blocks(n=2500, block_sizes=(120, 90), h2=0.4,
                                       prop_causal=0.05, seed=8)
        blocks = sim['ld_blocks'][22]
        m = sim['m']
        data, indptr, left = _banded_from_blocks(blocks, quantize=True)
        rng = np.random.default_rng(5)
        a1 = rng.choice(['A', 'C'], m)
        snp_tab = pd.DataFrame({'SNP': [f'rs{i}' for i in range(m)],
                                'A1': a1,
                                'A2': np.where(a1 == 'A', 'G', 'T'),
                                'POS': np.arange(m) * 900})
        store = str(tmp_path / 'chr22.zarr')
        ld_store.save_magenpy_zarr(store, data, indptr, left,
                                   snp_table=snp_tab, chrom=22,
                                   sample_size=sim['n'], triangular=True)

        ss = pd.DataFrame({'CHR': 22, 'SNP': snp_tab['SNP'],
                           'POS': snp_tab['POS'],
                           'A1': snp_tab['A1'], 'A2': snp_tab['A2'],
                           'N': sim['n'],
                           'BETA': sim['std_beta'][22],
                           'SE': 1.0 / np.sqrt(sim['n']),
                           'Z': sim['std_beta'][22] * np.sqrt(sim['n'])})
        ss_file = str(tmp_path / 'ss.txt')
        ss.to_csv(ss_file, sep="\t", index=False)

        loader = GWADataLoader(ld_store_files=store, sumstats_files=ss_file,
                               sumstats_format='magenpy')
        ds = loader.to_summary_dataset(block_size=128)
        assert ds.m == m

        np.random.seed(3)
        model = VIPRS(ds)
        model.fit(max_iter=200)
        assert model.optim_result.success, model.optim_result.message
        h2 = model.get_heritability()
        assert 0.15 < h2 < 0.7
        eta = np.concatenate([model.post_mean_beta[c]
                              for c in model.chromosomes])
        bt = np.concatenate([sim['beta_true'][c] for c in model.chromosomes])
        assert np.corrcoef(eta, bt)[0, 1] > 0.4
