"""Data-layer tests: parsers, harmonization, genotype IO, LD estimation, loader."""

import numpy as np
import pandas as pd
import pytest

from viprs_tpu.data.sumstats import read_sumstats, SumstatsTable
from viprs_tpu.data.harmonize import merge_snp_tables
from viprs_tpu.data.genotype import GenotypeMatrix
from viprs_tpu.data import ld_estimators, ld_store
from viprs_tpu.data.loader import GWADataLoader
from viprs_tpu.data.split import sumstats_train_test_split
from viprs_tpu.data.dataset import SummaryStatsDataset
from viprs_tpu.data.simulate import simulate_sumstats_blocks

from plink_utils import write_plink_bed

RNG = np.random.default_rng(77)


def _make_bed(tmp_path, n=200, m=150, n_chroms=2, seed=3):
    rng = np.random.default_rng(seed)
    maf = rng.uniform(0.1, 0.5, m)
    dosages = rng.binomial(2, maf, size=(n, m)).astype(np.float64)
    chroms = np.repeat(np.arange(1, n_chroms + 1), m // n_chroms + 1)[:m]
    alleles = rng.choice(['A', 'C', 'G', 'T'], size=(m, 2))
    # avoid A1 == A2:
    same = alleles[:, 0] == alleles[:, 1]
    alleles[same, 1] = np.where(alleles[same, 0] == 'A', 'G', 'A')
    bim = pd.DataFrame({'CHR': chroms, 'SNP': [f'rs{i}' for i in range(m)],
                        'CM': 0.0, 'POS': np.arange(1, m + 1) * 1000,
                        'A1': alleles[:, 0], 'A2': alleles[:, 1]})
    beta = np.zeros(m)
    causal = rng.random(m) < 0.1
    beta[causal] = rng.standard_normal(causal.sum()) * 0.3
    x_std = (dosages - dosages.mean(0)) / np.maximum(dosages.std(0), 1e-9)
    y = x_std @ beta + rng.standard_normal(n)
    fam = pd.DataFrame({'FID': [f'F{i}' for i in range(n)],
                        'IID': [f'I{i}' for i in range(n)],
                        'father': 0, 'mother': 0, 'sex': 1, 'PHENO': y})
    prefix = str(tmp_path / 'test_geno')
    write_plink_bed(prefix, dosages, bim, fam)
    return prefix, dosages, bim, fam, y


class TestSumstatsParsers:

    def _base_df(self, fmt_cols, m=50):
        rng = np.random.default_rng(0)
        beta = rng.standard_normal(m) * 0.02
        se = np.abs(rng.standard_normal(m)) * 0.01 + 0.005
        data = {
            'CHR': 1, 'SNP': [f'rs{i}' for i in range(m)],
            'POS': np.arange(m) * 500, 'A1': 'A', 'A2': 'G',
            'BETA': beta, 'SE': se, 'N': 10000,
            'P': np.clip(rng.random(m), 1e-8, 1),
        }
        return pd.DataFrame({k: data[v] for k, v in fmt_cols.items()})

    def test_magenpy_format(self, tmp_path):
        df = self._base_df({'CHR': 'CHR', 'SNP': 'SNP', 'POS': 'POS', 'A1': 'A1',
                            'A2': 'A2', 'BETA': 'BETA', 'SE': 'SE', 'N': 'N'})
        f = tmp_path / 'ss.txt'
        df.to_csv(f, sep="\t", index=False)
        ss = read_sumstats(str(f), 'magenpy')
        assert len(ss) == 50
        np.testing.assert_allclose(ss.z_score, df['BETA'] / df['SE'])
        r = ss.get_snp_pseudo_corr()
        assert np.all(np.abs(r) < 1)

    def test_fastgwa_format(self, tmp_path):
        df = self._base_df({'CHR': 'CHR', 'SNP': 'SNP', 'POS': 'POS', 'A1': 'A1',
                            'A2': 'A2', 'N': 'N', 'BETA': 'BETA', 'SE': 'SE',
                            'P': 'P'})
        df['AF1'] = 0.3
        f = tmp_path / 'ss.fastGWA'
        df.to_csv(f, sep="\t", index=False)
        ss = read_sumstats(str(f), 'fastgwa')
        assert 'MAF' in ss.table.columns

    def test_cojo_format(self, tmp_path):
        df = self._base_df({'SNP': 'SNP', 'A1': 'A1', 'A2': 'A2', 'b': 'BETA',
                            'se': 'SE', 'p': 'P', 'N': 'N'})
        df['freq'] = 0.25
        f = tmp_path / 'ss.ma'
        df.to_csv(f, sep=" ", index=False)
        ss = read_sumstats(str(f), 'cojo')
        assert len(ss) == 50

    def test_ssf_format(self, tmp_path):
        df = self._base_df({
            'chromosome': 'CHR', 'variant_id': 'SNP', 'base_pair_location': 'POS',
            'effect_allele': 'A1', 'other_allele': 'A2', 'beta': 'BETA',
            'standard_error': 'SE', 'p_value': 'P', 'n': 'N'})
        f = tmp_path / 'ss.tsv'
        df.to_csv(f, sep="\t", index=False)
        ss = read_sumstats(str(f), 'gwas-ssf')
        assert {'CHR', 'SNP', 'A1', 'A2', 'Z'} <= set(ss.table.columns)

    def test_custom_format(self, tmp_path):
        df = pd.DataFrame({'marker': ['rs1', 'rs2'], 'eff': ['A', 'C'],
                           'ref': ['G', 'T'], 'zscore': [1.2, -0.5],
                           'samples': [5000, 5000]})
        f = tmp_path / 'ss.custom'
        df.to_csv(f, sep="\t", index=False)
        ss = read_sumstats(str(f), 'custom',
                           column_map={'marker': 'SNP', 'eff': 'A1', 'ref': 'A2',
                                       'zscore': 'Z', 'samples': 'N'})
        np.testing.assert_allclose(ss.z_score, [1.2, -0.5])


class TestHarmonization:

    def test_allele_flip_sign(self):
        ref = pd.DataFrame({'SNP': ['rs1', 'rs2', 'rs3'],
                            'A1': ['A', 'C', 'G'], 'A2': ['G', 'T', 'A']})
        other = pd.DataFrame({'SNP': ['rs1', 'rs2', 'rs3'],
                              'A1': ['G', 'C', 'G'], 'A2': ['A', 'T', 'A'],
                              'BETA': [0.5, 0.2, -0.1]})
        merged = merge_snp_tables(ref, other, signed_statistics=['BETA'])
        np.testing.assert_allclose(merged['BETA'].values, [-0.5, 0.2, -0.1])

    def test_strand_flip(self):
        ref = pd.DataFrame({'SNP': ['rs1'], 'A1': ['A'], 'A2': ['G']})
        # complement alleles (T/C = complements of A/G), same orientation:
        other = pd.DataFrame({'SNP': ['rs1'], 'A1': ['T'], 'A2': ['C'],
                              'BETA': [0.3]})
        merged = merge_snp_tables(ref, other, signed_statistics=['BETA'])
        np.testing.assert_allclose(merged['BETA'].values, [0.3])

    def test_mismatched_dropped(self):
        ref = pd.DataFrame({'SNP': ['rs1', 'rs2'], 'A1': ['A', 'C'],
                            'A2': ['G', 'T']})
        other = pd.DataFrame({'SNP': ['rs1', 'rs2'], 'A1': ['A', 'A'],
                              'A2': ['G', 'C'], 'BETA': [0.5, 0.2]})
        merged = merge_snp_tables(ref, other, how='inner',
                                  signed_statistics=['BETA'])
        assert len(merged) == 1 and merged['SNP'].iloc[0] == 'rs1'


class TestGenotype:

    def test_bed_roundtrip(self, tmp_path):
        prefix, dosages, bim, fam, _ = _make_bed(tmp_path)
        g = GenotypeMatrix(prefix)
        assert g.shape == dosages.shape
        got = g.dosages(impute=False)
        np.testing.assert_array_equal(got, dosages)

    def test_scoring(self, tmp_path):
        prefix, dosages, bim, fam, _ = _make_bed(tmp_path)
        g = GenotypeMatrix(prefix)
        beta = RNG.standard_normal(g.m) * 0.1
        prs = g.score(beta)
        x = (dosages - dosages.mean(0)) / np.maximum(dosages.std(0), 1e-12)
        np.testing.assert_allclose(prs, x @ beta, atol=1e-8)

    def test_gwas(self, tmp_path):
        prefix, dosages, bim, fam, y = _make_bed(tmp_path)
        g = GenotypeMatrix(prefix)
        ss = g.perform_gwas(y)
        assert len(ss) == g.m
        # marginal betas equal standardized x'y/n:
        x = (dosages - dosages.mean(0)) / np.maximum(dosages.std(0), 1e-12)
        ys = (y - y.mean()) / y.std()
        np.testing.assert_allclose(ss.marginal_beta, x.T @ ys / g.n, atol=1e-10)


class TestLDEstimators:

    def test_block_ld(self, tmp_path):
        prefix, dosages, *_ = _make_bed(tmp_path)
        g = GenotypeMatrix(prefix)
        blocks = ld_estimators.block_ld(g, max_block_size=40)
        for c, blist in blocks.items():
            total = sum(b.shape[0] for b in blist)
            assert total == int((g.bim['CHR'] == c).sum())
            for b in blist:
                np.testing.assert_allclose(np.diag(b), 1.0, atol=1e-9)

    def test_windowed_ld(self, tmp_path):
        prefix, *_ = _make_bed(tmp_path)
        g = GenotypeMatrix(prefix)
        blocks = ld_estimators.windowed_ld(g, window_kb=20)
        assert all(len(b) >= 1 for b in blocks.values())

    def test_shrinkage_ld(self, tmp_path):
        prefix, *_ = _make_bed(tmp_path)
        g = GenotypeMatrix(prefix)
        raw = ld_estimators.block_ld(g, max_block_size=50)
        shrunk = ld_estimators.shrinkage_ld(g, max_block_size=50)
        # shrinkage attenuates off-diagonals:
        for c in raw:
            for rb, sb in zip(raw[c], shrunk[c]):
                off = ~np.eye(rb.shape[0], dtype=bool)
                assert np.all(np.abs(sb[off]) <= np.abs(rb[off]) + 1e-12)


class TestLDStore:

    def test_save_load_roundtrip(self, tmp_path):
        sim = simulate_sumstats_blocks(n=500, block_sizes=(60, 40), seed=1)
        snp_tables = {22: pd.DataFrame({
            'CHR': 22, 'SNP': [f'rs{i}' for i in range(sim['m'])],
            'POS': np.arange(sim['m']), 'A1': 'A', 'A2': 'G'})}
        path = str(tmp_path / 'ld_store')
        ld_store.save_ld_store(path, sim['ld_blocks'], snp_tables, quantize=True)
        blocks, tables = ld_store.load_ld_store(path)
        assert 22 in blocks and len(blocks[22]) == 2
        np.testing.assert_allclose(blocks[22][0], sim['ld_blocks'][22][0],
                                   atol=1.0 / 127)
        assert tables[22]['SNP'].iloc[0] == 'rs0'

    def test_int8_passthrough_matches_dequantized_path(self, tmp_path):
        """A quantized store packs to BYTE-identical tiles whether the blocks
        stream through as int8 (the default: load_ld_store(dequantize=False)
        -> pack verbatim) or are inflated to float64 and re-quantized (the
        pre-round-4 path): clip(rint((q/127)*127)) == q for integer q."""
        from viprs_tpu.ops.block_ld import pack_dense_blocks
        sim = simulate_sumstats_blocks(n=500, block_sizes=(60, 40), seed=3)
        path = str(tmp_path / 'ld_store')
        ld_store.save_ld_store(path, sim['ld_blocks'], quantize=True)

        int8_blocks, _ = ld_store.load_ld_store(path, dequantize=False)
        f64_blocks, _ = ld_store.load_ld_store(path)  # default dequantizes
        assert int8_blocks[22][0].dtype == np.int8
        assert f64_blocks[22][0].dtype == np.float64

        ld_a, lay_a = pack_dense_blocks(int8_blocks, block_size=128,
                                        quantize=True)
        ld_b, lay_b = pack_dense_blocks(f64_blocks, block_size=128,
                                        quantize=True)
        np.testing.assert_array_equal(np.asarray(ld_a.diag),
                                      np.asarray(ld_b.diag))
        np.testing.assert_array_equal(np.asarray(ld_a.off_data),
                                      np.asarray(ld_b.off_data))
        assert ld_a.scale == ld_b.scale

        # int8 blocks packed WITHOUT quantization dequantize in the tiles:
        ld_c, _ = pack_dense_blocks(int8_blocks, block_size=128,
                                    quantize=False)
        np.testing.assert_allclose(
            np.asarray(ld_c.diag),
            np.asarray(ld_b.diag).astype(np.float32) / 127.0, atol=1e-7)

        # re-saving int8 blocks writes them verbatim (no double scaling):
        path2 = str(tmp_path / 'ld_store2')
        ld_store.save_ld_store(path2, int8_blocks, quantize=True)
        reload_, _ = ld_store.load_ld_store(path2, dequantize=False)
        np.testing.assert_array_equal(reload_[22][0], int8_blocks[22][0])

    def test_loader_materializes_int8_from_quantized_store(self, tmp_path):
        """Store-backed loaders keep the genome at 1 byte/element host-side
        (an 18M-variant panel would be ~125 GB as float64)."""
        sim = simulate_sumstats_blocks(n=500, block_sizes=(60, 40), seed=4)
        snp_tables = {22: pd.DataFrame({
            'CHR': 22, 'SNP': [f'rs{i}' for i in range(sim['m'])],
            'POS': np.arange(sim['m']), 'A1': 'A', 'A2': 'G'})}
        path = str(tmp_path / 'ld_store')
        ld_store.save_ld_store(path, sim['ld_blocks'], snp_tables,
                               quantize=True)
        loader = GWADataLoader(ld_store_files=path, block_size=128)
        blocks = loader.ld_blocks
        assert all(b.dtype == np.int8 for b in blocks[22])

    def test_banded_to_blocks_keep_quantized(self):
        """int8 banded input -> int8 dense blocks == 127 * the float64 path."""
        sim = simulate_sumstats_blocks(n=400, block_sizes=(30, 20), seed=5)
        # build a banded int8 representation of the two blocks:
        rows, indptr, left = [], [0], []
        q_blocks = [np.clip(np.rint(b * 127.0), -127, 127).astype(np.int8)
                    for b in sim['ld_blocks'][22]]
        off = 0
        for qb in q_blocks:
            m_b = qb.shape[0]
            for j in range(m_b):
                rows.append(qb[j])
                indptr.append(indptr[-1] + m_b)
                left.append(off)
            off += m_b
        data = np.concatenate(rows)
        blocks_i8 = ld_store.banded_to_blocks(data, np.asarray(indptr),
                                              np.asarray(left),
                                              keep_quantized=True)
        blocks_f64 = ld_store.banded_to_blocks(data, np.asarray(indptr),
                                               np.asarray(left))
        assert len(blocks_i8) == len(q_blocks)
        for bi, bf in zip(blocks_i8, blocks_f64):
            assert bi.dtype == np.int8
            np.testing.assert_allclose(bi.astype(np.float64) / 127.0, bf,
                                       atol=1e-12)


class TestLoader:

    def test_end_to_end(self, tmp_path):
        prefix, dosages, bim, fam, y = _make_bed(tmp_path, n=400, m=120)
        g = GenotypeMatrix(prefix)
        ss = g.perform_gwas(y)

        ss_file = tmp_path / 'sumstats.txt'
        ss.table.to_csv(ss_file, sep="\t", index=False)

        # build + save an LD store from the genotype:
        loader0 = GWADataLoader(bed_files=prefix)
        loader0.compute_ld(estimator='block', max_block_size=50)
        store = str(tmp_path / 'ld')
        ld_store.save_ld_store(store, loader0.ld_blocks, loader0.ld_snp_tables,
                               quantize=False)

        # load from files and harmonize:
        loader = GWADataLoader(ld_store_files=store, sumstats_files=str(ss_file),
                               sumstats_format='magenpy', block_size=128)
        assert loader.m == 120
        ds = loader.to_summary_dataset()
        assert isinstance(ds, SummaryStatsDataset)
        assert ds.m == 120

        # fit a model end-to-end on loader-produced data:
        from viprs_tpu.model import VIPRS
        np.random.seed(0)
        m = VIPRS(ds)
        m.fit(max_iter=100)
        assert m.optim_result.stop_iteration

    def test_pack_cache_roundtrip(self, tmp_path, monkeypatch):
        """Second loader on the same panel hits the packed-LD disk cache:
        the dataset matches byte-exact and the LD store data is NEVER read
        (the lazy loader touches only the variant tables)."""
        prefix, dosages, bim, fam, y = _make_bed(tmp_path, n=400, m=120)
        g = GenotypeMatrix(prefix)
        ss = g.perform_gwas(y)
        ss_file = tmp_path / 'sumstats.txt'
        ss.table.to_csv(ss_file, sep="\t", index=False)
        loader0 = GWADataLoader(bed_files=prefix)
        loader0.compute_ld(estimator='block', max_block_size=50)
        store = str(tmp_path / 'ld')
        ld_store.save_ld_store(store, loader0.ld_blocks, loader0.ld_snp_tables,
                               quantize=True)

        monkeypatch.setenv('VIPRS_TPU_PACK_CACHE', str(tmp_path / 'pcache'))

        loader1 = GWADataLoader(ld_store_files=store,
                                sumstats_files=str(ss_file), block_size=128,
                                quantize_ld=True)
        ds1 = loader1.to_summary_dataset()   # miss -> pack + save

        # fresh loader: cache hit; poison the block-materialization path to
        # prove the LD data is never decompressed again:
        loader2 = GWADataLoader(ld_store_files=store,
                                sumstats_files=str(ss_file), block_size=128,
                                quantize_ld=True)
        monkeypatch.setattr(
            GWADataLoader, '_ensure_ld_blocks',
            lambda self: (_ for _ in ()).throw(
                AssertionError("cache hit must not materialize LD blocks")))
        ds2 = loader2.to_summary_dataset()
        np.testing.assert_array_equal(np.asarray(ds1.ld.diag),
                                      np.asarray(ds2.ld.diag))
        np.testing.assert_array_equal(np.asarray(ds1.ld.mask),
                                      np.asarray(ds2.ld.mask))
        assert ds1.layout.chromosomes == ds2.layout.chromosomes
        np.testing.assert_array_equal(ds1.layout.flat_index,
                                      ds2.layout.flat_index)

        # fits from both datasets agree:
        from viprs_tpu.model import VIPRS
        np.random.seed(0)
        m1 = VIPRS(ds1); m1.fit(max_iter=60)
        np.random.seed(0)
        m2 = VIPRS(ds2); m2.fit(max_iter=60)
        assert m1.optim_result.nit == m2.optim_result.nit
        np.testing.assert_allclose(m1.history['ELBO'], m2.history['ELBO'],
                                   rtol=1e-12)

    def test_pack_cache_invalidation(self, tmp_path, monkeypatch):
        """Touching the store or changing the variant subset changes the key."""
        from viprs_tpu.data import pack_cache
        prefix, dosages, bim, fam, y = _make_bed(tmp_path, n=300, m=80)
        g = GenotypeMatrix(prefix)
        ss = g.perform_gwas(y)
        ss_file = tmp_path / 'sumstats.txt'
        ss.table.to_csv(ss_file, sep="\t", index=False)
        loader0 = GWADataLoader(bed_files=prefix)
        loader0.compute_ld(estimator='block', max_block_size=40)
        store = str(tmp_path / 'ld')
        ld_store.save_ld_store(store, loader0.ld_blocks, loader0.ld_snp_tables)

        snps = {21: np.array([f'rs{i}' for i in range(80)])}
        k1 = pack_cache.compute_key([store], snps, 128, True)
        assert k1 == pack_cache.compute_key([store], snps, 128, True)
        assert k1 != pack_cache.compute_key([store], snps, 256, True)
        assert k1 != pack_cache.compute_key([store], snps, 128, False)
        snps2 = {21: snps[21][:-1]}
        assert k1 != pack_cache.compute_key([store], snps2, 128, True)
        import os, os.path as osp, time
        time.sleep(0.01)
        os.utime(osp.join(store, 'metadata.json'))
        assert k1 != pack_cache.compute_key([store], snps, 128, True)

        # disabled cache:
        monkeypatch.setenv('VIPRS_TPU_PACK_CACHE', 'off')
        assert pack_cache.cache_root() is None
        assert pack_cache.load_packed('deadbeef') is None

    def test_harmonization_drops_and_flips(self, tmp_path):
        prefix, dosages, bim, fam, y = _make_bed(tmp_path, n=300, m=80)
        g = GenotypeMatrix(prefix)
        ss = g.perform_gwas(y)
        tab = ss.table.copy()
        # flip alleles + beta sign for some variants; drop a few:
        flip = np.arange(0, 30)
        a1 = tab.loc[flip, 'A1'].copy()
        tab.loc[flip, 'A1'] = tab.loc[flip, 'A2'].values
        tab.loc[flip, 'A2'] = a1.values
        tab.loc[flip, 'BETA'] = -tab.loc[flip, 'BETA']
        tab.loc[flip, 'Z'] = -tab.loc[flip, 'Z']
        tab = tab.drop(index=range(70, 80))
        ss_file = tmp_path / 'ss_flip.txt'
        tab.to_csv(ss_file, sep="\t", index=False)

        loader0 = GWADataLoader(bed_files=prefix)
        loader0.compute_ld(estimator='block', max_block_size=64)
        store = str(tmp_path / 'ld2')
        ld_store.save_ld_store(store, loader0.ld_blocks, loader0.ld_snp_tables,
                               quantize=False)

        loader = GWADataLoader(ld_store_files=store, sumstats_files=str(ss_file),
                               block_size=128)
        assert loader.m == 70  # dropped variants removed
        # flipped variants recover the original Z sign:
        ds = loader.to_summary_dataset()
        orig = ss.get_snp_pseudo_corr()[:70]
        got = np.concatenate([ds.std_beta[c] for c in ds.chromosomes])
        np.testing.assert_allclose(got, orig, rtol=1e-6)


class TestPUMASSplit:

    def test_split_consistency(self):
        sim = simulate_sumstats_blocks(n=2000, block_sizes=(100, 80), seed=4)
        ds = SummaryStatsDataset.from_dense_blocks(
            sim['ld_blocks'], sim['std_beta'], sim['n_per_snp'], block_size=128)
        split = sumstats_train_test_split(ds, prop_train=0.8, seed=0)
        for c in ds.chromosomes:
            beta = np.asarray(ds.std_beta[c])
            n = np.asarray(ds.n_per_snp[c])
            tr, te = split[c]['train_beta'], split[c]['test_beta']
            # consistency: n*beta = n_t*train + n_v*test
            recon = 0.8 * tr + 0.2 * te
            np.testing.assert_allclose(recon, beta, atol=1e-12)
            # train noise has roughly the right scale:
            expected_sd = np.sqrt(1.0 / (0.8 * n[0]) - 1.0 / n[0])
            sd = np.std(tr - beta)
            assert 0.5 * expected_sd < sd < 2.0 * expected_sd
