"""On-disk LD matrix stores.

Native format: one ``chr_<c>.npz`` per chromosome holding the dense LD blocks
(float32 or int8-quantized, block-diagonal layout) plus a ``chr_<c>.snps.csv``
variant table — directly re-packable into the TPU BlockLD tiles.

Ingestion of the reference ecosystem's stores (magenpy Zarr-backed banded
matrices, int8-quantized; consumed surface at SURVEY.md §2.6) is provided via
:func:`load_magenpy_zarr`, gated on the optional ``zarr`` dependency (not
available in every environment).
"""

import json
import logging
import os
import os.path as osp

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

_SNP_COLS = ['CHR', 'SNP', 'POS', 'A1', 'A2']


def save_ld_store(path, chrom_blocks, snp_tables=None, quantize=True):
    """Write per-chromosome LD blocks (+ variant tables) to ``path``."""
    os.makedirs(path, exist_ok=True)
    meta = {'quantized': bool(quantize), 'chromosomes': []}
    for c, blocks in chrom_blocks.items():
        arrays = {}
        for i, blk in enumerate(blocks):
            if quantize:
                arrays[f'block_{i:05d}'] = np.clip(
                    np.rint(np.asarray(blk) * 127.0), -127, 127).astype(np.int8)
            else:
                arrays[f'block_{i:05d}'] = np.asarray(blk, dtype=np.float32)
        np.savez_compressed(osp.join(path, f'chr_{c}.npz'), **arrays)
        if snp_tables is not None and c in snp_tables:
            snp_tables[c].to_csv(osp.join(path, f'chr_{c}.snps.csv'), index=False)
        meta['chromosomes'].append(str(c))
    with open(osp.join(path, 'metadata.json'), 'w') as f:
        json.dump(meta, f)
    return path


def _parse_chrom(name):
    c = name.replace('chr_', '').replace('.npz', '')
    try:
        return int(c)
    except ValueError:
        return c


def load_ld_store(path, chromosomes=None):
    """Load a native LD store.

    :returns: (chrom_blocks {c: [float64 blocks]}, snp_tables {c: DataFrame} or None)
    """
    files = [f for f in os.listdir(path) if f.startswith('chr_') and f.endswith('.npz')]
    assert files, f"No LD store files found under {path}"

    chrom_blocks, snp_tables = {}, {}
    for f in sorted(files):
        c = _parse_chrom(f)
        if chromosomes is not None and c not in chromosomes:
            continue
        npz = np.load(osp.join(path, f))
        blocks = []
        for key in sorted(npz.files):
            blk = npz[key]
            if blk.dtype == np.int8:
                blk = blk.astype(np.float64) / 127.0
            blocks.append(np.asarray(blk, dtype=np.float64))
        chrom_blocks[c] = blocks
        snp_path = osp.join(path, f.replace('.npz', '.snps.csv'))
        if osp.exists(snp_path):
            snp_tables[c] = pd.read_csv(snp_path)

    return chrom_blocks, (snp_tables or None)


def load_magenpy_zarr(path):
    """Ingest a magenpy-format Zarr LD store (banded, int8-quantized).

    Layout (per magenpy LDMatrix): a Zarr group with ``matrix/data``,
    ``matrix/indptr`` arrays and a variant metadata group. Returns
    (banded {c: (data, indptr, left_bound)}, snp_tables).

    Requires the optional ``zarr`` package.
    """
    try:
        import zarr  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "Reading magenpy Zarr LD stores requires the `zarr` package, which "
            "is not installed in this environment. Convert the store to the "
            "native format (see tools/convert_ld_store.py) on a machine with "
            "zarr, or install zarr.") from e

    g = zarr.open(path, mode='r')
    data = np.asarray(g['matrix/data'])
    indptr = np.asarray(g['matrix/indptr'])
    attrs = dict(g.attrs)
    chrom = attrs.get('Chromosome', 0)

    meta = {}
    for key in ('SNP', 'A1', 'A2', 'BP', 'LD boundaries'):
        if f'metadata/{key.lower().replace(" ", "_")}' in g:
            meta[key] = np.asarray(g[f'metadata/{key.lower().replace(" ", "_")}'])

    if 'LD boundaries' in meta:
        left_bound = meta['LD boundaries'][0]
    else:
        # symmetric banded store: infer left bounds from row widths
        widths = np.diff(indptr)
        left_bound = np.arange(len(widths)) - (widths - 1) // 2
        left_bound = np.maximum(left_bound, 0)

    snp_tables = None
    if 'SNP' in meta:
        snp_tables = {chrom: pd.DataFrame({
            'CHR': chrom,
            'SNP': meta['SNP'].astype(str),
            'POS': meta.get('BP', np.arange(len(meta['SNP']))),
            'A1': meta.get('A1', np.repeat('A', len(meta['SNP']))).astype(str),
            'A2': meta.get('A2', np.repeat('G', len(meta['SNP']))).astype(str),
        })}

    return {chrom: (data, indptr, left_bound)}, snp_tables
