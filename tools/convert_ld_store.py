#!/usr/bin/env python3
"""Convert external LD stores into the viprs_tpu native block format.

Supports:
- magenpy Zarr-backed banded stores (read with the built-in dependency-free
  Zarr v2 reader) — the format of the published UKB LD panels consumed by the
  reference;
- plain banded .npz files with arrays (data, indptr, left_bound).

The banded matrix is cut into dense block-diagonal pieces at zero-coupling
boundaries when they exist; otherwise it is kept banded and packed as
block-banded tiles at model-load time.

Usage:
  python tools/convert_ld_store.py <input_store> <output_dir> [--chrom C]
      [--quantize/--no-quantize]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np  # noqa: E402


def banded_to_blocks(data, indptr, left_bound):
    """Cut a banded symmetric matrix into exact diagonal blocks at points
    where no stored entry crosses the boundary. Returns list of dense blocks,
    or None if the band never pinches off (caller keeps it banded)."""
    from viprs_tpu.data.ld_store import banded_to_blocks as _b2b
    try:
        return _b2b(data, indptr, left_bound)
    except ValueError:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('input')
    ap.add_argument('output')
    ap.add_argument('--chrom', default=None)
    ap.add_argument('--quantize', action='store_true', default=True)
    ap.add_argument('--no-quantize', dest='quantize', action='store_false')
    args = ap.parse_args()

    from viprs_tpu.data import ld_store

    if args.input.endswith('.npz'):
        npz = np.load(args.input)
        banded = {args.chrom or 0: (npz['data'], npz['indptr'],
                                    npz['left_bound'])}
        snp_tables = None
    else:
        banded, snp_tables = ld_store.load_magenpy_zarr(args.input)

    chrom_blocks = {}
    for c, (data, indptr, left) in banded.items():
        blocks = banded_to_blocks(data, indptr, left)
        if blocks is None:
            print(f"chromosome {c}: band does not pinch off; storing as one "
                  f"banded chromosome (model will pack block-banded).")
            np.savez_compressed(osp.join(args.output, f'banded_chr_{c}.npz'),
                                data=data, indptr=indptr, left_bound=left)
            continue
        chrom_blocks[c] = blocks
        print(f"chromosome {c}: {len(blocks)} blocks, "
              f"{sum(b.shape[0] for b in blocks)} variants")

    if chrom_blocks:
        ld_store.save_ld_store(args.output, chrom_blocks, snp_tables,
                               quantize=args.quantize)
    print(f"wrote {args.output}")


if __name__ == '__main__':
    main()
