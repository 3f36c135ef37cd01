"""Test helper: write plink BED/BIM/FAM filesets from dosage matrices."""

import numpy as np


def write_plink_bed(prefix, dosages, bim_table, fam_table):
    """
    :param dosages: (n_samples, m_variants) 0/1/2 dosages (NaN = missing).
    :param bim_table: DataFrame with CHR SNP CM POS A1 A2.
    :param fam_table: DataFrame with FID IID father mother sex PHENO.
    """
    n, m = dosages.shape
    assert len(bim_table) == m and len(fam_table) == n

    bim_table.to_csv(prefix + '.bim', sep="\t", header=False, index=False)
    fam_table.to_csv(prefix + '.fam', sep=" ", header=False, index=False)

    # dosage -> 2-bit code: 2 -> 00, 1 -> 10, 0 -> 11, NaN -> 01
    code = np.full(dosages.shape, 0b11, dtype=np.uint8)
    code[dosages == 2] = 0b00
    code[dosages == 1] = 0b10
    code[np.isnan(dosages)] = 0b01

    stride = (n + 3) // 4
    out = np.zeros((m, stride), dtype=np.uint8)
    for s in range(n):
        byte_idx, within = divmod(s, 4)
        out[:, byte_idx] |= code[s, :] << (2 * within)

    with open(prefix + '.bed', 'wb') as f:
        f.write(b'\x6c\x1b\x01')
        out.tofile(f)
    return prefix
