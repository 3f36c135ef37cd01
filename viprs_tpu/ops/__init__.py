from .block_ld import BlockLD, BlockLayout, pack_dense_blocks, pack_banded  # noqa: F401
from .cavi_jax import cavi_sweep, compute_q, refresh_q  # noqa: F401
