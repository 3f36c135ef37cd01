"""Multi-chip sharding of the blocked CAVI problem.

The reference's "distributed" axes are joblib processes over chromosomes and
shared-memory processes over grid points (SURVEY.md §2.4). On TPU both collapse
into array sharding over a device mesh:

- axis ``blocks``: the NB (LD-block) axis of every array — chromosomes are just
  block ranges, so this subsumes the per-chromosome fan-out. Blocks are
  independent in the e-step (block-diagonal LD) or couple only through the
  banded q-refresh, which XLA lowers to neighbor collective-permutes.
- axis ``grid``: the model axis S (grid points), the analog of the reference's
  process-parallel grid search.

Because the e-step sweep is already expressed as batched ops over (S, NB, B)
arrays inside one ``jit``, GSPMD partitions it automatically once the inputs
carry NamedShardings; the M-step/ELBO reductions become cross-device psums
inserted by XLA over ICI. No communication code is needed here — only
placement.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.block_ld import BlockLD
from ..ops.cavi_jax import CaviState


def make_mesh(n_blocks_axis=None, n_grid_axis=1, devices=None):
    """Create a ('blocks', 'grid') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_blocks_axis is None:
        n_blocks_axis = n // n_grid_axis
    assert n_blocks_axis * n_grid_axis == n, \
        f"mesh {n_blocks_axis}x{n_grid_axis} != {n} devices"
    dev_array = np.asarray(devices).reshape(n_blocks_axis, n_grid_axis)
    return Mesh(dev_array, ('blocks', 'grid'))


def pad_blocks(ld: BlockLD, multiple: int) -> BlockLD:
    """Pad the NB axis with empty blocks to a multiple (for even sharding)."""
    nb = ld.nb
    target = ((nb + multiple - 1) // multiple) * multiple
    if target == nb:
        return ld
    pad = target - nb
    diag = jnp.concatenate(
        [ld.diag, jnp.zeros((pad,) + ld.diag.shape[1:], ld.diag.dtype)], axis=0)
    mask = jnp.concatenate(
        [ld.mask, jnp.zeros((pad, ld.block_size), ld.mask.dtype)], axis=0)
    # coupling-tile indices remain valid (padding appends blocks at the end):
    return BlockLD(diag=diag, off_data=ld.off_data, off_src=ld.off_src,
                   off_dst=ld.off_dst, mask=mask, scale=ld.scale)


def _pad_axis(x, axis, target):
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def shard_problem(mesh: Mesh, ld: BlockLD, state: CaviState,
                  std_beta, n_per_snp):
    """Place the problem arrays on the mesh with block/grid shardings.

    Pads NB (and S) to multiples of the respective mesh axis sizes; padded
    blocks carry mask=0 so they contribute nothing to updates or reductions.

    :returns: (ld, state, std_beta, n_per_snp) device-placed.
    """
    nb_mult = mesh.shape['blocks']
    s_mult = mesh.shape['grid']

    ld = pad_blocks(ld, nb_mult)
    target_nb = ld.nb
    S = state.logits.shape[0]
    target_s = ((S + s_mult - 1) // s_mult) * s_mult

    state = CaviState(*(_pad_axis(_pad_axis(x, 1, target_nb), 0, target_s)
                        for x in state))
    std_beta = _pad_axis(std_beta, 0, target_nb)
    n_per_snp = _pad_axis(n_per_snp, 0, target_nb)

    sh = lambda spec: NamedSharding(mesh, spec)
    ld = BlockLD(
        diag=jax.device_put(ld.diag, sh(P('blocks', None, None))),
        # coupling tiles are few; replicate them (and their indices):
        off_data=jax.device_put(ld.off_data, sh(P(None, None, None))),
        off_src=jax.device_put(ld.off_src, sh(P(None))),
        off_dst=jax.device_put(ld.off_dst, sh(P(None))),
        mask=jax.device_put(ld.mask, sh(P('blocks', None))),
        scale=ld.scale)
    state = CaviState(*(jax.device_put(x, sh(P('grid', 'blocks', None)))
                        for x in state))
    std_beta = jax.device_put(std_beta, sh(P('blocks', None)))
    n_per_snp = jax.device_put(n_per_snp, sh(P('blocks', None)))

    return ld, state, std_beta, n_per_snp
