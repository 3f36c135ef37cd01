"""Pallas TPU kernel for the blocked CAVI sweep.

Fuses one e-step sweep into a single kernel: the grid iterates over LD blocks,
Pallas' pipeline machinery streams each (B, B) int8 diagonal tile HBM -> VMEM
(double-buffered) while the previous block computes; all per-block state
(q, eta, logits, mu — (S, B) f32) lives in VMEM for the whole block; the
tile-Gauss-Seidel loop runs MXU matmuls on (S, T) x (T, B) with in-register
int8 dequantization.

Math is identical to the XLA path (ops/cavi_jax.py:_block_tile_loop) —
including the gamma-weighted under-relaxation and tile-local inner iterations —
and is validated against it in tests/test_pallas.py.

Cross-tile coupling blocks (ld.off_data) are applied outside the kernel by the
caller (ops/cavi_jax.refresh_q), exactly as in the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_ld import BlockLD
from .cavi_jax import CaviState, Hyper, refresh_q, ETA_DIFF_EPS

F32 = jnp.float32


def _eye(n):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(F32)


def _row_matmul(d, R):
    """(S, T) @ (T, N) -> (S, N) on the MXU.

    (A VPU broadcast-multiply + sublane-reduction variant for S == 1 was
    measured 2x SLOWER than the MXU matvec at genome scale on v5e — Mosaic's
    reduction over 128 sublane rows of (T, B) loses to the systolic array even
    at M=1 — so the MXU path is used unconditionally.)
    """
    return jnp.dot(d, R, preferred_element_type=F32)


def _sweep_kernel(beta_ref, n_ref, mask_ref, hyper_ref,
                  diag_ref, logits_ref, mu_ref, eta_ref, q_ref,
                  logits_out, mu_out, eta_out, q_out,
                  *, tile, n_tiles, scale, relax, inner_steps, w_once=False):
    """One LD block. diag_ref: (1, B, B) storage dtype; state refs: (1, S, B);
    row refs: (1, 1, B); hyper_ref: (8, S) f32 rows
    [sigma_eps, tau_beta, pi, active, lambda_min]."""
    sig_e = hyper_ref[0, :][:, None]          # (S, 1)
    tau_b = hyper_ref[1, :][:, None]
    pi_ = hyper_ref[2, :][:, None]
    act = hyper_ref[3, :][:, None]
    lam = hyper_ref[4, :][:, None]
    on = (act > 0.0).astype(F32)
    base_logit = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b)

    # start from the incoming state; the tile loop overwrites slices in place.
    logits_out[0] = logits_ref[0]
    mu_out[0] = mu_ref[0]
    eta_out[0] = eta_ref[0]
    q_out[0] = q_ref[0]

    # statically unrolled tile loop (n_tiles is small; static slices lower
    # cleanly in Mosaic and let the scheduler overlap tiles):
    for t in range(n_tiles):
        idx = t * tile
        sl = pl.ds(idx, tile)
        q_t = q_out[0, :, sl]
        eta_t = eta_out[0, :, sl]
        logits_t = logits_out[0, :, sl]
        mu_t = mu_out[0, :, sl]
        n_t = n_ref[0, 0, sl][None, :]
        beta_t = beta_ref[0, 0, sl][None, :]
        mask_t = mask_ref[0, 0, sl][None, :]

        var_tau_t = n_t * (1.0 + lam) / sig_e + tau_b
        mu_mult_t = n_t / (var_tau_t * sig_e)

        D_rows = diag_ref[0, sl, :].astype(F32)            # (T, B)
        R_tt = diag_ref[0, sl, sl].astype(F32)             # (T, T)
        if scale != 1.0:
            R_tt = R_tt * F32(scale)
        R_abs = jnp.abs(R_tt)
        R_abs_diag = jnp.sum(R_abs * _eye(tile), axis=0)[None, :]

        g_cur = jax.nn.sigmoid(logits_t)
        mu_cur = mu_t
        eta_cur = eta_t
        q_cur = q_t
        w = None
        for step in range(inner_steps):
            mu_star = mu_mult_t * (beta_t - q_cur)
            u_star = base_logit - 0.5 * jnp.log(var_tau_t) \
                + 0.5 * var_tau_t * mu_star * mu_star
            g_star = jax.nn.sigmoid(u_star)
            if relax and not (w_once and step > 0):
                coupling = _row_matmul(g_star * jnp.abs(mu_mult_t), R_abs)
                coupling = coupling - R_abs_diag * g_star * jnp.abs(mu_mult_t)
                w = act / (1.0 + coupling)
            elif not relax:
                w = act
            g_cur = g_cur + w * (g_star - g_cur)
            mu_cur = mu_cur + w * (mu_star - mu_cur)
            eta_new = g_cur * mu_cur
            d_in = (eta_new - eta_cur) * mask_t * on
            q_cur = q_cur + _row_matmul(d_in, R_tt) - d_in
            eta_cur = eta_cur + d_in

        d_t = (eta_cur - eta_t) * mask_t * on
        keep = jnp.abs(d_t) >= ETA_DIFF_EPS
        d_t = jnp.where(keep, d_t, 0.0)

        u_new = jnp.log(jnp.clip(g_cur, F32(1e-30), None)) \
            - jnp.log1p(-jnp.clip(g_cur, None, F32(1.0 - 1e-7)))
        logits_out[0, :, sl] = jnp.where(keep, u_new, logits_t)
        mu_out[0, :, sl] = jnp.where(keep, mu_cur, mu_t)
        eta_out[0, :, sl] = eta_t + d_t

        q_upd = _row_matmul(d_t, D_rows)
        if scale != 1.0:
            q_upd = q_upd * F32(scale)
        q_out[0] = q_out[0] + q_upd
        q_out[0, :, sl] = q_out[0, :, sl] - d_t


def _sweep_kernel_s1(beta_ref, n_ref, mask_ref, hyper_ref,
                     diag_ref, logits_ref, mu_ref, eta_ref, q_ref,
                     logits_out, mu_out, eta_out, q_out,
                     *, tile, n_tiles, scale, relax, inner_steps, w_once=False):
    """Single-model (S == 1) sweep over a CHUNK of G LD blocks.

    At S == 1 the rank-T q-updates are matvecs: on the MXU they are
    weight-load-bound (1 activation row per (T, B) weight tile — 1/128
    utilization — measured ~11.5 ms/sweep at 1.1M variants however lowered by
    XLA). This kernel instead batches G blocks per grid step and lowers every
    matvec as a VPU broadcast-multiply + sublane reduction, exploiting the
    symmetry of R so the contraction axis always rides the sublane dimension:

        (Σ_k R_jk d_k)_j  =  sum(d[:, :, None] * R[:, k, j], axis=k)

    The int8 tiles dequantize in-register after the HBM->VMEM stream; nothing
    f32 ever round-trips to HBM (XLA materializes a converted copy of every
    (T, B) row slice, which costs more traffic than the LD itself).

    diag_ref: (G, B, B) storage dtype; state refs: (G, B) f32;
    hyper_ref: (8, 1) f32 rows [sigma_eps, tau_beta, pi, active, lambda_min].
    """
    sig_e = hyper_ref[0, 0]
    tau_b = hyper_ref[1, 0]
    pi_ = hyper_ref[2, 0]
    act = hyper_ref[3, 0]
    lam = hyper_ref[4, 0]
    on = (act > 0.0).astype(F32)
    base_logit = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b)

    logits_out[...] = logits_ref[...]
    mu_out[...] = mu_ref[...]
    eta_out[...] = eta_ref[...]
    q_out[...] = q_ref[...]

    for t in range(n_tiles):
        sl = pl.ds(t * tile, tile)
        q_t = q_out[:, sl]                       # (G, T)
        eta_t = eta_out[:, sl]
        logits_t = logits_out[:, sl]
        mu_t = mu_out[:, sl]
        n_t = n_ref[:, sl]
        beta_t = beta_ref[:, sl]
        mask_t = mask_ref[:, sl]

        var_tau_t = n_t * (1.0 + lam) / sig_e + tau_b
        mu_mult_t = n_t / (var_tau_t * sig_e)

        R_tt = diag_ref[:, sl, sl].astype(F32) * F32(scale)   # (G, T, T)
        R_abs = jnp.abs(R_tt)
        # Correlation tiles have unit diagonal exactly where a variant occupies
        # the lane (packed gaps and padding are zero) — i.e. R_jj == mask_j.
        R_abs_diag = mask_t

        g_cur = jax.nn.sigmoid(logits_t)
        mu_cur = mu_t
        eta_cur = eta_t
        q_cur = q_t
        w = None
        for step in range(inner_steps):
            mu_star = mu_mult_t * (beta_t - q_cur)
            u_star = base_logit - 0.5 * jnp.log(var_tau_t) \
                + 0.5 * var_tau_t * mu_star * mu_star
            g_star = jax.nn.sigmoid(u_star)
            if relax and not (w_once and step > 0):
                c = g_star * jnp.abs(mu_mult_t)              # (G, T)
                coupling = jnp.sum(c[:, :, None] * R_abs, axis=1)
                coupling = coupling - R_abs_diag * c
                w = act / (1.0 + coupling)
            elif not relax:
                w = act
            g_cur = g_cur + w * (g_star - g_cur)
            mu_cur = mu_cur + w * (mu_star - mu_cur)
            eta_new = g_cur * mu_cur
            d_in = (eta_new - eta_cur) * mask_t * on
            q_cur = q_cur + jnp.sum(d_in[:, :, None] * R_tt, axis=1) - d_in
            eta_cur = eta_cur + d_in

        d_t = (eta_cur - eta_t) * mask_t * on
        keep = jnp.abs(d_t) >= ETA_DIFF_EPS
        d_t = jnp.where(keep, d_t, 0.0)

        u_new = jnp.log(jnp.clip(g_cur, F32(1e-30), None)) \
            - jnp.log1p(-jnp.clip(g_cur, None, F32(1.0 - 1e-7)))
        logits_out[:, sl] = jnp.where(keep, u_new, logits_t)
        mu_out[:, sl] = jnp.where(keep, mu_cur, mu_t)
        eta_out[:, sl] = eta_t + d_t

        # Rank-T q update over the whole chunk of blocks: rows k of each tile
        # against the full block width (R symmetric: R[k, j] == R[j, k]).
        R_rows = diag_ref[:, sl, :].astype(F32)              # (G, T, B)
        q_upd = jnp.sum(d_t[:, :, None] * R_rows, axis=1) * F32(scale)
        q_out[...] = q_out[...] + q_upd
        # the stored unit diagonal also updated q at the focal variants:
        q_out[:, sl] = q_out[:, sl] - d_t


@functools.partial(jax.jit, static_argnames=('tile', 'relax', 'inner_steps',
                                             'chunk'))
def cavi_sweep_pallas_s1(ld: BlockLD, state: CaviState, std_beta, n_per_snp,
                         hyper: Hyper, active, tile: int = 128,
                         relax: bool = True, inner_steps: int = 8,
                         chunk: int = 8):
    """Single-model Pallas sweep (see _sweep_kernel_s1); same contract as
    cavi_jax.cavi_sweep restricted to S == 1."""
    B = ld.block_size
    NB = ld.nb
    assert state.logits.shape[0] == 1
    assert B % tile == 0
    n_tiles = B // tile
    state = CaviState(*(x.astype(F32) for x in state))
    eta0 = state.eta

    active = active.astype(F32)
    hyper_mat = jnp.stack([hyper.sigma_eps.astype(F32),
                           hyper.tau_beta.astype(F32),
                           hyper.pi.astype(F32),
                           active,
                           hyper.lambda_min.astype(F32),
                           jnp.zeros_like(active), jnp.zeros_like(active),
                           jnp.zeros_like(active)])        # (8, 1)

    kernel = functools.partial(_sweep_kernel_s1, tile=tile, n_tiles=n_tiles,
                               scale=ld.scale, relax=relax,
                               inner_steps=inner_steps)

    def call(G, diag, sb, nf, mask, lo, mu_, eta_, q_):
        """One pallas_call over a range whose block count is divisible by G.

        (Mosaic requires the state blocks' sublane dim G to be a multiple of 8
        or equal to the array dim, and miscompiles ragged final chunks with
        input/output aliasing — so the caller splits NB into a G-divisible
        main range plus one remainder call with G == its whole range.)
        """
        nb_r = diag.shape[0]
        state_spec = pl.BlockSpec((G, B), lambda c: (c, c * 0),
                                  memory_space=pltpu.VMEM)
        # The double-buffered (G, B, B) diag stream alone exceeds the default
        # 16 MB scoped-VMEM budget at G=8, B=1024 (v5e has 128 MiB physical
        # VMEM; the default limit is just conservative). Size the limit to the
        # streamed tiles plus headroom for the f32 state/intermediates.
        diag_stream = 2 * G * B * B * diag.dtype.itemsize
        vmem_limit = min(110 * 1024 * 1024, diag_stream + 32 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            grid=(nb_r // G,),
            in_specs=[
                state_spec, state_spec, state_spec,
                pl.BlockSpec((8, 1), lambda c: (c * 0, c * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, B, B), lambda c: (c, c * 0, c * 0),
                             memory_space=pltpu.VMEM),
                state_spec, state_spec, state_spec, state_spec,
            ],
            out_specs=[state_spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((nb_r, B), F32) for _ in range(4)],
            input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        )(sb, nf, mask, hyper_mat, diag, lo, mu_, eta_, q_)

    n_main = (NB // chunk) * chunk
    if n_main == 0 or n_main == NB:
        G = chunk if n_main else NB
        logits, mu, eta, q = call(G, ld.diag, std_beta, n_per_snp, ld.mask,
                                  state.logits[0], state.mu[0],
                                  state.eta[0], state.q[0])
    else:
        parts = []
        for lo_b, hi_b, G in ((0, n_main, chunk), (n_main, NB, NB - n_main)):
            parts.append(call(
                G, ld.diag[lo_b:hi_b], std_beta[lo_b:hi_b],
                n_per_snp[lo_b:hi_b], ld.mask[lo_b:hi_b],
                state.logits[0, lo_b:hi_b], state.mu[0, lo_b:hi_b],
                state.eta[0, lo_b:hi_b], state.q[0, lo_b:hi_b]))
        logits, mu, eta, q = (jnp.concatenate([a, b], axis=0)
                              for a, b in zip(*parts))

    state_new = CaviState(logits=logits[None], mu=mu[None],
                          eta=eta[None], q=q[None])
    eta_diff = state_new.eta - eta0
    q = refresh_q(ld, state_new.q, eta_diff)
    return state_new._replace(q=q), eta_diff


def _skip_kernel(idx_ref, n_ref, oidx_ref, no_ref, osrc_ref, odst_ref,
                 hyper_ref, diag_hbm, off_hbm, consts_hbm, stack_in,
                 stack_out, cbuf, sbuf, dbuf, obuf,
                 sem_c, sem_s, sem_d, sem_o, sem_u, sem_r, sem_w,
                 *, G, B, tile, n_tiles, scale, relax, inner_steps,
                 w_once=False):
    """Active-block-compacted single-model sweep (the TPU analog of the
    reference's per-variant skip threshold, e_step.hpp:382,410-413, lifted to
    LD-block granularity).

    The caller passes the compacted list of active block indices (``idx_ref``,
    SMEM) and their count (``n_ref``); the kernel gathers chunks of G active
    blocks with manual double-buffered DMAs — (B, B) LD tile + one contiguous
    (8, B) state row + one (4, B) consts row per block — computes the same
    tile-Gauss-Seidel update as ``_sweep_kernel_s1``, writes the block's total
    eta change into the stack's diff plane, and scatters the updated state
    back in place. ``stack_out`` is aliased to ``stack_in`` so the untouched
    (quiescent) blocks persist without any copy or HBM traffic.

    A second pass applies the cross-block coupling tiles (the in-kernel
    replacement of cavi_jax.refresh_q, whose XLA einsum streams and
    dequantizes EVERY off tile each sweep): only the compacted active tiles
    (``oidx_ref`` — those whose src or dst block moved) are DMA'd; per tile,
    q[src] += scale * U @ diff[dst] and q[dst] += scale * U^T @ diff[src] as
    (1, B) x (B, B) MXU matvecs, read-modify-writing the two stack rows.

    Why gridless + fori_loop: this toolchain's Mosaic cannot legalize manual
    DMA inside a ``grid=`` pallas_call (nor scalar-prefetch index maps); a
    single-invocation kernel with an internal loop compiles and runs.

    idx/oidx/osrc/odst: i32 SMEM; n_ref/no_ref: (1,) i32 SMEM; hyper_ref:
    (8,) f32 SMEM rows [sigma_eps, tau_beta, pi, active, lambda_min];
    diag_hbm: (NB, B, B) storage dtype ANY; off_hbm: (max(n_off,1), B, B)
    storage dtype ANY; consts_hbm: (NB, 4, B) f32 ANY rows
    [std_beta, n_per_snp, mask, 0]; stack_in/out: (NB, 8, B) f32 ANY rows
    [logits, mu, eta, q, eta_diff, 0, 0, 0].
    """
    I32 = jnp.int32
    n = n_ref[0]
    nc = lax.div(n + I32(G - 1), I32(G))
    sig_e = hyper_ref[0]
    tau_b = hyper_ref[1]
    pi_ = hyper_ref[2]
    act = hyper_ref[3]
    lam = hyper_ref[4]
    on = jnp.where(act > 0.0, F32(1.0), F32(0.0))
    base_logit = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b)

    def start_chunk(c, slot):
        base = c * I32(G)
        cnt = n - base
        for g in range(G):
            @pl.when(I32(g) < cnt)
            def _():
                b = idx_ref[base + I32(g)]
                pltpu.make_async_copy(diag_hbm.at[b], dbuf.at[slot, I32(g)],
                                      sem_d.at[slot, I32(g)]).start()
                pltpu.make_async_copy(consts_hbm.at[b], cbuf.at[slot, I32(g)],
                                      sem_c.at[slot, I32(g)]).start()
                pltpu.make_async_copy(stack_out.at[b], sbuf.at[slot, I32(g)],
                                      sem_s.at[slot, I32(g)]).start()

    @pl.when(n > 0)
    def _():
        start_chunk(I32(0), I32(0))

    def body(c, carry):
        slot = lax.rem(c, I32(2))

        @pl.when(c + I32(1) < nc)
        def _():
            start_chunk(c + I32(1), lax.rem(c + I32(1), I32(2)))

        base = c * I32(G)
        cnt = n - base
        for g in range(G):
            @pl.when(I32(g) < cnt)
            def _():
                b = idx_ref[base + I32(g)]
                pltpu.make_async_copy(diag_hbm.at[b], dbuf.at[slot, I32(g)],
                                      sem_d.at[slot, I32(g)]).wait()
                pltpu.make_async_copy(consts_hbm.at[b], cbuf.at[slot, I32(g)],
                                      sem_c.at[slot, I32(g)]).wait()
                pltpu.make_async_copy(stack_out.at[b], sbuf.at[slot, I32(g)],
                                      sem_s.at[slot, I32(g)]).wait()

        cb = cbuf.at[slot]                          # (G, 4, B)
        sb = sbuf.at[slot]                          # (G, 8, B) — updated in place
        # Lanes of slots past the end of the compacted list hold stale data;
        # mask them so their (garbage) updates are zeroed and never written.
        valid = (jax.lax.broadcasted_iota(I32, (G, 1), 0) < cnt).astype(F32)
        eta0_c = sb[:, 2, :]                        # (G, B) pre-sweep eta

        for t in range(n_tiles):
            sl = pl.ds(t * tile, tile)
            q_t = sb[:, 3, sl]
            eta_t = sb[:, 2, sl]
            logits_t = sb[:, 0, sl]
            mu_t = sb[:, 1, sl]
            nn_t = cb[:, 1, sl]
            bb_t = cb[:, 0, sl]
            mm_t = cb[:, 2, sl] * valid

            var_tau_t = nn_t * (1.0 + lam) / sig_e + tau_b
            mu_mult_t = nn_t / (var_tau_t * sig_e)

            R_tt = dbuf[slot, :, sl, sl].astype(F32) * F32(scale)  # (G, T, T)
            R_abs = jnp.abs(R_tt)
            # unit diagonal exactly on occupied lanes (see _sweep_kernel_s1):
            R_abs_diag = mm_t

            g_cur = jax.nn.sigmoid(logits_t)
            mu_cur = mu_t
            eta_cur = eta_t
            q_cur = q_t
            w = None
            for step in range(inner_steps):
                mu_star = mu_mult_t * (bb_t - q_cur)
                u_star = base_logit - 0.5 * jnp.log(var_tau_t) \
                    + 0.5 * var_tau_t * mu_star * mu_star
                g_star = jax.nn.sigmoid(u_star)
                if relax and not (w_once and step > 0):
                    cpl = g_star * jnp.abs(mu_mult_t)            # (G, T)
                    coupling = jnp.sum(cpl[:, :, None] * R_abs, axis=1)
                    coupling = coupling - R_abs_diag * cpl
                    w = act / (1.0 + coupling)
                elif not relax:
                    w = act
                g_cur = g_cur + w * (g_star - g_cur)
                mu_cur = mu_cur + w * (mu_star - mu_cur)
                eta_new = g_cur * mu_cur
                d_in = (eta_new - eta_cur) * mm_t * on
                q_cur = q_cur + jnp.sum(d_in[:, :, None] * R_tt, axis=1) - d_in
                eta_cur = eta_cur + d_in

            d_t = (eta_cur - eta_t) * mm_t * on
            keep = jnp.abs(d_t) >= ETA_DIFF_EPS
            d_t = jnp.where(keep, d_t, 0.0)

            u_new = jnp.log(jnp.clip(g_cur, F32(1e-30), None)) \
                - jnp.log1p(-jnp.clip(g_cur, None, F32(1.0 - 1e-7)))
            sb[:, 0, sl] = jnp.where(keep, u_new, logits_t)
            sb[:, 1, sl] = jnp.where(keep, mu_cur, mu_t)
            sb[:, 2, sl] = eta_t + d_t

            R_rows = dbuf[slot, :, sl, :].astype(F32)            # (G, T, B)
            q_upd = jnp.sum(d_t[:, :, None] * R_rows, axis=1) * F32(scale)
            sb[:, 3, :] = sb[:, 3, :] + q_upd
            sb[:, 3, sl] = sb[:, 3, sl] - d_t

        sb[:, 4, :] = sb[:, 2, :] - eta0_c          # the block's total eta diff

        for g in range(G):
            @pl.when(I32(g) < cnt)
            def _():
                b = idx_ref[base + I32(g)]
                pltpu.make_async_copy(sbuf.at[slot, I32(g)], stack_out.at[b],
                                      sem_o.at[slot, I32(g)]).start()
        for g in range(G):
            @pl.when(I32(g) < cnt)
            def _():
                b = idx_ref[base + I32(g)]
                pltpu.make_async_copy(sbuf.at[slot, I32(g)], stack_out.at[b],
                                      sem_o.at[slot, I32(g)]).wait()
        return 0

    lax.fori_loop(I32(0), nc, body, 0)

    # ---- pass 2: cross-block coupling tiles (refresh_q, in kernel) ----
    # sbuf slot 0 is reused as the row scratch (pass 1 is complete).
    _off_pass(oidx_ref, no_ref, osrc_ref, odst_ref, off_hbm, stack_out,
              obuf, sbuf.at[I32(0), I32(0)], sbuf.at[I32(0), I32(1)],
              sem_u, sem_r, sem_w, q_row=3, diff_row=4, scale=scale)


def _off_pass(oidx_ref, no_ref, osrc_ref, odst_ref, off_hbm, stack_out,
              obuf, rbuf0, rbuf1, sem_u, sem_r, sem_w, *, q_row, diff_row,
              scale, rows=1):
    """Apply the compacted active coupling tiles to the q plane of the stack:
    q[src] += scale * U @ diff[dst]; q[dst] += scale * U^T @ diff[src]
    (the in-kernel replacement of cavi_jax.refresh_q). Sequential RMW over the
    tile list; each iteration gathers the two (rows, B) stack rows, applies
    both (1, B) x (B, B) MXU matvecs, and writes the rows back before the
    next tile (so tiles sharing a block chain correctly). U tiles are
    double-buffered. rbuf: any VMEM scratch with [0, 0] and [0, 1] slots of
    the stack-row shape."""
    I32 = jnp.int32
    n_off_act = no_ref[0]

    def start_u(k, slot):
        pltpu.make_async_copy(off_hbm.at[oidx_ref[k]], obuf.at[slot],
                              sem_u.at[slot]).start()

    @pl.when(n_off_act > 0)
    def _():
        start_u(I32(0), I32(0))

    def off_body(k, carry):
        slot = lax.rem(k, I32(2))

        @pl.when(k + I32(1) < n_off_act)
        def _():
            start_u(k + I32(1), lax.rem(k + I32(1), I32(2)))

        o = oidx_ref[k]
        bs = osrc_ref[o]
        bd = odst_ref[o]
        cps = pltpu.make_async_copy(stack_out.at[bs], rbuf0,
                                    sem_r.at[I32(0)])
        cpd = pltpu.make_async_copy(stack_out.at[bd], rbuf1,
                                    sem_r.at[I32(1)])
        cps.start()
        cpd.start()
        pltpu.make_async_copy(off_hbm.at[oidx_ref[k]], obuf.at[slot],
                              sem_u.at[slot]).wait()
        cps.wait()
        cpd.wait()

        U = obuf[slot].astype(F32)                            # (B, B)
        v_s = rbuf0[pl.ds(diff_row, rows), :]                 # (rows, B)
        v_d = rbuf1[pl.ds(diff_row, rows), :]
        # (contract v_d lanes with U dim 1 / v_s lanes with U dim 0):
        upd_s = lax.dot_general(v_d, U, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32,
                                precision=lax.Precision.HIGHEST) * F32(scale)
        upd_d = lax.dot_general(v_s, U, (((1,), (0,)), ((), ())),
                                preferred_element_type=F32,
                                precision=lax.Precision.HIGHEST) * F32(scale)
        qs = pl.ds(q_row, rows)
        rbuf0[qs, :] = rbuf0[qs, :] + upd_s
        rbuf1[qs, :] = rbuf1[qs, :] + upd_d

        ws = pltpu.make_async_copy(rbuf0, stack_out.at[bs],
                                   sem_w.at[I32(0)])
        wd = pltpu.make_async_copy(rbuf1, stack_out.at[bd],
                                   sem_w.at[I32(1)])
        ws.start()
        wd.start()
        ws.wait()
        wd.wait()
        return 0

    lax.fori_loop(I32(0), n_off_act, off_body, 0)


def block_proposal_mask(ld: BlockLD, state: CaviState, std_beta, n_per_snp,
                        hyper: Hyper, eps=ETA_DIFF_EPS):
    """Per-block activity check for the skipping sweep — no LD traffic.

    Computes the unrelaxed first-step CAVI proposal for every variant from the
    cached residual ``q`` and the *current* hyperparameters (so hyperparameter
    drift re-activates blocks automatically) and flags a block active iff any
    of its lanes proposes a step >= eps. A block with all proposals < eps is a
    fixed point of its own (keep-gated) sweep: skipping it reproduces the
    kernel's output exactly. Mirrors the reference's per-variant skip
    threshold (e_step.hpp:382,404-413) at block granularity.

    Returns (S, NB) bool.
    """
    sig_e = hyper.sigma_eps[:, None, None].astype(F32)
    tau_b = hyper.tau_beta[:, None, None].astype(F32)
    pi_ = hyper.pi[:, None, None].astype(F32)
    lam = hyper.lambda_min[:, None, None].astype(F32)
    n = n_per_snp[None]
    var_tau = n * (1.0 + lam) / sig_e + tau_b
    mu_star = (n / (var_tau * sig_e)) * (std_beta[None] - state.q)
    u_star = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b) \
        - 0.5 * jnp.log(var_tau) + 0.5 * var_tau * mu_star * mu_star
    eta_star = jax.nn.sigmoid(u_star) * mu_star
    prop = jnp.abs(eta_star - state.eta) * ld.mask[None]
    return jnp.max(prop, axis=2) >= eps


@functools.partial(jax.jit, static_argnames=('tile', 'relax', 'inner_steps',
                                             'chunk'))
def cavi_sweep_pallas_s1_skip(ld: BlockLD, state: CaviState, std_beta,
                              n_per_snp, hyper: Hyper, active, blk_mask,
                              tile: int = 128, relax: bool = True,
                              inner_steps: int = 8, chunk: int = 8):
    """Single-model sweep over the active blocks only.

    Same contract as cavi_sweep_pallas_s1 plus ``blk_mask`` ((NB,) bool, e.g.
    from block_proposal_mask): only blocks flagged active are streamed and
    updated; quiescent blocks pass through bit-exactly with no HBM traffic.
    Cross-block coupling tiles are applied in-kernel for the tiles whose src
    or dst block is active (so refresh_q is NOT needed afterwards).
    """
    B = ld.block_size
    NB = ld.nb
    G = chunk
    assert state.logits.shape[0] == 1
    assert B % tile == 0
    n_tiles = B // tile
    state = CaviState(*(x.astype(F32) for x in state))

    blk_mask = blk_mask.astype(bool)
    # Compaction via stable argsort (active indices first, ascending) — XLA's
    # nonzero lowers to a cumsum/reduce-window that blows the 16 MB scoped
    # VMEM limit at genome scale on this toolchain.
    idx = jnp.argsort(~blk_mask, stable=True).astype(jnp.int32)
    n_active = jnp.sum(blk_mask).astype(jnp.int32).reshape(1)
    if ld.n_off > 0:
        off_act = blk_mask[ld.off_src] | blk_mask[ld.off_dst]
        oidx = jnp.argsort(~off_act, stable=True).astype(jnp.int32)
        n_off_act = jnp.sum(off_act).astype(jnp.int32).reshape(1)
        off_hbm = ld.off_data
        osrc = ld.off_src.astype(jnp.int32)
        odst = ld.off_dst.astype(jnp.int32)
    else:
        oidx = jnp.zeros(1, jnp.int32)
        n_off_act = jnp.zeros(1, jnp.int32)
        off_hbm = jnp.zeros((1, B, B), ld.diag.dtype)
        osrc = jnp.zeros(1, jnp.int32)
        odst = jnp.zeros(1, jnp.int32)

    active = active.astype(F32)
    hyper_vec = jnp.stack([hyper.sigma_eps.astype(F32)[0],
                           hyper.tau_beta.astype(F32)[0],
                           hyper.pi.astype(F32)[0],
                           active[0],
                           hyper.lambda_min.astype(F32)[0],
                           F32(0.0), F32(0.0), F32(0.0)])          # (8,)

    consts = jnp.stack([std_beta.astype(F32), n_per_snp.astype(F32),
                        ld.mask.astype(F32),
                        jnp.zeros_like(ld.mask, F32)], axis=1)     # (NB, 4, B)
    # (4 rows, not 3: the f32 VMEM sublane tiling is 4, and Mosaic requires
    # DMA slice shapes aligned to it.)
    zero = jnp.zeros_like(state.eta[0])
    stack = jnp.stack([state.logits[0], state.mu[0],
                       state.eta[0], state.q[0],
                       zero, zero, zero, zero], axis=1)            # (NB, 8, B)

    kernel = functools.partial(_skip_kernel, G=G, B=B, tile=tile,
                               n_tiles=n_tiles, scale=ld.scale, relax=relax,
                               inner_steps=inner_steps)

    dma_bytes = 2 * G * (B * B * ld.diag.dtype.itemsize + 12 * B * 4) \
        + 2 * B * B * ld.diag.dtype.itemsize
    vmem_limit = min(110 * 1024 * 1024, dma_bytes + 48 * 1024 * 1024)
    new_stack = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # idx
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_active
            pl.BlockSpec(memory_space=pltpu.SMEM),      # oidx
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_off_act
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off_src
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off_dst
            pl.BlockSpec(memory_space=pltpu.SMEM),      # hyper
            pl.BlockSpec(memory_space=pl.ANY),          # diag
            pl.BlockSpec(memory_space=pl.ANY),          # off tiles
            pl.BlockSpec(memory_space=pl.ANY),          # consts (NB, 4, B)
            pl.BlockSpec(memory_space=pl.ANY),          # stack (NB, 8, B)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, 8, B), F32),
        input_output_aliases={10: 0},
        scratch_shapes=[
            pltpu.VMEM((2, G, 4, B), F32),              # cbuf
            pltpu.VMEM((2, G, 8, B), F32),              # sbuf
            pltpu.VMEM((2, G, B, B), ld.diag.dtype),    # dbuf
            pltpu.VMEM((2, B, B), ld.diag.dtype),       # obuf
            pltpu.SemaphoreType.DMA((2, G)),            # sem_c
            pltpu.SemaphoreType.DMA((2, G)),            # sem_s
            pltpu.SemaphoreType.DMA((2, G)),            # sem_d
            pltpu.SemaphoreType.DMA((2, G)),            # sem_o
            pltpu.SemaphoreType.DMA((2,)),              # sem_u
            pltpu.SemaphoreType.DMA((2,)),              # sem_r
            pltpu.SemaphoreType.DMA((2,)),              # sem_w
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(idx, n_active, oidx, n_off_act, osrc, odst,
      hyper_vec, ld.diag, off_hbm, consts, stack)

    state_new = CaviState(logits=new_stack[:, 0][None],
                          mu=new_stack[:, 1][None],
                          eta=new_stack[:, 2][None],
                          q=new_stack[:, 3][None])
    eta_diff = new_stack[:, 4][None]
    return state_new, eta_diff


def _mix_sweep_kernel(beta_ref, n_ref, mask_ref, hyper_ref,
                      diag_ref, gamma_ref, mu_ref, eta_ref, q_ref,
                      gamma_out, mu_out, eta_out, q_out,
                      *, tile, n_tiles, scale, inner_steps, w_once=False):
    """Mixture-prior sweep for one LD block (the Pallas analog of
    cavi_mix._mix_block_tile_loop). diag_ref: (1, B, B) storage dtype;
    gamma/mu refs: (1, K, B); eta/q refs: (1, 1, B); hyper_ref: (8, K) rows
    [sigma_eps*, tau_beta_k, pi_k, lambda*, log_null_pi*] (* = broadcast)."""
    K = gamma_ref.shape[1]
    sig_e = hyper_ref[0, 0]
    tau_b = hyper_ref[1, :][:, None]           # (K,1)
    pi_ = hyper_ref[2, :][:, None]
    lam = hyper_ref[3, 0]
    log_null_pi = hyper_ref[4, 0]
    base_logit = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b)

    gamma_out[0] = gamma_ref[0]
    mu_out[0] = mu_ref[0]
    eta_out[0] = eta_ref[0]
    q_out[0] = q_ref[0]

    for t in range(n_tiles):
        idx = t * tile
        sl = pl.ds(idx, tile)
        q_t = q_out[0, 0, sl]
        eta_t = eta_out[0, 0, sl]
        n_t = n_ref[0, 0, sl][None, :]
        beta_t = beta_ref[0, 0, sl][None, :]
        mask_t = mask_ref[0, 0, sl]
        g_t = gamma_out[0, :, sl]              # (K,T)
        mu_t = mu_out[0, :, sl]

        var_tau_t = n_t * (1.0 + lam) / sig_e + tau_b
        mu_mult_t = n_t / (var_tau_t * sig_e)
        mu_mult_max = jnp.max(jnp.abs(mu_mult_t), axis=0)

        D_rows = diag_ref[0, sl, :].astype(F32)
        R_tt = diag_ref[0, sl, sl].astype(F32)
        if scale != 1.0:
            R_tt = R_tt * F32(scale)
        R_abs = jnp.abs(R_tt)
        R_abs_diag = jnp.sum(R_abs * _eye(tile), axis=0)

        g_cur, mu_cur, eta_cur, q_cur = g_t, mu_t, eta_t, q_t
        w = None
        for step in range(inner_steps):
            mu_star = mu_mult_t * (beta_t - q_cur[None, :])
            u = base_logit - 0.5 * jnp.log(var_tau_t) \
                + 0.5 * var_tau_t * mu_star * mu_star
            u_max = jnp.maximum(jnp.max(u, axis=0), log_null_pi)
            exp_u = jnp.exp(u - u_max[None, :])
            denom = exp_u.sum(axis=0) + jnp.exp(log_null_pi - u_max)
            g_star = exp_u / denom[None, :]

            if not (w_once and step > 0):
                pip_star = jnp.sum(g_star, axis=0)
                coupling = _row_matmul((pip_star * mu_mult_max)[None, :],
                                       R_abs)[0]
                coupling = coupling - R_abs_diag * pip_star * mu_mult_max
                w = (1.0 / (1.0 + coupling))[None, :]

            g_cur = g_cur + w * (g_star - g_cur)
            mu_cur = mu_cur + w * (mu_star - mu_cur)
            eta_new = jnp.sum(g_cur * mu_cur, axis=0)
            d_in = (eta_new - eta_cur) * mask_t
            q_cur = q_cur + _row_matmul(d_in[None, :], R_tt)[0] - d_in
            eta_cur = eta_cur + d_in

        d_t = (eta_cur - eta_t) * mask_t

        gamma_out[0, :, sl] = g_cur
        mu_out[0, :, sl] = mu_cur
        eta_out[0, 0, sl] = eta_t + d_t

        q_upd = _row_matmul(d_t[None, :], D_rows)[0]
        if scale != 1.0:
            q_upd = q_upd * F32(scale)
        q_out[0, 0] = q_out[0, 0] + q_upd
        q_out[0, 0, sl] = q_out[0, 0, sl] - d_t


@functools.partial(jax.jit, static_argnames=('tile', 'inner_steps'))
def cavi_sweep_mixture_pallas(ld: BlockLD, state, std_beta, n_per_snp,
                              hyper, tile: int = 128, inner_steps: int = 8):
    """Pallas-fused mixture sweep; same contract as
    cavi_mix.cavi_sweep_mixture (state: MixState with (K, NB, B) gamma/mu and
    (NB, B) eta/q)."""
    from .cavi_mix import MixState

    B = ld.block_size
    NB = ld.nb
    K = state.gamma.shape[0]
    assert B % tile == 0
    n_tiles = B // tile
    eta0 = state.eta

    hyper_mat = jnp.concatenate([
        jnp.broadcast_to(hyper.sigma_eps.astype(F32), (1, K)),
        hyper.tau_beta.astype(F32)[None, :],
        hyper.pi.astype(F32)[None, :],
        jnp.broadcast_to(hyper.lambda_min.astype(F32), (1, K)),
        jnp.broadcast_to(jnp.log1p(-jnp.sum(hyper.pi)).astype(F32), (1, K)),
        jnp.zeros((3, K), F32),
    ])                                          # (8, K)

    kernel = functools.partial(_mix_sweep_kernel, tile=tile, n_tiles=n_tiles,
                               scale=ld.scale, inner_steps=inner_steps)

    km_spec = pl.BlockSpec((1, K, B), lambda b: (b, b * 0, b * 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, B), lambda b: (b, b * 0, b * 0),
                            memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((NB, K, B), F32),
                  jax.ShapeDtypeStruct((NB, K, B), F32),
                  jax.ShapeDtypeStruct((NB, 1, B), F32),
                  jax.ShapeDtypeStruct((NB, 1, B), F32)]

    to_k = lambda x: jnp.transpose(x, (1, 0, 2))     # (K,NB,B) -> (NB,K,B)
    rowify = lambda x: x[:, None, :]                 # (NB,B) -> (NB,1,B)

    gamma, mu, eta, q = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((8, K), lambda b: (b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, B), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            km_spec, km_spec, row_spec, row_spec,
        ],
        out_specs=[km_spec, km_spec, row_spec, row_spec],
        out_shape=out_shapes,
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
    )(rowify(std_beta), rowify(n_per_snp), rowify(ld.mask), hyper_mat, ld.diag,
      to_k(state.gamma), to_k(state.mu), rowify(state.eta), rowify(state.q))

    gamma = jnp.transpose(gamma, (1, 0, 2))
    mu = jnp.transpose(mu, (1, 0, 2))
    eta = eta[:, 0, :]
    q = q[:, 0, :]

    eta_diff = eta - eta0
    if ld.n_off > 0:
        from .cavi_jax import _off_contrib
        q = q + _off_contrib(ld, eta_diff[None])[0]
    return MixState(gamma=gamma, mu=mu, eta=eta, q=q), eta_diff


def _mix_sweep_kernel_batch(beta_ref, n_ref, mask_ref, hyper_ref,
                            diag_ref, gamma_ref, mu_ref, eta_ref, q_ref,
                            gamma_out, mu_out, eta_out, q_out,
                            *, K, tile, n_tiles, scale, inner_steps):
    """Grid-batched mixture sweep for one LD block (the Pallas analog of
    cavi_mix._mix_block_tile_loop_batch): the S-lane axis and the K-component
    axis both live in VMEM for the whole block — one HBM stream of the LD
    tile serves every lane, and the rank-T q-update is an (S, T) @ (T, B)
    MXU matmul.

    Layout note: K is the LEADING dim, statically unrolled in Python — every
    vector op then runs on full (S, T) tiles. Putting K on the sublane axis
    ((S, K, T) arrays) looped S times over 3-of-8-sublane tiles and measured
    ~6x slower at S=20, K=3.

    diag_ref: (1, B, B) storage dtype; gamma/mu refs: (1, K, S, B);
    eta/q refs: (1, S, B); hyper_ref: (8, K, S) f32 rows
    [sigma_eps*, tau_beta, pi, active*, lambda*, log_null_pi*]
    (* = broadcast along K)."""
    sig_e = hyper_ref[0, 0][:, None]              # (S, 1)
    tau_b = [hyper_ref[1, k][:, None] for k in range(K)]    # K x (S, 1)
    pi_ = [hyper_ref[2, k][:, None] for k in range(K)]
    act = hyper_ref[3, 0][:, None]                # (S, 1)
    lam = hyper_ref[4, 0][:, None]
    log_null_pi = hyper_ref[5, 0][:, None]        # (S, 1)
    on = (act > 0.0).astype(F32)
    base_logit = [jnp.log(pi_[k]) - jnp.log1p(-pi_[k])
                  + 0.5 * jnp.log(tau_b[k]) for k in range(K)]

    gamma_out[0] = gamma_ref[0]
    mu_out[0] = mu_ref[0]
    eta_out[0] = eta_ref[0]
    q_out[0] = q_ref[0]

    for t in range(n_tiles):
        idx = t * tile
        sl = pl.ds(idx, tile)
        q_t = q_out[0, :, sl]                     # (S, T)
        eta_t = eta_out[0, :, sl]
        n_t = n_ref[0, 0, sl][None, :]            # (1, T)
        beta_t = beta_ref[0, 0, sl][None, :]
        mask_t = mask_ref[0, 0, sl][None, :]
        g_t = [gamma_out[0, k, :, sl] for k in range(K)]    # K x (S, T)
        mu_t = [mu_out[0, k, :, sl] for k in range(K)]

        # per-component precision/multiplier, all (S, T):
        var_tau_t = [n_t * (1.0 + lam) / sig_e + tau_b[k] for k in range(K)]
        mu_mult_t = [n_t / (var_tau_t[k] * sig_e) for k in range(K)]
        mu_mult_max = jnp.abs(mu_mult_t[0])
        for k in range(1, K):
            mu_mult_max = jnp.maximum(mu_mult_max, jnp.abs(mu_mult_t[k]))

        D_rows = diag_ref[0, sl, :].astype(F32)
        R_tt = diag_ref[0, sl, sl].astype(F32)
        if scale != 1.0:
            R_tt = R_tt * F32(scale)
        R_abs = jnp.abs(R_tt)
        R_abs_diag = jnp.sum(R_abs * _eye(tile), axis=0)[None, :]

        g_cur, mu_cur = list(g_t), list(mu_t)
        eta_cur, q_cur = eta_t, q_t
        for step in range(inner_steps):
            mu_star = [mu_mult_t[k] * (beta_t - q_cur) for k in range(K)]
            u = [base_logit[k] - 0.5 * jnp.log(var_tau_t[k])
                 + 0.5 * var_tau_t[k] * mu_star[k] * mu_star[k]
                 for k in range(K)]                        # K x (S, T)
            u_max = log_null_pi
            for k in range(K):
                u_max = jnp.maximum(u_max, u[k])
            exp_u = [jnp.exp(u[k] - u_max) for k in range(K)]
            denom = jnp.exp(log_null_pi - u_max)
            for k in range(K):
                denom = denom + exp_u[k]
            g_star = [exp_u[k] / denom for k in range(K)]

            # gamma-weighted under-relaxation, recomputed every inner pass
            # (the frozen-weight variant diverges at genome scale):
            pip_star = g_star[0]
            for k in range(1, K):
                pip_star = pip_star + g_star[k]
            coupling = _row_matmul(pip_star * mu_mult_max, R_abs)
            coupling = coupling - R_abs_diag * pip_star * mu_mult_max
            w = act / (1.0 + coupling)                     # (S, T)

            eta_new = None
            for k in range(K):
                g_cur[k] = g_cur[k] + w * (g_star[k] - g_cur[k])
                mu_cur[k] = mu_cur[k] + w * (mu_star[k] - mu_cur[k])
                term = g_cur[k] * mu_cur[k]
                eta_new = term if eta_new is None else eta_new + term
            d_in = (eta_new - eta_cur) * mask_t * on
            q_cur = q_cur + _row_matmul(d_in, R_tt) - d_in
            eta_cur = eta_cur + d_in

        d_t = (eta_cur - eta_t) * mask_t * on              # (S, T)

        for k in range(K):
            gamma_out[0, k, :, sl] = g_cur[k]
            mu_out[0, k, :, sl] = mu_cur[k]
        eta_out[0, :, sl] = eta_t + d_t

        q_upd = _row_matmul(d_t, D_rows)
        if scale != 1.0:
            q_upd = q_upd * F32(scale)
        q_out[0] = q_out[0] + q_upd
        q_out[0, :, sl] = q_out[0, :, sl] - d_t


@functools.partial(jax.jit, static_argnames=('tile', 'inner_steps'))
def cavi_sweep_mixture_pallas_batch(ld: BlockLD, state, std_beta, n_per_snp,
                                    hyper, active, tile: int = 128,
                                    inner_steps: int = 8):
    """Pallas grid-batched mixture sweep; same contract as
    cavi_mix.cavi_sweep_mixture_batch (state: gamma/mu (S, K, NB, B),
    eta/q (S, NB, B); hyper: sigma_eps/lambda_min (S,), tau_beta/pi (S, K);
    active: (S,) f32)."""
    from .cavi_mix import MixState

    B = ld.block_size
    NB = ld.nb
    S, K = hyper.pi.shape
    assert B % tile == 0
    n_tiles = B // tile
    eta0 = state.eta

    # hyper rows as (8, K, S): K leading (statically unrolled in the kernel),
    # S on the sublane axis:
    bc = lambda x: jnp.broadcast_to(x.astype(F32)[None, :], (K, S))[None]
    hyper_mat = jnp.concatenate([
        bc(hyper.sigma_eps),
        jnp.transpose(hyper.tau_beta.astype(F32))[None],
        jnp.transpose(hyper.pi.astype(F32))[None],
        bc(active),
        bc(hyper.lambda_min),
        bc(jnp.log1p(-jnp.sum(hyper.pi, axis=1))),
        jnp.zeros((2, K, S), F32),
    ])                                            # (8, K, S)

    kernel = functools.partial(_mix_sweep_kernel_batch, K=K, tile=tile,
                               n_tiles=n_tiles, scale=ld.scale,
                               inner_steps=inner_steps)

    ksm_spec = pl.BlockSpec((1, K, S, B), lambda b: (b, b * 0, b * 0, b * 0),
                            memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec((1, S, B), lambda b: (b, b * 0, b * 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, B), lambda b: (b, b * 0, b * 0),
                            memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((NB, K, S, B), F32),
                  jax.ShapeDtypeStruct((NB, K, S, B), F32),
                  jax.ShapeDtypeStruct((NB, S, B), F32),
                  jax.ShapeDtypeStruct((NB, S, B), F32)]

    to_nb = lambda x: jnp.transpose(x, (2, 1, 0, 3))  # (S,K,NB,B)->(NB,K,S,B)
    to_nb2 = lambda x: jnp.transpose(x, (1, 0, 2))    # (S,NB,B)->(NB,S,B)
    rowify = lambda x: x[:, None, :]

    gamma, mu, eta, q = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((8, K, S), lambda b: (b * 0, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, B), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            ksm_spec, ksm_spec, sb_spec, sb_spec,
        ],
        out_specs=[ksm_spec, ksm_spec, sb_spec, sb_spec],
        out_shape=out_shapes,
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
    )(rowify(std_beta), rowify(n_per_snp), rowify(ld.mask), hyper_mat, ld.diag,
      to_nb(state.gamma), to_nb(state.mu), to_nb2(state.eta),
      to_nb2(state.q))

    gamma = jnp.transpose(gamma, (2, 1, 0, 3))        # back to (S,K,NB,B)
    mu = jnp.transpose(mu, (2, 1, 0, 3))
    eta = jnp.transpose(eta, (1, 0, 2))
    q = jnp.transpose(q, (1, 0, 2))

    eta_diff = eta - eta0
    if ld.n_off > 0:
        from .cavi_jax import _off_contrib
        q = q + _off_contrib(ld, eta_diff)

    return MixState(gamma=gamma, mu=mu, eta=eta, q=q), eta_diff


def _mix_skip_kernel(idx_ref, n_ref, oidx_ref, no_ref, osrc_ref, odst_ref,
                     hyper_ref, diag_hbm, off_hbm, consts_hbm, stack_in,
                     stack_out, cbuf, sbuf, dbuf, obuf,
                     sem_c, sem_s, sem_d, sem_o, sem_u, sem_r, sem_w,
                     *, K, R, G, B, tile, n_tiles, scale, inner_steps,
                     w_once=False):
    """Mixture-prior analog of ``_skip_kernel``: active-block-compacted sweep
    with K slab components per variant (e_step_mixture, e_step.hpp:447-551).

    stack rows: [gamma_0..gamma_{K-1}, mu_0..mu_{K-1}, eta, q, diff, pad...]
    (R rows total, a multiple of 4); consts rows: [std_beta, n, mask, 0];
    hyper_ref: (8, K) f32 SMEM rows [sigma_eps*, tau_beta_k, pi_k, lambda*,
    log_null_pi*] (* = broadcast along K).
    """
    I32 = jnp.int32
    n = n_ref[0]
    nc = lax.div(n + I32(G - 1), I32(G))
    sig_e = hyper_ref[0, 0]
    lam = hyper_ref[3, 0]
    log_null_pi = hyper_ref[4, 0]
    # (K, 1) column vectors assembled from SMEM scalars (K is small/static):
    tau_b = jnp.stack([hyper_ref[1, k] for k in range(K)])[:, None]
    pi_ = jnp.stack([hyper_ref[2, k] for k in range(K)])[:, None]
    base_logit = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b)

    E_ETA, E_Q, E_DF = 2 * K, 2 * K + 1, 2 * K + 2

    def start_chunk(c, slot):
        base = c * I32(G)
        cnt = n - base
        for g in range(G):
            @pl.when(I32(g) < cnt)
            def _():
                b = idx_ref[base + I32(g)]
                pltpu.make_async_copy(diag_hbm.at[b], dbuf.at[slot, I32(g)],
                                      sem_d.at[slot, I32(g)]).start()
                pltpu.make_async_copy(consts_hbm.at[b], cbuf.at[slot, I32(g)],
                                      sem_c.at[slot, I32(g)]).start()
                pltpu.make_async_copy(stack_out.at[b], sbuf.at[slot, I32(g)],
                                      sem_s.at[slot, I32(g)]).start()

    @pl.when(n > 0)
    def _():
        start_chunk(I32(0), I32(0))

    def body(c, carry):
        slot = lax.rem(c, I32(2))

        @pl.when(c + I32(1) < nc)
        def _():
            start_chunk(c + I32(1), lax.rem(c + I32(1), I32(2)))

        base = c * I32(G)
        cnt = n - base
        for g in range(G):
            @pl.when(I32(g) < cnt)
            def _():
                b = idx_ref[base + I32(g)]
                pltpu.make_async_copy(diag_hbm.at[b], dbuf.at[slot, I32(g)],
                                      sem_d.at[slot, I32(g)]).wait()
                pltpu.make_async_copy(consts_hbm.at[b], cbuf.at[slot, I32(g)],
                                      sem_c.at[slot, I32(g)]).wait()
                pltpu.make_async_copy(stack_out.at[b], sbuf.at[slot, I32(g)],
                                      sem_s.at[slot, I32(g)]).wait()

        cb = cbuf.at[slot]                          # (G, 4, B)
        sb = sbuf.at[slot]                          # (G, R, B) — in place
        valid = (jax.lax.broadcasted_iota(I32, (G, 1), 0) < cnt).astype(F32)
        eta0_c = sb[:, E_ETA, :]                    # (G, B)

        for t in range(n_tiles):
            sl = pl.ds(t * tile, tile)
            q_t = sb[:, E_Q, sl]                    # (G, T)
            eta_t = sb[:, E_ETA, sl]
            # per-component reads (an unaligned K-row slice of the sublane
            # dim is illegal in Mosaic; integer indexing is fine):
            g_t = jnp.stack([sb[:, k, sl] for k in range(K)], axis=1)
            mu_t = jnp.stack([sb[:, K + k, sl] for k in range(K)], axis=1)
            nn_t = cb[:, 1, sl]
            bb_t = cb[:, 0, sl]
            mm_t = cb[:, 2, sl] * valid             # (G, T)

            var_tau_t = nn_t[:, None, :] * (1.0 + lam) / sig_e \
                + tau_b[None]                       # (G, K, T)
            mu_mult_t = nn_t[:, None, :] / (var_tau_t * sig_e)
            mu_mult_max = jnp.max(jnp.abs(mu_mult_t), axis=1)   # (G, T)

            R_tt = dbuf[slot, :, sl, sl].astype(F32) * F32(scale)  # (G,T,T)
            R_abs = jnp.abs(R_tt)
            R_abs_diag = mm_t

            g_cur = g_t
            mu_cur = mu_t
            eta_cur = eta_t
            q_cur = q_t
            w = None
            for step in range(inner_steps):
                mu_star = mu_mult_t * (bb_t[:, None, :] - q_cur[:, None, :])
                u = base_logit[None] - 0.5 * jnp.log(var_tau_t) \
                    + 0.5 * var_tau_t * mu_star * mu_star       # (G, K, T)
                u_max = jnp.maximum(jnp.max(u, axis=1), log_null_pi)  # (G,T)
                exp_u = jnp.exp(u - u_max[:, None, :])
                denom = exp_u.sum(axis=1) + jnp.exp(log_null_pi - u_max)
                g_star = exp_u / denom[:, None, :]

                if not (w_once and step > 0):
                    pip_star = jnp.sum(g_star, axis=1)          # (G, T)
                    cpl = pip_star * mu_mult_max
                    coupling = jnp.sum(cpl[:, :, None] * R_abs, axis=1)
                    coupling = coupling - R_abs_diag * cpl
                    w = 1.0 / (1.0 + coupling)                  # (G, T)

                g_cur = g_cur + w[:, None, :] * (g_star - g_cur)
                mu_cur = mu_cur + w[:, None, :] * (mu_star - mu_cur)
                eta_new = jnp.sum(g_cur * mu_cur, axis=1)       # (G, T)
                d_in = (eta_new - eta_cur) * mm_t
                q_cur = q_cur + jnp.sum(d_in[:, :, None] * R_tt, axis=1) - d_in
                eta_cur = eta_cur + d_in

            d_t = (eta_cur - eta_t) * mm_t

            for k in range(K):
                sb[:, k, sl] = g_cur[:, k, :]
                sb[:, K + k, sl] = mu_cur[:, k, :]
            sb[:, E_ETA, sl] = eta_t + d_t

            R_rows = dbuf[slot, :, sl, :].astype(F32)           # (G, T, B)
            q_upd = jnp.sum(d_t[:, :, None] * R_rows, axis=1) * F32(scale)
            sb[:, E_Q, :] = sb[:, E_Q, :] + q_upd
            sb[:, E_Q, sl] = sb[:, E_Q, sl] - d_t

        sb[:, E_DF, :] = sb[:, E_ETA, :] - eta0_c

        for g in range(G):
            @pl.when(I32(g) < cnt)
            def _():
                b = idx_ref[base + I32(g)]
                pltpu.make_async_copy(sbuf.at[slot, I32(g)], stack_out.at[b],
                                      sem_o.at[slot, I32(g)]).start()
        for g in range(G):
            @pl.when(I32(g) < cnt)
            def _():
                b = idx_ref[base + I32(g)]
                pltpu.make_async_copy(sbuf.at[slot, I32(g)], stack_out.at[b],
                                      sem_o.at[slot, I32(g)]).wait()
        return 0

    lax.fori_loop(I32(0), nc, body, 0)

    _off_pass(oidx_ref, no_ref, osrc_ref, odst_ref, off_hbm, stack_out,
              obuf, sbuf.at[I32(0), I32(0)], sbuf.at[I32(0), I32(1)],
              sem_u, sem_r, sem_w, q_row=E_Q, diff_row=E_DF, scale=scale)


def _skip_kernel_s(idx_ref, n_ref, oidx_ref, no_ref, osrc_ref, odst_ref,
                   hyper_ref, diag_hbm, off_hbm, consts_hbm, stack_in,
                   stack_out, cbuf, sbuf, dbuf, obuf,
                   sem_c, sem_s, sem_d, sem_o, sem_u, sem_r, sem_w,
                   *, Sp, B, tile, n_tiles, scale, relax, inner_steps,
                   w_once=False):
    """Model-grid (S > 1) analog of ``_skip_kernel``: one block per chunk
    (the Sp model lanes already fill the sublane dimension), (Sp, T) x (T, B)
    MXU matmuls for the q updates, plane-wide coupling pass.

    stack rows: [logits 0:Sp, mu Sp:2Sp, eta 2Sp:3Sp, q 3Sp:4Sp,
    diff 4Sp:5Sp] (Sp = S padded to a multiple of 8; padded lanes carry
    active=0). hyper_ref: (8, Sp) f32 VMEM rows
    [sigma_eps, tau_beta, pi, active, lambda_min].
    """
    I32 = jnp.int32
    n = n_ref[0]
    sig_e = hyper_ref[0, :][:, None]          # (Sp, 1)
    tau_b = hyper_ref[1, :][:, None]
    pi_ = hyper_ref[2, :][:, None]
    act = hyper_ref[3, :][:, None]
    lam = hyper_ref[4, :][:, None]
    on = (act > 0.0).astype(F32)
    base_logit = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b)

    L0, M0, E0, Q0, D0 = 0, Sp, 2 * Sp, 3 * Sp, 4 * Sp

    def start_chunk(c, slot):
        b = idx_ref[c]
        pltpu.make_async_copy(diag_hbm.at[b], dbuf.at[slot],
                              sem_d.at[slot]).start()
        pltpu.make_async_copy(consts_hbm.at[b], cbuf.at[slot],
                              sem_c.at[slot]).start()
        pltpu.make_async_copy(stack_out.at[b], sbuf.at[slot],
                              sem_s.at[slot]).start()

    @pl.when(n > 0)
    def _():
        start_chunk(I32(0), I32(0))

    def body(c, carry):
        slot = lax.rem(c, I32(2))

        @pl.when(c + I32(1) < n)
        def _():
            start_chunk(c + I32(1), lax.rem(c + I32(1), I32(2)))

        b = idx_ref[c]
        pltpu.make_async_copy(diag_hbm.at[b], dbuf.at[slot],
                              sem_d.at[slot]).wait()
        pltpu.make_async_copy(consts_hbm.at[b], cbuf.at[slot],
                              sem_c.at[slot]).wait()
        pltpu.make_async_copy(stack_out.at[b], sbuf.at[slot],
                              sem_s.at[slot]).wait()

        cb = cbuf.at[slot]                          # (4, B)
        sb = sbuf.at[slot]                          # (5*Sp, B) — in place
        eta0_c = sb[pl.ds(E0, Sp), :]               # (Sp, B)

        for t in range(n_tiles):
            sl = pl.ds(t * tile, tile)
            q_t = sb[pl.ds(Q0, Sp), sl]             # (Sp, T)
            eta_t = sb[pl.ds(E0, Sp), sl]
            logits_t = sb[pl.ds(L0, Sp), sl]
            mu_t = sb[pl.ds(M0, Sp), sl]
            nn_t = cb[1, sl][None, :]               # (1, T)
            bb_t = cb[0, sl][None, :]
            mm_t = cb[2, sl][None, :]

            var_tau_t = nn_t * (1.0 + lam) / sig_e + tau_b
            mu_mult_t = nn_t / (var_tau_t * sig_e)

            D_rows = dbuf[slot, sl, :].astype(F32)              # (T, B)
            R_tt = dbuf[slot, sl, sl].astype(F32) * F32(scale)  # (T, T)
            R_abs = jnp.abs(R_tt)
            R_abs_diag = mm_t                      # unit diag on real lanes

            g_cur = jax.nn.sigmoid(logits_t)
            mu_cur = mu_t
            eta_cur = eta_t
            q_cur = q_t
            w = None
            for step in range(inner_steps):
                mu_star = mu_mult_t * (bb_t - q_cur)
                u_star = base_logit - 0.5 * jnp.log(var_tau_t) \
                    + 0.5 * var_tau_t * mu_star * mu_star
                g_star = jax.nn.sigmoid(u_star)
                if relax and not (w_once and step > 0):
                    coupling = jnp.dot(g_star * jnp.abs(mu_mult_t), R_abs,
                                       preferred_element_type=F32,
                                       precision=lax.Precision.HIGHEST)
                    coupling = coupling \
                        - R_abs_diag * g_star * jnp.abs(mu_mult_t)
                    w = act / (1.0 + coupling)
                elif not relax:
                    w = act
                g_cur = g_cur + w * (g_star - g_cur)
                mu_cur = mu_cur + w * (mu_star - mu_cur)
                eta_new = g_cur * mu_cur
                d_in = (eta_new - eta_cur) * mm_t * on
                q_cur = q_cur + jnp.dot(d_in, R_tt,
                                        preferred_element_type=F32,
                                        precision=lax.Precision.HIGHEST) - d_in
                eta_cur = eta_cur + d_in

            d_t = (eta_cur - eta_t) * mm_t * on
            keep = jnp.abs(d_t) >= ETA_DIFF_EPS
            d_t = jnp.where(keep, d_t, 0.0)

            u_new = jnp.log(jnp.clip(g_cur, F32(1e-30), None)) \
                - jnp.log1p(-jnp.clip(g_cur, None, F32(1.0 - 1e-7)))
            sb[pl.ds(L0, Sp), sl] = jnp.where(keep, u_new, logits_t)
            sb[pl.ds(M0, Sp), sl] = jnp.where(keep, mu_cur, mu_t)
            sb[pl.ds(E0, Sp), sl] = eta_t + d_t

            q_upd = jnp.dot(d_t, D_rows, preferred_element_type=F32,
                            precision=lax.Precision.HIGHEST) * F32(scale)
            sb[pl.ds(Q0, Sp), :] = sb[pl.ds(Q0, Sp), :] + q_upd
            sb[pl.ds(Q0, Sp), sl] = sb[pl.ds(Q0, Sp), sl] - d_t

        sb[pl.ds(D0, Sp), :] = sb[pl.ds(E0, Sp), :] - eta0_c

        cp = pltpu.make_async_copy(sbuf.at[slot], stack_out.at[b],
                                   sem_o.at[slot])
        cp.start()
        cp.wait()
        return 0

    lax.fori_loop(I32(0), n, body, 0)

    _off_pass(oidx_ref, no_ref, osrc_ref, odst_ref, off_hbm, stack_out,
              obuf, sbuf.at[I32(0)], sbuf.at[I32(1)],
              sem_u, sem_r, sem_w, q_row=Q0, diff_row=D0, scale=scale,
              rows=Sp)


@functools.partial(jax.jit, static_argnames=('tile', 'relax', 'inner_steps'))
def cavi_sweep_pallas_skip_s(ld: BlockLD, state: CaviState, std_beta,
                             n_per_snp, hyper: Hyper, active, blk_mask,
                             tile: int = 128, relax: bool = True,
                             inner_steps: int = 8):
    """Model-grid skipping sweep (S > 1); same contract as cavi_sweep plus
    ``blk_mask`` ((NB,) bool — e.g. the any-over-active-lanes reduction of
    block_proposal_mask). Quiescent blocks pass through bit-exactly; coupling
    tiles are applied in-kernel."""
    B = ld.block_size
    NB = ld.nb
    S = state.logits.shape[0]
    assert B % tile == 0
    n_tiles = B // tile
    Sp = S + (-S) % 8
    state = CaviState(*(x.astype(F32) for x in state))

    blk_mask = blk_mask.astype(bool)
    idx = jnp.argsort(~blk_mask, stable=True).astype(jnp.int32)
    n_active = jnp.sum(blk_mask).astype(jnp.int32).reshape(1)
    if ld.n_off > 0:
        off_act = blk_mask[ld.off_src] | blk_mask[ld.off_dst]
        oidx = jnp.argsort(~off_act, stable=True).astype(jnp.int32)
        n_off_act = jnp.sum(off_act).astype(jnp.int32).reshape(1)
        off_hbm = ld.off_data
        osrc = ld.off_src.astype(jnp.int32)
        odst = ld.off_dst.astype(jnp.int32)
    else:
        oidx = jnp.zeros(1, jnp.int32)
        n_off_act = jnp.zeros(1, jnp.int32)
        off_hbm = jnp.zeros((1, B, B), ld.diag.dtype)
        osrc = jnp.zeros(1, jnp.int32)
        odst = jnp.zeros(1, jnp.int32)

    def padS(x, fill):
        return jnp.concatenate(
            [x.astype(F32), jnp.full(Sp - S, fill, F32)]) if Sp > S \
            else x.astype(F32)
    hyper_mat = jnp.stack([
        padS(hyper.sigma_eps, 1.0),
        padS(hyper.tau_beta, 1.0),
        padS(hyper.pi, 0.5),          # pads must stay clear of log(0)
        padS(active.astype(F32), 0.0),
        padS(hyper.lambda_min, 0.0),
        jnp.zeros(Sp, F32), jnp.zeros(Sp, F32), jnp.zeros(Sp, F32),
    ])                                            # (8, Sp)

    consts = jnp.stack([std_beta.astype(F32), n_per_snp.astype(F32),
                        ld.mask.astype(F32),
                        jnp.zeros_like(ld.mask, F32)], axis=1)   # (NB, 4, B)

    def padded(x):
        if Sp > S:
            pad = jnp.zeros((Sp - S,) + x.shape[1:], F32)
            x = jnp.concatenate([x, pad], axis=0)
        return jnp.transpose(x, (1, 0, 2))        # (NB, Sp, B)
    zeros = jnp.zeros((NB, Sp, B), F32)
    stack = jnp.concatenate(
        [padded(state.logits), padded(state.mu), padded(state.eta),
         padded(state.q), zeros], axis=1)         # (NB, 5*Sp, B)

    kernel = functools.partial(_skip_kernel_s, Sp=Sp, B=B, tile=tile,
                               n_tiles=n_tiles, scale=ld.scale, relax=relax,
                               inner_steps=inner_steps)

    dma_bytes = 2 * (B * B * ld.diag.dtype.itemsize
                     + (5 * Sp + 4) * B * 4) \
        + 2 * B * B * ld.diag.dtype.itemsize
    vmem_limit = min(110 * 1024 * 1024, dma_bytes + 64 * 1024 * 1024)
    new_stack = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # idx
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_active
            pl.BlockSpec(memory_space=pltpu.SMEM),      # oidx
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_off_act
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off_src
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off_dst
            pl.BlockSpec(memory_space=pltpu.VMEM),      # hyper (8, Sp)
            pl.BlockSpec(memory_space=pl.ANY),          # diag
            pl.BlockSpec(memory_space=pl.ANY),          # off tiles
            pl.BlockSpec(memory_space=pl.ANY),          # consts
            pl.BlockSpec(memory_space=pl.ANY),          # stack
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, 5 * Sp, B), F32),
        input_output_aliases={10: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 4, B), F32),                 # cbuf
            pltpu.VMEM((2, 5 * Sp, B), F32),            # sbuf
            pltpu.VMEM((2, B, B), ld.diag.dtype),       # dbuf
            pltpu.VMEM((2, B, B), ld.diag.dtype),       # obuf
            pltpu.SemaphoreType.DMA((2,)),              # sem_c
            pltpu.SemaphoreType.DMA((2,)),              # sem_s
            pltpu.SemaphoreType.DMA((2,)),              # sem_d
            pltpu.SemaphoreType.DMA((2,)),              # sem_o
            pltpu.SemaphoreType.DMA((2,)),              # sem_u
            pltpu.SemaphoreType.DMA((2,)),              # sem_r
            pltpu.SemaphoreType.DMA((2,)),              # sem_w
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(idx, n_active, oidx, n_off_act, osrc, odst,
      hyper_mat, ld.diag, off_hbm, consts, stack)

    def plane(i):
        return jnp.transpose(new_stack[:, i * Sp:i * Sp + S], (1, 0, 2))
    state_new = CaviState(logits=plane(0), mu=plane(1), eta=plane(2),
                          q=plane(3))
    eta_diff = plane(4)
    return state_new, eta_diff


def mix_block_proposal_mask(ld: BlockLD, state, std_beta, n_per_snp,
                            hyper, eps=ETA_DIFF_EPS):
    """Mixture analog of block_proposal_mask: per-block activity from the
    unrelaxed first-step K-component proposal (no LD traffic). Returns (NB,)
    bool."""
    sig_e = hyper.sigma_eps.astype(F32)
    tau_b = hyper.tau_beta.astype(F32)[:, None, None]      # (K,1,1)
    pi_ = hyper.pi.astype(F32)[:, None, None]
    lam = hyper.lambda_min.astype(F32)
    log_null_pi = jnp.log1p(-jnp.sum(hyper.pi.astype(F32)))
    n = n_per_snp[None]                                    # (1, NB, B)
    var_tau = n * (1.0 + lam) / sig_e + tau_b              # (K, NB, B)
    mu_star = (n / (var_tau * sig_e)) * (std_beta[None] - state.q[None])
    u = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b) \
        - 0.5 * jnp.log(var_tau) + 0.5 * var_tau * mu_star * mu_star
    u_max = jnp.maximum(jnp.max(u, axis=0), log_null_pi)   # (NB, B)
    exp_u = jnp.exp(u - u_max[None])
    denom = exp_u.sum(axis=0) + jnp.exp(log_null_pi - u_max)
    eta_star = jnp.sum(exp_u / denom[None] * mu_star, axis=0)
    prop = jnp.abs(eta_star - state.eta) * ld.mask
    return jnp.max(prop, axis=1) >= eps


@functools.partial(jax.jit, static_argnames=('tile', 'inner_steps', 'chunk'))
def cavi_sweep_mixture_pallas_skip(ld: BlockLD, state, std_beta, n_per_snp,
                                   hyper, blk_mask, tile: int = 128,
                                   inner_steps: int = 8, chunk: int = 8):
    """Active-block-compacted mixture sweep; same contract as
    cavi_sweep_mixture plus ``blk_mask`` ((NB,) bool). Quiescent blocks pass
    through bit-exactly; coupling tiles are applied in-kernel."""
    from .cavi_mix import MixState

    B = ld.block_size
    NB = ld.nb
    G = chunk
    K = state.gamma.shape[0]
    assert B % tile == 0
    n_tiles = B // tile
    R = 2 * K + 3
    R += (-R) % 8    # pad rows to the (8, 128) f32 VMEM tiling Mosaic picks

    blk_mask = blk_mask.astype(bool)
    idx = jnp.argsort(~blk_mask, stable=True).astype(jnp.int32)
    n_active = jnp.sum(blk_mask).astype(jnp.int32).reshape(1)
    if ld.n_off > 0:
        off_act = blk_mask[ld.off_src] | blk_mask[ld.off_dst]
        oidx = jnp.argsort(~off_act, stable=True).astype(jnp.int32)
        n_off_act = jnp.sum(off_act).astype(jnp.int32).reshape(1)
        off_hbm = ld.off_data
        osrc = ld.off_src.astype(jnp.int32)
        odst = ld.off_dst.astype(jnp.int32)
    else:
        oidx = jnp.zeros(1, jnp.int32)
        n_off_act = jnp.zeros(1, jnp.int32)
        off_hbm = jnp.zeros((1, B, B), ld.diag.dtype)
        osrc = jnp.zeros(1, jnp.int32)
        odst = jnp.zeros(1, jnp.int32)

    hyper_mat = jnp.stack([
        jnp.broadcast_to(hyper.sigma_eps.astype(F32), (K,)),
        hyper.tau_beta.astype(F32),
        hyper.pi.astype(F32),
        jnp.broadcast_to(hyper.lambda_min.astype(F32), (K,)),
        jnp.broadcast_to(jnp.log1p(-jnp.sum(hyper.pi)).astype(F32), (K,)),
        jnp.zeros(K, F32), jnp.zeros(K, F32), jnp.zeros(K, F32),
    ])                                            # (8, K)

    consts = jnp.stack([std_beta.astype(F32), n_per_snp.astype(F32),
                        ld.mask.astype(F32),
                        jnp.zeros_like(ld.mask, F32)], axis=1)   # (NB, 4, B)
    zero = jnp.zeros_like(state.eta)
    planes = ([state.gamma[k].astype(F32) for k in range(K)]
              + [state.mu[k].astype(F32) for k in range(K)]
              + [state.eta.astype(F32), state.q.astype(F32)]
              + [zero] * (R - 2 * K - 2))
    stack = jnp.stack(planes, axis=1)             # (NB, R, B)

    kernel = functools.partial(_mix_skip_kernel, K=K, R=R, G=G, B=B,
                               tile=tile, n_tiles=n_tiles, scale=ld.scale,
                               inner_steps=inner_steps)

    dma_bytes = 2 * G * (B * B * ld.diag.dtype.itemsize + (R + 4) * B * 4) \
        + 2 * B * B * ld.diag.dtype.itemsize
    vmem_limit = min(110 * 1024 * 1024, dma_bytes + 48 * 1024 * 1024)
    new_stack = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # idx
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_active
            pl.BlockSpec(memory_space=pltpu.SMEM),      # oidx
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_off_act
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off_src
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off_dst
            pl.BlockSpec(memory_space=pltpu.SMEM),      # hyper (8, K)
            pl.BlockSpec(memory_space=pl.ANY),          # diag
            pl.BlockSpec(memory_space=pl.ANY),          # off tiles
            pl.BlockSpec(memory_space=pl.ANY),          # consts
            pl.BlockSpec(memory_space=pl.ANY),          # stack
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, R, B), F32),
        input_output_aliases={10: 0},
        scratch_shapes=[
            pltpu.VMEM((2, G, 4, B), F32),              # cbuf
            pltpu.VMEM((2, G, R, B), F32),              # sbuf
            pltpu.VMEM((2, G, B, B), ld.diag.dtype),    # dbuf
            pltpu.VMEM((2, B, B), ld.diag.dtype),       # obuf
            pltpu.SemaphoreType.DMA((2, G)),            # sem_c
            pltpu.SemaphoreType.DMA((2, G)),            # sem_s
            pltpu.SemaphoreType.DMA((2, G)),            # sem_d
            pltpu.SemaphoreType.DMA((2, G)),            # sem_o
            pltpu.SemaphoreType.DMA((2,)),              # sem_u
            pltpu.SemaphoreType.DMA((2,)),              # sem_r
            pltpu.SemaphoreType.DMA((2,)),              # sem_w
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(idx, n_active, oidx, n_off_act, osrc, odst,
      hyper_mat, ld.diag, off_hbm, consts, stack)

    state_new = MixState(
        gamma=jnp.stack([new_stack[:, k] for k in range(K)]),
        mu=jnp.stack([new_stack[:, K + k] for k in range(K)]),
        eta=new_stack[:, 2 * K],
        q=new_stack[:, 2 * K + 1])
    eta_diff = new_stack[:, 2 * K + 2]
    return state_new, eta_diff


def mix_block_proposal_mask_batch(ld: BlockLD, state, std_beta, n_per_snp,
                                  hyper, eps=ETA_DIFF_EPS):
    """Batched mixture analog of block_proposal_mask: per-(lane, block)
    activity from the unrelaxed first-step K-component proposal (no LD
    traffic). state: gamma/mu (S, K, NB, B), eta/q (S, NB, B); hyper:
    sigma_eps/lambda_min (S,), tau_beta/pi (S, K). Returns (S, NB) bool."""
    sig_e = hyper.sigma_eps.astype(F32)[:, None, None, None]  # (S,1,1,1)
    tau_b = hyper.tau_beta.astype(F32)[:, :, None, None]      # (S,K,1,1)
    pi_ = hyper.pi.astype(F32)[:, :, None, None]
    lam = hyper.lambda_min.astype(F32)[:, None, None, None]
    log_null_pi = jnp.log1p(
        -jnp.sum(hyper.pi.astype(F32), axis=1))[:, None, None]  # (S,1,1)
    n = n_per_snp[None, None]                                 # (1,1,NB,B)
    var_tau = n * (1.0 + lam) / sig_e + tau_b                 # (S,K,NB,B)
    mu_star = (n / (var_tau * sig_e)) \
        * (std_beta[None, None] - state.q[:, None])
    u = jnp.log(pi_) - jnp.log1p(-pi_) + 0.5 * jnp.log(tau_b) \
        - 0.5 * jnp.log(var_tau) + 0.5 * var_tau * mu_star * mu_star
    u_max = jnp.maximum(jnp.max(u, axis=1), log_null_pi)     # (S,NB,B)
    exp_u = jnp.exp(u - u_max[:, None])
    denom = exp_u.sum(axis=1) + jnp.exp(log_null_pi - u_max)
    eta_star = jnp.sum(exp_u * mu_star, axis=1) / denom
    prop = jnp.abs(eta_star - state.eta) * ld.mask[None]
    return jnp.max(prop, axis=2) >= eps                       # (S, NB)


def _mix_skip_kernel_batch(idx_ref, n_ref, oidx_ref, no_ref, osrc_ref,
                           odst_ref, hyper_ref, diag_hbm, off_hbm, consts_hbm,
                           stack_in, stack_out, cbuf, sbuf, dbuf, obuf,
                           sem_c, sem_s, sem_d, sem_o, sem_u, sem_r, sem_w,
                           *, K, Sp, B, tile, n_tiles, scale, inner_steps):
    """Grid-batched mixture skip kernel: the `_skip_kernel_s` DMA structure
    (one block per chunk, Sp model lanes on the sublane axis, active blocks
    gather-compacted) with `_mix_sweep_kernel_batch`'s K-leading statically
    unrolled component math.

    stack rows: [gamma_k (k*Sp..), mu_k ((K+k)*Sp..), eta (2K*Sp),
    q ((2K+1)*Sp), diff ((2K+2)*Sp)]; hyper_ref: (8, K, Sp) f32 VMEM rows
    [sigma_eps*, tau_beta, pi, active*, lambda*, log_null_pi*]
    (* = broadcast along K)."""
    I32 = jnp.int32
    n = n_ref[0]
    sig_e = hyper_ref[0, 0][:, None]                 # (Sp, 1)
    tau_b = [hyper_ref[1, k][:, None] for k in range(K)]
    pi_ = [hyper_ref[2, k][:, None] for k in range(K)]
    act = hyper_ref[3, 0][:, None]
    lam = hyper_ref[4, 0][:, None]
    log_null_pi = hyper_ref[5, 0][:, None]
    on = (act > 0.0).astype(F32)
    base_logit = [jnp.log(pi_[k]) - jnp.log1p(-pi_[k])
                  + 0.5 * jnp.log(tau_b[k]) for k in range(K)]

    E0, Q0, D0 = 2 * K * Sp, (2 * K + 1) * Sp, (2 * K + 2) * Sp

    def start_chunk(c, slot):
        b = idx_ref[c]
        pltpu.make_async_copy(diag_hbm.at[b], dbuf.at[slot],
                              sem_d.at[slot]).start()
        pltpu.make_async_copy(consts_hbm.at[b], cbuf.at[slot],
                              sem_c.at[slot]).start()
        pltpu.make_async_copy(stack_out.at[b], sbuf.at[slot],
                              sem_s.at[slot]).start()

    @pl.when(n > 0)
    def _():
        start_chunk(I32(0), I32(0))

    def body(c, carry):
        slot = lax.rem(c, I32(2))

        @pl.when(c + I32(1) < n)
        def _():
            start_chunk(c + I32(1), lax.rem(c + I32(1), I32(2)))

        b = idx_ref[c]
        pltpu.make_async_copy(diag_hbm.at[b], dbuf.at[slot],
                              sem_d.at[slot]).wait()
        pltpu.make_async_copy(consts_hbm.at[b], cbuf.at[slot],
                              sem_c.at[slot]).wait()
        pltpu.make_async_copy(stack_out.at[b], sbuf.at[slot],
                              sem_s.at[slot]).wait()

        cb = cbuf.at[slot]                          # (4, B)
        sb = sbuf.at[slot]                          # (R, B) — in place
        eta0_c = sb[pl.ds(E0, Sp), :]               # (Sp, B)

        for t in range(n_tiles):
            sl = pl.ds(t * tile, tile)
            q_t = sb[pl.ds(Q0, Sp), sl]             # (Sp, T)
            eta_t = sb[pl.ds(E0, Sp), sl]
            g_t = [sb[pl.ds(k * Sp, Sp), sl] for k in range(K)]
            mu_t = [sb[pl.ds((K + k) * Sp, Sp), sl] for k in range(K)]
            nn_t = cb[1, sl][None, :]               # (1, T)
            bb_t = cb[0, sl][None, :]
            mm_t = cb[2, sl][None, :]

            var_tau_t = [nn_t * (1.0 + lam) / sig_e + tau_b[k]
                         for k in range(K)]         # K x (Sp, T)
            mu_mult_t = [nn_t / (var_tau_t[k] * sig_e) for k in range(K)]
            mu_mult_max = jnp.abs(mu_mult_t[0])
            for k in range(1, K):
                mu_mult_max = jnp.maximum(mu_mult_max, jnp.abs(mu_mult_t[k]))

            D_rows = dbuf[slot, sl, :].astype(F32)              # (T, B)
            R_tt = dbuf[slot, sl, sl].astype(F32) * F32(scale)  # (T, T)
            R_abs = jnp.abs(R_tt)
            R_abs_diag = mm_t                       # unit diag on real lanes

            g_cur, mu_cur = list(g_t), list(mu_t)
            eta_cur, q_cur = eta_t, q_t
            for step in range(inner_steps):
                mu_star = [mu_mult_t[k] * (bb_t - q_cur) for k in range(K)]
                u = [base_logit[k] - 0.5 * jnp.log(var_tau_t[k])
                     + 0.5 * var_tau_t[k] * mu_star[k] * mu_star[k]
                     for k in range(K)]             # K x (Sp, T)
                u_max = log_null_pi
                for k in range(K):
                    u_max = jnp.maximum(u_max, u[k])
                exp_u = [jnp.exp(u[k] - u_max) for k in range(K)]
                denom = jnp.exp(log_null_pi - u_max)
                for k in range(K):
                    denom = denom + exp_u[k]
                g_star = [exp_u[k] / denom for k in range(K)]

                pip_star = g_star[0]
                for k in range(1, K):
                    pip_star = pip_star + g_star[k]
                coupling = jnp.dot(pip_star * mu_mult_max, R_abs,
                                   preferred_element_type=F32,
                                   precision=lax.Precision.HIGHEST)
                coupling = coupling - R_abs_diag * pip_star * mu_mult_max
                w = act / (1.0 + coupling)          # (Sp, T)

                eta_new = None
                for k in range(K):
                    g_cur[k] = g_cur[k] + w * (g_star[k] - g_cur[k])
                    mu_cur[k] = mu_cur[k] + w * (mu_star[k] - mu_cur[k])
                    term = g_cur[k] * mu_cur[k]
                    eta_new = term if eta_new is None else eta_new + term
                d_in = (eta_new - eta_cur) * mm_t * on
                q_cur = q_cur + jnp.dot(d_in, R_tt,
                                        preferred_element_type=F32,
                                        precision=lax.Precision.HIGHEST) - d_in
                eta_cur = eta_cur + d_in

            d_t = (eta_cur - eta_t) * mm_t * on

            for k in range(K):
                sb[pl.ds(k * Sp, Sp), sl] = g_cur[k]
                sb[pl.ds((K + k) * Sp, Sp), sl] = mu_cur[k]
            sb[pl.ds(E0, Sp), sl] = eta_t + d_t

            q_upd = jnp.dot(d_t, D_rows, preferred_element_type=F32,
                            precision=lax.Precision.HIGHEST) * F32(scale)
            sb[pl.ds(Q0, Sp), :] = sb[pl.ds(Q0, Sp), :] + q_upd
            sb[pl.ds(Q0, Sp), sl] = sb[pl.ds(Q0, Sp), sl] - d_t

        sb[pl.ds(D0, Sp), :] = sb[pl.ds(E0, Sp), :] - eta0_c

        cp = pltpu.make_async_copy(sbuf.at[slot], stack_out.at[b],
                                   sem_o.at[slot])
        cp.start()
        cp.wait()
        return 0

    lax.fori_loop(I32(0), n, body, 0)

    _off_pass(oidx_ref, no_ref, osrc_ref, odst_ref, off_hbm, stack_out,
              obuf, sbuf.at[I32(0)], sbuf.at[I32(1)],
              sem_u, sem_r, sem_w, q_row=Q0, diff_row=D0, scale=scale,
              rows=Sp)


@functools.partial(jax.jit, static_argnames=('tile', 'inner_steps'))
def cavi_sweep_mixture_pallas_skip_batch(ld: BlockLD, state, std_beta,
                                         n_per_snp, hyper, active, blk_mask,
                                         tile: int = 128,
                                         inner_steps: int = 8):
    """Grid-batched mixture skipping sweep; same contract as
    cavi_sweep_mixture_pallas_batch plus ``blk_mask`` ((NB,) bool — e.g. the
    any-over-(lanes x components) reduction of mix_block_proposal_mask_batch).
    Quiescent blocks pass through bit-exactly; coupling tiles are applied
    in-kernel."""
    from .cavi_mix import MixState

    B = ld.block_size
    NB = ld.nb
    S, K = hyper.pi.shape
    assert B % tile == 0
    n_tiles = B // tile
    Sp = S + (-S) % 8

    blk_mask = blk_mask.astype(bool)
    idx = jnp.argsort(~blk_mask, stable=True).astype(jnp.int32)
    n_active = jnp.sum(blk_mask).astype(jnp.int32).reshape(1)
    if ld.n_off > 0:
        off_act = blk_mask[ld.off_src] | blk_mask[ld.off_dst]
        oidx = jnp.argsort(~off_act, stable=True).astype(jnp.int32)
        n_off_act = jnp.sum(off_act).astype(jnp.int32).reshape(1)
        off_hbm = ld.off_data
        osrc = ld.off_src.astype(jnp.int32)
        odst = ld.off_dst.astype(jnp.int32)
    else:
        oidx = jnp.zeros(1, jnp.int32)
        n_off_act = jnp.zeros(1, jnp.int32)
        off_hbm = jnp.zeros((1, B, B), ld.diag.dtype)
        osrc = jnp.zeros(1, jnp.int32)
        odst = jnp.zeros(1, jnp.int32)

    def padS(x, fill):
        x = x.astype(F32)
        return jnp.concatenate([x, jnp.full((Sp - S,) + x.shape[1:],
                                            fill, F32)]) if Sp > S else x

    # (8, K, Sp): K leading (statically unrolled), Sp on the sublane axis:
    bc = lambda x, fill: jnp.broadcast_to(padS(x, fill)[None, :],
                                          (K, Sp))[None]
    hyper_mat = jnp.concatenate([
        bc(hyper.sigma_eps, 1.0),
        jnp.transpose(padS(hyper.tau_beta, 1.0))[None],
        jnp.transpose(padS(hyper.pi, 0.25 / K))[None],  # pads clear of log(0)
        bc(active.astype(F32), 0.0),
        bc(hyper.lambda_min, 0.0),
        bc(jnp.log1p(-jnp.sum(hyper.pi, axis=1)), -1.0),
        jnp.zeros((2, K, Sp), F32),
    ])                                            # (8, K, Sp)

    consts = jnp.stack([std_beta.astype(F32), n_per_snp.astype(F32),
                        ld.mask.astype(F32),
                        jnp.zeros_like(ld.mask, F32)], axis=1)   # (NB, 4, B)

    def padded(x):                                # (S, NB, B) -> (NB, Sp, B)
        x = x.astype(F32)
        if Sp > S:
            x = jnp.concatenate(
                [x, jnp.zeros((Sp - S,) + x.shape[1:], F32)], axis=0)
        return jnp.transpose(x, (1, 0, 2))
    planes = ([padded(state.gamma[:, k]) for k in range(K)]
              + [padded(state.mu[:, k]) for k in range(K)]
              + [padded(state.eta), padded(state.q),
                 jnp.zeros((NB, Sp, B), F32)])
    stack = jnp.concatenate(planes, axis=1)       # (NB, (2K+3)*Sp, B)
    R = (2 * K + 3) * Sp

    kernel = functools.partial(_mix_skip_kernel_batch, K=K, Sp=Sp, B=B,
                               tile=tile, n_tiles=n_tiles, scale=ld.scale,
                               inner_steps=inner_steps)

    dma_bytes = 2 * (B * B * ld.diag.dtype.itemsize + (R + 4) * B * 4) \
        + 2 * B * B * ld.diag.dtype.itemsize
    vmem_limit = min(110 * 1024 * 1024, dma_bytes + 64 * 1024 * 1024)
    new_stack = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # idx
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_active
            pl.BlockSpec(memory_space=pltpu.SMEM),      # oidx
            pl.BlockSpec(memory_space=pltpu.SMEM),      # n_off_act
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off_src
            pl.BlockSpec(memory_space=pltpu.SMEM),      # off_dst
            pl.BlockSpec(memory_space=pltpu.VMEM),      # hyper (8, K, Sp)
            pl.BlockSpec(memory_space=pl.ANY),          # diag
            pl.BlockSpec(memory_space=pl.ANY),          # off tiles
            pl.BlockSpec(memory_space=pl.ANY),          # consts
            pl.BlockSpec(memory_space=pl.ANY),          # stack
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, R, B), F32),
        input_output_aliases={10: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 4, B), F32),                 # cbuf
            pltpu.VMEM((2, R, B), F32),                 # sbuf
            pltpu.VMEM((2, B, B), ld.diag.dtype),       # dbuf
            pltpu.VMEM((2, B, B), ld.diag.dtype),       # obuf
            pltpu.SemaphoreType.DMA((2,)),              # sem_c
            pltpu.SemaphoreType.DMA((2,)),              # sem_s
            pltpu.SemaphoreType.DMA((2,)),              # sem_d
            pltpu.SemaphoreType.DMA((2,)),              # sem_o
            pltpu.SemaphoreType.DMA((2,)),              # sem_u
            pltpu.SemaphoreType.DMA((2,)),              # sem_r
            pltpu.SemaphoreType.DMA((2,)),              # sem_w
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(idx, n_active, oidx, n_off_act, osrc, odst,
      hyper_mat, ld.diag, off_hbm, consts, stack)

    def plane(i):                                 # row-span i of Sp rows
        return jnp.transpose(new_stack[:, i * Sp:i * Sp + S], (1, 0, 2))
    state_new = MixState(
        gamma=jnp.stack([plane(k) for k in range(K)], axis=1),
        mu=jnp.stack([plane(K + k) for k in range(K)], axis=1),
        eta=plane(2 * K),
        q=plane(2 * K + 1))
    eta_diff = plane(2 * K + 2)
    return state_new, eta_diff


@functools.partial(jax.jit, static_argnames=('tile', 'relax', 'inner_steps',
                                              'chunk'))
def cavi_sweep_pallas(ld: BlockLD, state: CaviState, std_beta, n_per_snp,
                      hyper: Hyper, active, tile: int = 128,
                      relax: bool = True, inner_steps: int = 8,
                      chunk: int = 8):
    """Pallas-fused CAVI sweep; same contract as cavi_jax.cavi_sweep.

    S == 1 dispatches to the chunked single-model kernel (cavi_sweep_pallas_s1)
    whose VPU lowering avoids the M=1 MXU weight-load bottleneck."""
    B = ld.block_size
    NB = ld.nb
    S = state.logits.shape[0]
    if S == 1:
        return cavi_sweep_pallas_s1(ld, state, std_beta, n_per_snp, hyper,
                                    active, tile=tile, relax=relax,
                                    inner_steps=inner_steps, chunk=chunk)
    assert B % tile == 0
    n_tiles = B // tile
    eta0 = state.eta

    active = active.astype(F32)
    hyper_mat = jnp.concatenate([
        jnp.stack([hyper.sigma_eps.astype(F32),
                   hyper.tau_beta.astype(F32),
                   hyper.pi.astype(F32),
                   active,
                   hyper.lambda_min.astype(F32)]),
        jnp.zeros((3, S), F32),       # pad rows to a sublane multiple
    ])                                 # (8, S)

    kernel = functools.partial(
        _sweep_kernel, tile=tile, n_tiles=n_tiles, scale=ld.scale,
        relax=relax, inner_steps=inner_steps)

    # Pallas TPU block-shape rules: the last two dims of every block must be
    # (multiple of 8, multiple of 128) or equal the array dims. State is
    # therefore laid out (NB, S, B) for the kernel (block (1, S, B)), and the
    # per-variant rows as (NB, 1, B).
    out_shapes = [jax.ShapeDtypeStruct((NB, S, B), F32) for _ in range(4)]

    state_spec = pl.BlockSpec((1, S, B), lambda b: (b, b * 0, b * 0),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, B), lambda b: (b, b * 0, b * 0),
                            memory_space=pltpu.VMEM)

    to_k = lambda x: jnp.transpose(x, (1, 0, 2))     # (S,NB,B) -> (NB,S,B)
    rowify = lambda x: x[:, None, :]                 # (NB,B) -> (NB,1,B)

    logits, mu, eta, q = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((8, S), lambda b: (b * 0, b * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, B), lambda b: (b, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec, state_spec,
        ],
        out_specs=[state_spec] * 4,
        out_shape=out_shapes,
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
    )(rowify(std_beta), rowify(n_per_snp), rowify(ld.mask), hyper_mat, ld.diag,
      to_k(state.logits), to_k(state.mu), to_k(state.eta), to_k(state.q))

    from_k = lambda x: jnp.transpose(x, (1, 0, 2))
    logits, mu, eta, q = from_k(logits), from_k(mu), from_k(eta), from_k(q)

    eta_diff = eta - eta0
    q = refresh_q(ld, q, eta_diff)
    return CaviState(logits=logits, mu=mu, eta=eta, q=q), eta_diff
