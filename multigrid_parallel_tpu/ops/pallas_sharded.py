"""Sharded-local fused Pallas kernels for the distributed hot path.

The single-chip fused stages (ops.pallas3d) recast to run INSIDE
``shard_map`` on halo-extended local blocks, so a multi-chip solve keeps
the single-chip fusion wins — the TPU analogue of the reference putting
its ``#pragma omp for`` worksharing inside the same smoothing/residual
kernels the serial path uses (/root/reference/mg_3d.h:658, 681, 807).

Geometry contract (see parallel/sharded_padded.py for the caller side):

  * The global i axis (``n`` valid planes, padded up to ``n_dev * L``)
    is sharded; j/k stay unsharded in the lane-padded (SJ, SK) =
    (rup(n,8), rup(n,128)) layout of ops.pallas3d.
  * Each kernel takes HALO-EXTENDED local arrays of shape
    (L + 2*halo, SJ, SK): the caller ppermutes ``halo`` neighbor planes
    onto each side before the kernel (chain ends receive zeros, which is
    exactly the correction-field boundary). One exchange feeds a whole
    fused stage — e.g. all ``2*n_iter`` half-sweeps of a smoothing stage
    ride a single ``2*n_iter``-plane exchange plus trapezoidal
    recompute, instead of one 1-plane exchange per half-sweep.
  * ``gi0`` — the GLOBAL plane index of ext row 0 (i.e.
    ``axis_index * L - halo``; negative on device 0) — arrives as a
    (1,) int32 SMEM operand, because interior/parity masks use global
    indices (RED = global (i+j+k) odd, mg_3d.h:669/693) and
    ``axis_index`` is a traced value inside shard_map.
  * Outputs are the L owned planes only (the redundantly recomputed
    halo planes are discarded; every device computes identical values
    for shared planes, so ownership is consistent by construction).

All kernels are double-buffered over the block grid exactly like their
single-chip counterparts; on non-TPU backends they run in interpreter
mode so the CPU test mesh executes the same code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops.pallas3d import (
    _VMEM_BUDGET,
    _VMEM_LIMIT,
    _band_matrix,
    _eft_residual,
    _interpret,
    _prolong_band_j,
    _prolong_band_kt,
    _rb_body,
    _residual_body,
    _roll,
    _slab_masks,
)


def ext_block_i(L, sj, sk, halo, n_in, itemsize=4, requested=8):
    """block_i for the generic ext kernels, or 0 if nothing fits/works.

    Estimate mirrors pallas3d._auto_block_i: (2 slots x n_in slabs) +
    ~3 slab-sized temporaries + 2 output tiles. bi is kept even so
    shard-relative plane parities stay static."""
    plane = sj * sk * itemsize
    for bi in (requested, 16, 12, 8, 6, 4, 2):
        if bi > requested or bi % 2:
            continue
        si = bi + 2 * halo
        est = 2 * n_in * si * plane + 3 * si * plane + 2 * bi * plane
        if est <= _VMEM_BUDGET and L >= bi:
            return bi
    return 0


def restrict_ext_block_i(Lc, sj, sk, itemsize=4, requested=8):
    """block_i (in COARSE planes) for residual_restrict_ext, or 0."""
    plane = sj * sk * itemsize
    for bi in (requested, 8, 4, 2):
        if bi > requested:
            continue
        si = 2 * bi + 3
        est = 2 * 2 * si * plane + 3 * si * plane
        if est <= _VMEM_BUDGET and Lc >= bi:
            return bi
    return 0


def prolong_ext_block_i(L, sj, sk, n_iter, itemsize=4, requested=8):
    """block_i for prolong_smooth_ext, or 0.

    The bi=2 floor gets a slightly larger allowance (92 MB): its 89.4 MB
    estimate at the 513-trim level compiles and runs under real Mosaic
    (validated on-chip 2026-08-17), and without it the 513³ 1D tier's
    prolong stage falls back to masked-roll jnp entirely."""
    plane = sj * sk * itemsize
    for bi in (requested, 8, 4, 2):
        if bi > requested or bi % 2:
            continue
        si = bi + 4 * n_iter
        est = 2 * 2 * si * plane + 4 * si * plane + 2 * bi * plane
        budget = _VMEM_BUDGET if bi > 2 else 92 * 1024 * 1024
        if est <= budget and L >= bi:
            return bi
    return 0


def _go_no_x64(call):
    def go(*args):
        with jax.enable_x64(False):
            return call(*args)

    return go


# ------------------------------------------------- generic ext template


def _make_ext_kernel(L, si, sj, sk, bi, halo, nb, n_in, body):
    """Double-buffered streaming kernel over a halo-extended local block:
    block b reads ext slab [ob, ob+si) (ob = min(b*bi, L-bi), si =
    bi+2*halo — the halo is materialized in the ext array so no edge
    clamping is needed) and writes owned rows [halo, halo+bi) of
    ``body(slabs, g0)`` to out[ob : ob+bi). ``g0`` is the global plane
    index of slab row 0."""

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)

    def in_dma(hbm, ins2, sem_i, v, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(ob_of(blk), si)], ins2.at[v, slot], sem_i.at[v, slot]
        )

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gi0_ref, *refs):
        hbms = refs[:n_in]
        out_hbm = refs[n_in]
        ins2, tile2, sem_i, sem_o = refs[n_in + 1 :]
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            for v in range(n_in):
                in_dma(hbms[v], ins2, sem_i, v, slot, i).start()

        @pl.when(i + 1 < nb)
        def _():
            for v in range(n_in):
                in_dma(hbms[v], ins2, sem_i, v, nslot, i + 1).start()

        for v in range(n_in):
            in_dma(hbms[v], ins2, sem_i, v, slot, i).wait()

        g0 = gi0_ref[0] + ob_of(i)
        out_slab = body([ins2[v, slot] for v in range(n_in)], g0)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        # stage through input slot 0 (its slab is dead after `body`)
        ins2[0, slot] = out_slab
        tile2[slot] = ins2[0, slot, pl.ds(halo, bi)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def _ext_call(kernel, n_in, L, si, sj, sk, bi, dtype):
    call = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(L, bi),),
        out_shape=jax.ShapeDtypeStruct((L, sj, sk), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_in, 2, si, sj, sk), dtype),
            pltpu.VMEM((2, bi, sj, sk), dtype),
            pltpu.SemaphoreType.DMA((n_in, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)


# ------------------------------------------------------ public kernels


def rb_smooth_ext(u_ext, f_ext, gi0, h, n_iter, n, L, red_first=True,
                  block_i=8):
    """All 2*n_iter RB half-sweeps of a smoothing stage on a local block,
    one pass: ext arrays carry a 2*n_iter-plane halo (one ppermute feeds
    the whole stage). Returns the L owned planes."""
    _, sj, sk = u_ext.shape
    hh = 2 * n_iter
    rb = _rb_body(h, n_iter, red_first)
    si = block_i + 2 * hh

    def body(slabs, g0):
        eu, ef = slabs
        interior, parity = _slab_masks(n, si, sj, sk, g0)
        return rb(eu, ef, interior, parity)

    nb = pl.cdiv(L, block_i)
    kernel = _make_ext_kernel(L, si, sj, sk, block_i, hh, nb, 2, body)
    return _ext_call(kernel, 2, L, si, sj, sk, block_i, u_ext.dtype)(
        gi0, u_ext, f_ext
    )


def rb_smooth_from_zero_ext(f_ext, gi0, h, n_iter, n, L, red_first=True,
                            block_i=8):
    """rb_smooth_ext with an implicit zero initial guess (reads only f —
    the first smooth of every level starts from zero)."""
    _, sj, sk = f_ext.shape
    hh = 2 * n_iter
    rb = _rb_body(h, n_iter, red_first)
    si = block_i + 2 * hh

    def body(slabs, g0):
        (ef,) = slabs
        interior, parity = _slab_masks(n, si, sj, sk, g0)
        return rb(jnp.zeros_like(ef), ef, interior, parity)

    nb = pl.cdiv(L, block_i)
    kernel = _make_ext_kernel(L, si, sj, sk, block_i, hh, nb, 1, body)
    return _ext_call(kernel, 1, L, si, sj, sk, block_i, f_ext.dtype)(gi0, f_ext)


def residual_ext(u_ext, f_ext, gi0, h, n, L, block_i=8):
    """Interior residual on a local block (1-plane halo)."""
    _, sj, sk = u_ext.shape
    rbod = _residual_body(h)
    si = block_i + 2

    def body(slabs, g0):
        eu, ef = slabs
        interior, parity = _slab_masks(n, si, sj, sk, g0)
        return rbod(eu, ef, interior, parity)

    nb = pl.cdiv(L, block_i)
    kernel = _make_ext_kernel(L, si, sj, sk, block_i, 1, nb, 2, body)
    return _ext_call(kernel, 2, L, si, sj, sk, block_i, u_ext.dtype)(
        gi0, u_ext, f_ext
    )


# -------------------------------------- fused df residual + partial norm


def _make_residual_df_norm_ext_kernel(n, L, si, sj, sk, bi, h, nb):
    """EFT double-float residual on a local block + this device's partial
    ||r||^2 (SMEM-accumulated across blocks; the caller psums across
    devices). Owned-plane masking keeps overlapping tail blocks and halo
    rows out of the partial sum."""
    inv_h2 = 1.0 / (h * h)

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)

    def in_dma(hbm, ins2, sem_i, v, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(ob_of(blk), si)], ins2.at[v, slot], sem_i.at[v, slot]
        )

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gi0_ref, uhi_hbm, ulo_hbm, fhi_hbm, flo_hbm, out_hbm, nrm_ref,
               ins2, tile2, acc_ref, sem_i, sem_o):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)
        hbms = (uhi_hbm, ulo_hbm, fhi_hbm, flo_hbm)

        @pl.when(i == 0)
        def _():
            for v in range(4):
                in_dma(hbms[v], ins2, sem_i, v, slot, i).start()

        @pl.when(i + 1 < nb)
        def _():
            for v in range(4):
                in_dma(hbms[v], ins2, sem_i, v, nslot, i + 1).start()

        for v in range(4):
            in_dma(hbms[v], ins2, sem_i, v, slot, i).wait()

        ob = ob_of(i)
        g0 = gi0_ref[0] + ob
        interior, _ = _slab_masks(n, si, sj, sk, g0)

        def slab_nbrs(e):
            x = e[1:-1]
            return x, [
                e[:-2], e[2:],
                _roll(x, 1, 1), _roll(x, -1, 1),
                _roll(x, 1, 2), _roll(x, -1, 2),
            ]

        u_hi, u_lo, f_hi, f_lo = (ins2[v, slot] for v in range(4))
        hi_c, hi_n = slab_nbrs(u_hi)
        lo_c, lo_n = slab_nbrs(u_lo)
        r = _eft_residual(f_hi[1:-1], f_lo[1:-1], hi_c, hi_n, lo_c, lo_n, inv_h2)
        z = jnp.zeros((1, sj, sk), r.dtype)
        r = jnp.concatenate([z, r, z], axis=0)
        r = jnp.where(interior, r, jnp.zeros_like(r))

        # partial ||r||^2 over this block's OWNED local planes only
        ll = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + ob - 1
        owned = (ll >= i * bi) & (ll < jnp.minimum((i + 1) * bi, L))
        part = jnp.sum(jnp.where(owned, r * r, jnp.zeros_like(r)))

        @pl.when(i == 0)
        def _():
            acc_ref[0, 0] = jnp.zeros((), r.dtype)

        acc_ref[0, 0] = acc_ref[0, 0] + part

        @pl.when(i == nb - 1)
        def _():
            nrm_ref[0, 0] = acc_ref[0, 0]

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        ins2[0, slot] = r
        tile2[slot] = ins2[0, slot, pl.ds(1, bi)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def residual_df_norm_ext(uhi_ext, ulo_ext, fhi_ext, flo_ext, gi0, h, n, L,
                         block_i=8):
    """(r_local (L,SJ,SK), partial ||r||^2 scalar) — the caller psums the
    partial across the mesh axis. Ext arrays carry a 1-plane halo."""
    _, sj, sk = uhi_ext.shape
    bi = block_i
    si = bi + 2
    nb = pl.cdiv(L, bi)
    kernel = _make_residual_df_norm_ext_kernel(n, L, si, sj, sk, bi, h, nb)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((L, sj, sk), uhi_ext.dtype),
            jax.ShapeDtypeStruct((1, 1), uhi_ext.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 2, si, sj, sk), uhi_ext.dtype),
            pltpu.VMEM((2, bi, sj, sk), uhi_ext.dtype),
            pltpu.SMEM((1, 1), uhi_ext.dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    r, nrm2 = _go_no_x64(call)(gi0, uhi_ext, ulo_ext, fhi_ext, flo_ext)
    return r, nrm2[0, 0]


# --------------------------------------- fused residual + restrict (ext)


def _make_residual_restrict_ext_kernel(n, nc, L, Lc, si, sj, sk, bi, sjc, skc,
                                       h, nb):
    """Fine-local residual + full-weighting restriction in one pass:
    block b covers bi COARSE local planes [ob, ob+bi); its fine slab is
    ext rows [2*ob, 2*ob + 2*bi + 3) (fine ext halo = 2: residual halo 1
    + i-tap span 2). j/k taps are MXU band matmuls exactly as in
    pallas3d._make_residual_restrict_kernel."""
    inv_h2 = 1.0 / (h * h)

    def ob_of(blk):
        return jnp.minimum(blk * bi, Lc - bi)

    def in_dma(hbm, ins2, sem_i, v, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(2 * ob_of(blk), si)], ins2.at[v, slot],
            sem_i.at[v, slot]
        )

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gi0_ref, u_hbm, f_hbm, out_hbm, ins2, tile2, sem_i, sem_o):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)
        hbms = (u_hbm, f_hbm)

        @pl.when(i == 0)
        def _():
            for v in range(2):
                in_dma(hbms[v], ins2, sem_i, v, slot, i).start()

        @pl.when(i + 1 < nb)
        def _():
            for v in range(2):
                in_dma(hbms[v], ins2, sem_i, v, nslot, i + 1).start()

        for v in range(2):
            in_dma(hbms[v], ins2, sem_i, v, slot, i).wait()

        ob = ob_of(i)
        g0 = gi0_ref[0] + 2 * ob  # fine global of slab row 0
        eu = ins2[0, slot]
        ef = ins2[1, slot]
        interior, _ = _slab_masks(n, si, sj, sk, g0)
        nbr, cen = pk._nbr_sum(eu)
        rr = ef[1:-1] - inv_h2 * (nbr - 6.0 * cen)
        rr = jnp.where(interior[1:-1], rr, jnp.zeros_like(rr))

        dtype = rr.dtype
        aj = _band_matrix(sjc, sj, nc - 2, dtype)
        ak_t = _band_matrix(skc, sk, nc - 2, dtype).T
        jj = jax.lax.broadcasted_iota(jnp.int32, (sjc, skc), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (sjc, skc), 1)
        colmask = (jj >= 1) & (jj <= nc - 2) & (kk >= 1) & (kk <= nc - 2)
        # coarse global of output row ob (+t): gi0 = device_first - 2, so
        # (gi0 + 2) // 2 is this device's first coarse plane.
        gc0 = (gi0_ref[0] + 2) // 2 + ob

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        for t in range(bi):
            plane = 0.25 * rr[2 * t] + 0.5 * rr[2 * t + 1] + 0.25 * rr[2 * t + 2]
            y = jnp.dot(aj, plane, precision=jax.lax.Precision.HIGHEST)
            z = jnp.dot(y, ak_t, precision=jax.lax.Precision.HIGHEST)
            row_g = gc0 + t
            ok = jnp.logical_and(row_g >= 1, row_g <= nc - 2)
            tile2[slot, t] = jnp.where(
                jnp.logical_and(ok, colmask), z, jnp.zeros_like(z)
            )

        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def residual_restrict_ext(u_ext, f_ext, gi0, h, n, Lc, block_i=8):
    """Fused residual + restriction on a local block: fine ext (halo 2)
    (L+4, SJ, SK) -> coarse local (Lc, SJc, SKc). gi0 = global fine plane
    of ext row 0 (= axis_index * L - 2). The coarse k width follows the
    input layout (full or k-trim)."""
    nc = (n + 1) // 2
    _, sj, sk = u_ext.shape
    _, sjc, _ = pk.padded_shape(nc)
    skc = pk.coarse_k_width(n, sk)
    bi = block_i
    si = 2 * bi + 3
    L = u_ext.shape[0] - 4
    nb = pl.cdiv(Lc, bi)
    kernel = _make_residual_restrict_ext_kernel(
        n, nc, L, Lc, si, sj, sk, bi, sjc, skc, h, nb
    )
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((Lc, sjc, skc), u_ext.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, si, sj, sk), u_ext.dtype),
            pltpu.VMEM((2, bi, sjc, skc), u_ext.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)(gi0, u_ext, f_ext)


# -------------------------- fused prolong + correct + post-smooth (ext)


def _make_prolong_smooth_ext_kernel(n, nc, L, si, sic, sj, sk, sjc, skc, bi,
                                    h, n_iter, nb):
    """e' = post_smooth(e + P(ec), r) on a local block in one pass.

    Fine ext halo H = 2*n_iter (even), coarse ext halo H//2 + 1. Every
    block's fine slab start is even relative to the global grid (L, bi,
    H all even and device offsets even), so fine/coarse plane parity is
    static: even slab rows copy the coincident coarse plane, odd rows
    average — the same trilinear i-interleave as the single-chip kernel
    (pallas3d._make_prolong_smooth_kernel)."""
    h2 = h * h
    H = 2 * n_iter

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)  # even: L, bi even

    def in_dma_fine(hbm, ref2, sem2, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(ob_of(blk), si)], ref2.at[slot], sem2.at[slot]
        )

    def in_dma_coarse(hbm, ref2, sem2, slot, blk):
        # coarse slab row 0 <-> coarse global (g0_fine)/2; with coarse
        # ext halo H//2+1 that is coarse-ext row ob//2 + 1.
        return pltpu.make_async_copy(
            hbm.at[pl.ds(ob_of(blk) // 2 + 1, sic)], ref2.at[slot],
            sem2.at[slot]
        )

    def out_dma(out_hbm, tile2, sem2, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem2.at[slot]
        )

    def kernel(gi0_ref, ec_hbm, u_hbm, f_hbm, out_hbm, eu2, ef2, ec2, tile2,
               sem_u, sem_f, sem_c, sem_o):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            in_dma_fine(u_hbm, eu2, sem_u, slot, i).start()
            in_dma_fine(f_hbm, ef2, sem_f, slot, i).start()
            in_dma_coarse(ec_hbm, ec2, sem_c, slot, i).start()

        @pl.when(i + 1 < nb)
        def _():
            in_dma_fine(u_hbm, eu2, sem_u, nslot, i + 1).start()
            in_dma_fine(f_hbm, ef2, sem_f, nslot, i + 1).start()
            in_dma_coarse(ec_hbm, ec2, sem_c, nslot, i + 1).start()

        in_dma_fine(u_hbm, eu2, sem_u, slot, i).wait()
        in_dma_fine(f_hbm, ef2, sem_f, slot, i).wait()
        in_dma_coarse(ec_hbm, ec2, sem_c, slot, i).wait()

        g0 = gi0_ref[0] + ob_of(i)
        dtype = eu2.dtype
        pj = _prolong_band_j(sj, sjc, dtype)
        pkt = _prolong_band_kt(skc, sk, dtype)

        yc = []
        for c in range(sic):
            y = jnp.dot(pj, ec2[slot, c], precision=jax.lax.Precision.HIGHEST)
            yc.append(jnp.dot(y, pkt, precision=jax.lax.Precision.HIGHEST))
        corr = []
        for q in range(si):
            if q % 2 == 0:
                corr.append(yc[q // 2])
            else:
                corr.append(0.5 * (yc[q // 2] + yc[q // 2 + 1]))
        corr = jnp.stack(corr, axis=0)
        eu = eu2[slot] + corr

        interior, parity = _slab_masks(n, si, sj, sk, g0)
        ef = ef2[slot]
        masks = {c: interior[1:-1] & (parity[1:-1] == c)
                 for c in (pk.BLACK, pk.RED)}
        h2ef = h2 * ef[1:-1]  # hoisted out of the sweep loop
        for _ in range(n_iter):
            for c in (pk.BLACK, pk.RED):  # postSmoother order
                nbr, cen = pk._nbr_sum(eu)
                upd = (nbr - h2ef) * (1.0 / 6.0)
                mid = jnp.where(masks[c], upd, cen)
                eu = jnp.concatenate([eu[:1], mid, eu[-1:]], axis=0)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        eu2[slot, :] = eu
        tile2[slot] = eu2[slot, pl.ds(H, bi)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def prolong_smooth_ext(ec_ext, e_ext, r_ext, gi0, h, n_iter, n, L, block_i=8):
    """post_smooth(e + trilinear(ec), r) fused on a local block.

    e_ext/r_ext carry a 2*n_iter fine halo; ec_ext a (n_iter + 1) coarse
    halo. gi0 = global fine plane of e_ext row 0 (= axis_index*L - 2*n_iter).
    Returns the L owned fine planes."""
    nc = (n + 1) // 2
    _, sj, sk = e_ext.shape
    _, sjc, skc = ec_ext.shape
    bi = block_i
    H = 2 * n_iter
    si = bi + 2 * H
    sic = si // 2 + 1
    nb = pl.cdiv(L, bi)
    kernel = _make_prolong_smooth_ext_kernel(
        n, nc, L, si, sic, sj, sk, sjc, skc, bi, h, n_iter, nb
    )
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((L, sj, sk), e_ext.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, si, sj, sk), e_ext.dtype),
            pltpu.VMEM((2, si, sj, sk), e_ext.dtype),
            pltpu.VMEM((2, sic, sjc, skc), e_ext.dtype),
            pltpu.VMEM((2, bi, sj, sk), e_ext.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)(gi0, ec_ext, e_ext, r_ext)


# ---------------- halo-DMA variants (no ext-array materialization) ----
# The ext kernels above read a caller-materialized (L + 2*halo) extended
# copy — one full extra HBM write+read of every stream per stage (the
# measured 1.14-1.26x distributed tax, docs/SCALING.md). These variants
# take the LOCAL array plus two SMALL halo-side buffers and stitch each
# slab from up to three sources with static-length DMAs instead:
#   head rows: left-halo buffer (first block) or the local array itself
#   mid  rows: always the local array
#   tail rows: the right COMPOSITE buffer (the local tail planes with the
#              ppermuted right halo appended — see _halo_parts) when the
#              read window crosses the local extent, else the local array
# Block starts use the same overlapping-tail scheme as the ext kernels
# (ob = min(b*bi, L-bi)), so bi need NOT divide L: the composite buffer
# absorbs the tail reads of the last (and, when L % bi < halo, the
# penultimate) block. Eligibility (halo_ok): bi >= the stage halo (so
# interior blocks never touch the side buffers), L >= bi, and bi/L even
# (static fine/coarse plane parity for the transfer kernels). Callers
# fall back to the ext path otherwise.


def halo_ok(L: int, bi: int, halo: int) -> bool:
    # L == bi: single block, head/tail both come from the side buffers.
    # Otherwise the overlapped last block (start L - bi) reads its head
    # from local rows [L - bi - halo, L - bi), hence L >= bi + halo.
    return (bi > 0 and bi % 2 == 0 and L % 2 == 0 and bi >= halo
            and (L == bi or L >= bi + halo))


def _tri_dma(local, lh, rhc, dst, sem3, s, first, kl, mid, kr, L,
             tail_local, do_start):
    """Assemble ``dst`` slab rows [0,kl)+[kl,kl+mid)+[kl+mid,+kr) from
    local rows [s-kl, s+mid+kr) with the out-of-range edges redirected:
    head from ``lh`` on the first block, tail from the composite ``rhc``
    (= local[L-tail_local:] ++ right halo, covering local-row coords
    [L-tail_local, L+kr)) whenever s+mid+kr > L. All lengths static,
    starts dynamic; ``do_start``: start() the copies, else wait() (the
    waits reconstruct the same copies under the same predicates)."""

    def op(c):
        c.start() if do_start else c.wait()

    if kl:
        @pl.when(first)
        def _():
            op(pltpu.make_async_copy(
                lh.at[pl.ds(0, kl)], dst.at[pl.ds(0, kl)], sem3.at[0]))

        @pl.when(jnp.logical_not(first))
        def _():
            op(pltpu.make_async_copy(
                local.at[pl.ds(s - kl, kl)], dst.at[pl.ds(0, kl)],
                sem3.at[0]))
    op(pltpu.make_async_copy(
        local.at[pl.ds(s, mid)], dst.at[pl.ds(kl, mid)], sem3.at[1]))
    if kr:
        t = s + mid
        in_comp = t + kr > L

        @pl.when(in_comp)
        def _():
            op(pltpu.make_async_copy(
                rhc.at[pl.ds(t - (L - tail_local), kr)],
                dst.at[pl.ds(kl + mid, kr)], sem3.at[2]))

        @pl.when(jnp.logical_not(in_comp))
        def _():
            op(pltpu.make_async_copy(
                local.at[pl.ds(t, kr)], dst.at[pl.ds(kl + mid, kr)],
                sem3.at[2]))


def _make_halo_kernel(L, si, sj, sk, bi, halo, nb, n_in, body,
                      with_norm=False):
    """The _make_ext_kernel template with tri-source halo DMA: inputs
    are n_in (local, lh, rhc) triples (rhc = the bi-plane composite
    right buffer, _halo_parts); requires halo_ok(L, bi, halo). Block
    starts overlap at the tail exactly like the ext template
    (ob = min(b*bi, L-bi)), so bi need not divide L.
    ``body(slabs, g0, blk, ob)`` -> out_slab (with_norm:
    (out_slab, part); the body must mask its partial to the NOMINAL
    window [blk*bi, min((blk+1)*bi, L)) so overlapped rows count once)."""

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)

    def in_tri(hbms, ins2, sem_i, v, slot, blk, do_start):
        _tri_dma(hbms[3 * v], hbms[3 * v + 1], hbms[3 * v + 2],
                 ins2.at[v, slot], sem_i.at[v, slot],
                 ob_of(blk), blk == 0, halo, bi, halo, L, bi, do_start)

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gi0_ref, *refs):
        hbms = refs[: 3 * n_in]
        out_hbm = refs[3 * n_in]
        idx = 3 * n_in + 1
        if with_norm:
            nrm_ref = refs[idx]
            idx += 1
        ins2, tile2 = refs[idx], refs[idx + 1]
        idx += 2
        if with_norm:
            acc_ref = refs[idx]
            idx += 1
        sem_i, sem_o = refs[idx], refs[idx + 1]

        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            for v in range(n_in):
                in_tri(hbms, ins2, sem_i, v, slot, i, True)

        @pl.when(i + 1 < nb)
        def _():
            for v in range(n_in):
                in_tri(hbms, ins2, sem_i, v, nslot, i + 1, True)

        for v in range(n_in):
            in_tri(hbms, ins2, sem_i, v, slot, i, False)

        ob = ob_of(i)
        g0 = gi0_ref[0] + ob
        if with_norm:
            out_slab, part = body([ins2[v, slot] for v in range(n_in)],
                                  g0, i, ob)

            @pl.when(i == 0)
            def _():
                acc_ref[0, 0] = jnp.zeros((), ins2.dtype)

            acc_ref[0, 0] = acc_ref[0, 0] + part

            @pl.when(i == nb - 1)
            def _():
                nrm_ref[0, 0] = acc_ref[0, 0]
        else:
            out_slab = body([ins2[v, slot] for v in range(n_in)], g0, i, ob)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        ins2[0, slot] = out_slab  # staging for the ds-read
        tile2[slot] = ins2[0, slot, pl.ds(halo, bi)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def _halo_call(kernel, n_in, L, si, sj, sk, bi, halo, dtype,
               with_norm=False):
    out_shape = [jax.ShapeDtypeStruct((L, sj, sk), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if with_norm:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch = [
        pltpu.VMEM((n_in, 2, si, sj, sk), dtype),
        pltpu.VMEM((2, bi, sj, sk), dtype),
    ]
    if with_norm:
        scratch.append(pltpu.SMEM((1, 1), dtype))
    scratch += [
        pltpu.SemaphoreType.DMA((n_in, 2, 3)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    call = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(L, bi),),
        out_shape=tuple(out_shape) if with_norm else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (3 * n_in),
        out_specs=tuple(out_specs) if with_norm else out_specs[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)


def rb_smooth_halo(u3, f3, gi0, h, n_iter, n, L, red_first=True, block_i=8):
    """rb_smooth_ext without the ext copy: u3/f3 = (local, lh, rhc)
    triples from _halo_parts with a ``2*n_iter``-plane halo and a
    block_i-plane composite tail. Requires halo_ok(L, block_i, 2*n_iter)."""
    _, sj, sk = u3[0].shape
    hh = 2 * n_iter
    rb = _rb_body(h, n_iter, red_first)
    si = block_i + 2 * hh

    def body(slabs, g0, blk, ob):
        eu, ef = slabs
        interior, parity = _slab_masks(n, si, sj, sk, g0)
        return rb(eu, ef, interior, parity)

    nb = pl.cdiv(L, block_i)
    kernel = _make_halo_kernel(L, si, sj, sk, block_i, hh, nb, 2, body)
    return _halo_call(kernel, 2, L, si, sj, sk, block_i, hh, u3[0].dtype)(
        gi0, *u3, *f3
    )


def rb_smooth_from_zero_halo(f3, gi0, h, n_iter, n, L, red_first=True,
                             block_i=8):
    """rb_smooth_halo with an implicit zero initial guess."""
    _, sj, sk = f3[0].shape
    hh = 2 * n_iter
    rb = _rb_body(h, n_iter, red_first)
    si = block_i + 2 * hh

    def body(slabs, g0, blk, ob):
        (ef,) = slabs
        interior, parity = _slab_masks(n, si, sj, sk, g0)
        return rb(jnp.zeros_like(ef), ef, interior, parity)

    nb = pl.cdiv(L, block_i)
    kernel = _make_halo_kernel(L, si, sj, sk, block_i, hh, nb, 1, body)
    return _halo_call(kernel, 1, L, si, sj, sk, block_i, hh, f3[0].dtype)(
        gi0, *f3
    )


def residual_df_norm_halo(uhi3, ulo3, fhi3, flo3, gi0, h, n, L, block_i=8):
    """residual_df_norm_ext without the ext copies (1-plane halo
    buffers). Returns (r_local, partial ||r||^2)."""
    _, sj, sk = uhi3[0].shape
    inv_h2 = 1.0 / (h * h)
    bi = block_i
    si = bi + 2
    nb = pl.cdiv(L, bi)

    def body(slabs, g0, blk, ob):
        u_hi, u_lo, f_hi, f_lo = slabs
        interior, _ = _slab_masks(n, si, sj, sk, g0)

        def slab_nbrs(e):
            x = e[1:-1]
            return x, [
                e[:-2], e[2:],
                _roll(x, 1, 1), _roll(x, -1, 1),
                _roll(x, 1, 2), _roll(x, -1, 2),
            ]

        hi_c, hi_n = slab_nbrs(u_hi)
        lo_c, lo_n = slab_nbrs(u_lo)
        r = _eft_residual(f_hi[1:-1], f_lo[1:-1], hi_c, hi_n, lo_c, lo_n,
                          inv_h2)
        z = jnp.zeros((1, sj, sk), r.dtype)
        r = jnp.concatenate([z, r, z], axis=0)
        r = jnp.where(interior, r, jnp.zeros_like(r))
        # partial over the NOMINAL window so the overlapping tail block
        # counts each row exactly once (matches the ext norm kernel)
        ll = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + ob - 1
        owned = (ll >= blk * bi) & (ll < jnp.minimum((blk + 1) * bi, L))
        part = jnp.sum(jnp.where(owned, r * r, jnp.zeros_like(r)))
        return r, part

    kernel = _make_halo_kernel(L, si, sj, sk, bi, 1, nb, 4, body,
                               with_norm=True)
    r, nrm2 = _halo_call(kernel, 4, L, si, sj, sk, bi, 1, uhi3[0].dtype,
                         with_norm=True)(gi0, *uhi3, *ulo3, *fhi3, *flo3)
    return r, nrm2[0, 0]


def residual_restrict_halo(u3, f3, gi0, h, n, Lc, block_i=8):
    """residual_restrict_ext without the ext copies: the fine slab of
    coarse block b (start c = min(b*bi, Lc-bi)) is stitched as head 2
    rows (lh | local), mid 2*bi rows, tail 1 row (rh | local). Requires
    halo_ok(Lc, block_i, 1) — block_i need not divide Lc (the last block
    overlaps; only it can read the right-halo plane, since for b < nb-1
    the tail row 2c+2bi+1 <= 2*Lc-1 stays local). lh = 2 left planes,
    rh = 1 right plane (plain — no composite needed here)."""
    nc = (n + 1) // 2
    L2, sj, sk = u3[0].shape
    _, sjc, _ = pk.padded_shape(nc)
    skc = pk.coarse_k_width(n, sk)
    bi = block_i
    si = 2 * bi + 3
    nb = pl.cdiv(Lc, bi)
    inv_h2 = 1.0 / (h * h)

    def ob_of(blk):
        return jnp.minimum(blk * bi, Lc - bi)

    def in_tri(hbms, ins2, sem_i, v, slot, blk, do_start):
        _tri_dma(hbms[3 * v], hbms[3 * v + 1], hbms[3 * v + 2],
                 ins2.at[v, slot], sem_i.at[v, slot],
                 2 * ob_of(blk), blk == 0, 2, 2 * bi, 1, L2, 0, do_start)

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gi0_ref, *refs):
        hbms = refs[:6]
        out_hbm = refs[6]
        ins2, tile2, sem_i, sem_o = refs[7:]
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            for v in range(2):
                in_tri(hbms, ins2, sem_i, v, slot, i, True)

        @pl.when(i + 1 < nb)
        def _():
            for v in range(2):
                in_tri(hbms, ins2, sem_i, v, nslot, i + 1, True)

        for v in range(2):
            in_tri(hbms, ins2, sem_i, v, slot, i, False)

        ob = ob_of(i)
        g0 = gi0_ref[0] + 2 * ob
        eu = ins2[0, slot]
        ef = ins2[1, slot]
        interior, _ = _slab_masks(n, si, sj, sk, g0)
        nbr, cen = pk._nbr_sum(eu)
        rr = ef[1:-1] - inv_h2 * (nbr - 6.0 * cen)
        rr = jnp.where(interior[1:-1], rr, jnp.zeros_like(rr))

        dtype = rr.dtype
        aj = _band_matrix(sjc, sj, nc - 2, dtype)
        ak_t = _band_matrix(skc, sk, nc - 2, dtype).T
        jj = jax.lax.broadcasted_iota(jnp.int32, (sjc, skc), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (sjc, skc), 1)
        colmask = (jj >= 1) & (jj <= nc - 2) & (kk >= 1) & (kk <= nc - 2)
        gc0 = (gi0_ref[0] + 2) // 2 + ob

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        for t in range(bi):
            plane = 0.25 * rr[2 * t] + 0.5 * rr[2 * t + 1] + 0.25 * rr[2 * t + 2]
            y = jnp.dot(aj, plane, precision=jax.lax.Precision.HIGHEST)
            z = jnp.dot(y, ak_t, precision=jax.lax.Precision.HIGHEST)
            row_g = gc0 + t
            ok = jnp.logical_and(row_g >= 1, row_g <= nc - 2)
            tile2[slot, t] = jnp.where(
                jnp.logical_and(ok, colmask), z, jnp.zeros_like(z)
            )

        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((Lc, sjc, skc), u3[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, si, sj, sk), u3[0].dtype),
            pltpu.VMEM((2, bi, sjc, skc), u3[0].dtype),
            pltpu.SemaphoreType.DMA((2, 2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)(gi0, *u3, *f3)


def prolong_smooth_halo(ec3, e3, r3, gi0, h, n_iter, n, L, block_i=8):
    """prolong_smooth_ext without the ext copies. Fine streams carry
    H = 2*n_iter halo buffers with a block_i-plane composite tail; the
    coarse stream lh has n_iter planes and its composite tail block_i//2
    local planes + n_iter+1 halo planes. Requires halo_ok(L, block_i, H)
    and block_i >= H+2 (so the coarse head of non-first blocks stays
    local: s/2 - n_iter >= 0 for s >= bi). block_i need not divide L —
    the last block overlaps (its start L - block_i is even because L and
    block_i are, keeping fine/coarse plane parity static)."""
    nc = (n + 1) // 2
    _, sj, sk = e3[0].shape
    Lc2, sjc, skc = ec3[0].shape
    bi = block_i
    H = 2 * n_iter
    si = bi + 2 * H
    sic = si // 2 + 1
    nb = pl.cdiv(L, bi)
    h2 = h * h

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)  # even: L, bi even

    def in_tri_fine(hbms, ins2, sem_i, v, slot, blk, do_start):
        _tri_dma(hbms[3 * v], hbms[3 * v + 1], hbms[3 * v + 2],
                 ins2.at[v, slot], sem_i.at[v, slot],
                 ob_of(blk), blk == 0, H, bi, H, L, bi, do_start)

    def in_tri_coarse(hbms, ec2, sem_c, slot, blk, do_start):
        # coarse slab rows: head n_iter + mid bi//2 + tail n_iter+1 = sic
        _tri_dma(hbms[0], hbms[1], hbms[2],
                 ec2.at[slot], sem_c.at[slot],
                 ob_of(blk) // 2, blk == 0, n_iter, bi // 2, n_iter + 1,
                 Lc2, bi // 2, do_start)

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gi0_ref, *refs):
        chbms = refs[:3]
        fhbms = refs[3:9]
        out_hbm = refs[9]
        ins2, ec2, tile2, sem_i, sem_c, sem_o = refs[10:]
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            for v in range(2):
                in_tri_fine(fhbms, ins2, sem_i, v, slot, i, True)
            in_tri_coarse(chbms, ec2, sem_c, slot, i, True)

        @pl.when(i + 1 < nb)
        def _():
            for v in range(2):
                in_tri_fine(fhbms, ins2, sem_i, v, nslot, i + 1, True)
            in_tri_coarse(chbms, ec2, sem_c, nslot, i + 1, True)

        for v in range(2):
            in_tri_fine(fhbms, ins2, sem_i, v, slot, i, False)
        in_tri_coarse(chbms, ec2, sem_c, slot, i, False)

        g0 = gi0_ref[0] + ob_of(i)
        dtype = ins2.dtype
        pj = _prolong_band_j(sj, sjc, dtype)
        pkt = _prolong_band_kt(skc, sk, dtype)

        yc = []
        for c in range(sic):
            y = jnp.dot(pj, ec2[slot, c], precision=jax.lax.Precision.HIGHEST)
            yc.append(jnp.dot(y, pkt, precision=jax.lax.Precision.HIGHEST))
        corr = []
        for q in range(si):
            if q % 2 == 0:
                corr.append(yc[q // 2])
            else:
                corr.append(0.5 * (yc[q // 2] + yc[q // 2 + 1]))
        corr = jnp.stack(corr, axis=0)
        eu = ins2[0, slot] + corr

        interior, parity = _slab_masks(n, si, sj, sk, g0)
        ef = ins2[1, slot]
        masks = {c: interior[1:-1] & (parity[1:-1] == c)
                 for c in (pk.BLACK, pk.RED)}
        h2ef = h2 * ef[1:-1]
        for _ in range(n_iter):
            for c in (pk.BLACK, pk.RED):  # postSmoother order
                nbr, cen = pk._nbr_sum(eu)
                upd = (nbr - h2ef) * (1.0 / 6.0)
                mid = jnp.where(masks[c], upd, cen)
                eu = jnp.concatenate([eu[:1], mid, eu[-1:]], axis=0)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        ins2[0, slot] = eu
        tile2[slot] = ins2[0, slot, pl.ds(H, bi)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((L, sj, sk), e3[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 9,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, si, sj, sk), e3[0].dtype),
            pltpu.VMEM((2, sic, sjc, skc), e3[0].dtype),
            pltpu.VMEM((2, bi, sj, sk), e3[0].dtype),
            pltpu.SemaphoreType.DMA((2, 2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)(gi0, *ec3, *e3, *r3)
