"""Sharded-local fused Pallas kernels for the 2D (i, j) mesh.

The 1D ext kernels (ops.pallas_sharded) assume j/k unsharded. Here BOTH
the i axis (outer planes) and the j axis (the TPU sublane axis) are
sharded; k (the lane axis) stays unsharded. This is the kernel tier the
2D decomposition needs for constant-volume weak scaling past the 1D
plan's plane budget (docs/SCALING.md; the reference's worksharing-
inside-kernels principle, /root/reference/mg_3d.h:658, 681, 807).

Geometry contract (caller: parallel/sharded2d_padded.py):

  * A level stores local blocks (Li, SJL, SK): Li local i planes, SJL
    local j columns (a multiple of 8 on every Pallas-active level — the
    sublane tile), SK = rup(n, 128) full lane-padded k width.
  * Kernels take halo-extended blocks (Li + 2*Hi, SJL + 16, SK): the
    caller ppermutes Hi neighbor planes per side over the i mesh axis
    and a FIXED 8 columns per side over the j mesh axis (8 >= any
    fusion window with n_smooth <= 4, and keeps every sublane slice
    8-aligned — Mosaic wants tile-aligned minor-dim windows). Chain
    ends receive zeros (the correction-field boundary).
  * ``gij0`` — (2,) int32 SMEM operand [global i of ext row 0, global j
    of ext col 0] — feeds the interior/parity masks (RED = global
    (i+j+k) odd, mg_3d.h:669/693); both axis_index values are traced
    inside shard_map.
  * Outputs are the (Li, SJL, SK) owned region only; halo rows/cols are
    recomputed redundantly and discarded (identical on every device by
    construction).

The j transfer taps (restriction / interpolation) are LOCAL band
matrices built from iota inside the kernel — shard alignment makes the
coarse<->fine ext-column mapping static (fine ext col x of coarse local
c: x = 2c + 8 +- 1), with global-index row masks for the domain
boundary. k taps reuse the full-width bands of ops.pallas3d.
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
    _prolong_band_kt,
    _roll,
)
from multigrid_parallel_tpu.ops.pallas_sharded import (
    _go_no_x64,
    _tri_dma,
    halo_ok,
)

HJ = 8  # fixed j halo (columns per side); covers n_smooth <= 4


def _slab_masks2d(n, si, sje, sk, gi0, gj0):
    """Interior + parity masks for an (si, sje, sk) slab at global
    origin (gi0, gj0) (k is global already)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + gi0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, sje, 1), 1) + gj0
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sk), 2)
    interior = (
        (ii >= 1) & (ii <= n - 2) & (jj >= 1) & (jj <= n - 2)
        & (kk >= 1) & (kk <= n - 2)
    )
    parity = (ii + jj + kk) % 2
    return interior, parity


def ext2d_block_i(L, sje, sk, halo, n_in, itemsize=4, requested=8):
    """block_i for the generic ext2d kernels, or 0 (see pallas_sharded.
    ext_block_i — same estimate with the j-extended plane size)."""
    plane = sje * sk * itemsize
    for bi in (requested, 16, 12, 8, 6, 4, 2):
        if bi > requested or bi % 2:
            continue
        si = bi + 2 * halo
        est = 2 * n_in * si * plane + 3 * si * plane + 2 * bi * plane
        if est <= _VMEM_BUDGET and L >= bi:
            return bi
    return 0


def restrict2d_block_i(Lc, sje, sk, itemsize=4, requested=8):
    plane = sje * sk * itemsize
    for bi in (requested, 8, 4, 2):
        if bi > requested:
            continue
        si = 2 * bi + 3
        est = 2 * 2 * si * plane + 3 * si * plane
        if est <= _VMEM_BUDGET and Lc >= bi:
            return bi
    return 0


def prolong2d_block_i(L, sje, sk, n_iter, itemsize=4, requested=8):
    plane = sje * sk * itemsize
    for bi in (requested, 8, 4, 2):
        if bi > requested or bi % 2:
            continue
        si = bi + 4 * n_iter
        est = 2 * 2 * si * plane + 4 * si * plane + 2 * bi * plane
        if est <= _VMEM_BUDGET and L >= bi:
            return bi
    return 0


# ------------------------------------------------- generic ext2d template


def _make_ext2d_kernel(L, si, sje, sjl, sk, bi, halo_i, nb, n_in, body):
    """Like pallas_sharded._make_ext_kernel with a j-extended slab: block
    b reads ext rows [ob, ob+si) x ALL sje j columns, and writes the
    owned (bi, sjl) window of ``body(slabs, gi0_slab, gj0)`` to
    out[ob : ob+bi)."""

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

    def kernel(gij0_ref, *refs):
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

        g0 = gij0_ref[0] + ob_of(i)
        gj0 = gij0_ref[1]
        out_slab = body([ins2[v, slot] for v in range(n_in)], g0, gj0)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        ins2[0, slot] = out_slab
        tile2[slot] = ins2[0, slot, pl.ds(halo_i, bi), pl.ds(HJ, sjl)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def _ext2d_call(kernel, n_in, L, si, sje, sjl, sk, bi, dtype):
    call = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(L, bi),),
        out_shape=jax.ShapeDtypeStruct((L, sjl, sk), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_in, 2, si, sje, sk), dtype),
            pltpu.VMEM((2, bi, sjl, sk), dtype),
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


def _rb_body2d(h, n_iter, red_first, n, si, sje, sk):
    """RB half-sweeps on a j-extended slab; masks from global (i, j)."""
    h2 = h * h
    colors = (pk.RED, pk.BLACK) if red_first else (pk.BLACK, pk.RED)

    def body(eu, ef, g0, gj0):
        interior, parity = _slab_masks2d(n, si, sje, sk, g0, gj0)
        masks = {c: interior[1:-1] & (parity[1:-1] == c) for c in set(colors)}
        h2ef = h2 * ef[1:-1]
        for _ in range(n_iter):
            for c in colors:
                nbr, cen = pk._nbr_sum(eu)
                upd = (nbr - h2ef) * (1.0 / 6.0)
                mid = jnp.where(masks[c], upd, cen)
                eu = jnp.concatenate([eu[:1], mid, eu[-1:]], axis=0)
        return eu

    return body


# ------------------------------------------------------ public kernels


def rb_smooth_ext2d(u_ext, f_ext, gij0, h, n_iter, n, L, sjl, red_first=True,
                    block_i=8):
    """All 2*n_iter RB half-sweeps on a 2D-sharded local block. u_ext /
    f_ext: (L + 4*n_iter, SJL + 16, SK). Returns (L, SJL, SK)."""
    _, sje, sk = u_ext.shape
    hh = 2 * n_iter
    si = block_i + 2 * hh
    rb = _rb_body2d(h, n_iter, red_first, n, si, sje, sk)

    def body(slabs, g0, gj0):
        eu, ef = slabs
        return rb(eu, ef, g0, gj0)

    nb = pl.cdiv(L, block_i)
    kernel = _make_ext2d_kernel(L, si, sje, sjl, sk, block_i, hh, nb, 2, body)
    return _ext2d_call(kernel, 2, L, si, sje, sjl, sk, block_i, u_ext.dtype)(
        gij0, u_ext, f_ext
    )


def rb_smooth_from_zero_ext2d(f_ext, gij0, h, n_iter, n, L, sjl,
                              red_first=True, block_i=8):
    """rb_smooth_ext2d with an implicit zero initial guess."""
    _, sje, sk = f_ext.shape
    hh = 2 * n_iter
    si = block_i + 2 * hh
    rb = _rb_body2d(h, n_iter, red_first, n, si, sje, sk)

    def body(slabs, g0, gj0):
        (ef,) = slabs
        return rb(jnp.zeros_like(ef), ef, g0, gj0)

    nb = pl.cdiv(L, block_i)
    kernel = _make_ext2d_kernel(L, si, sje, sjl, sk, block_i, hh, nb, 1, body)
    return _ext2d_call(kernel, 1, L, si, sje, sjl, sk, block_i, f_ext.dtype)(
        gij0, f_ext
    )


# --------------------------------------- fused residual + restrict (2D)


def _restrict_band_j2d(rows, cols, gcj0, nc, dtype):
    """(coarse local+pad rows, fine ext cols) LOCAL 3-tap band: row c
    taps fine ext cols 2c + HJ +- 1 (alignment makes this static).
    Rows whose GLOBAL coarse j (gcj0 + c) is outside [1, nc-2] zeroed."""
    a = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    d = b - (2 * a + HJ)
    val = jnp.where(
        d == 0, 0.5, jnp.where(jnp.abs(d) == 1, 0.25, 0.0)
    ).astype(dtype)
    gr = a + gcj0
    row_ok = (gr >= 1) & (gr <= nc - 2)
    return jnp.where(row_ok, val, jnp.zeros_like(val))


def _make_residual_restrict_ext2d_kernel(n, nc, Lc, si, sje, sk, bi, sjlc,
                                         skc, h, nb):
    """Residual + full-weighting restriction on a 2D-sharded block:
    block b covers bi COARSE local planes; fine slab = ext rows
    [2*ob, 2*ob + 2*bi + 3). j taps: LOCAL band matmul; k taps:
    full-width band (pallas3d._band_matrix)."""
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

    def kernel(gij0_ref, u_hbm, f_hbm, out_hbm, ins2, tile2, sem_i, sem_o):
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
        g0 = gij0_ref[0] + 2 * ob  # fine global of slab row 0
        gj0 = gij0_ref[1]          # fine global of ext col 0
        eu = ins2[0, slot]
        ef = ins2[1, slot]
        interior, _ = _slab_masks2d(n, si, sje, sk, g0, gj0)
        nbr, cen = pk._nbr_sum(eu)
        rr = ef[1:-1] - inv_h2 * (nbr - 6.0 * cen)
        rr = jnp.where(interior[1:-1], rr, jnp.zeros_like(rr))

        dtype = rr.dtype
        # coarse global j of coarse local col 0: (gj0 + HJ) // 2
        gcj0 = (gj0 + HJ) // 2
        aj = _restrict_band_j2d(sjlc, sje, gcj0, nc, dtype)
        ak_t = _band_matrix(skc, sk, nc - 2, dtype).T
        kk = jax.lax.broadcasted_iota(jnp.int32, (sjlc, skc), 1)
        colmask = (kk >= 1) & (kk <= nc - 2)
        gc0 = (gij0_ref[0] + 2) // 2 + ob  # coarse global i of out row ob

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


def residual_restrict_ext2d(u_ext, f_ext, gij0, h, n, Lc, sjlc, skc,
                            block_i=8):
    """Fused residual + restriction: fine ext (L+4, SJL+16, SK) ->
    coarse local (Lc, SJLC, SKc). gij0 = [axis_i*L - 2, axis_j*SJL - HJ]."""
    nc = (n + 1) // 2
    _, sje, sk = u_ext.shape
    bi = block_i
    si = 2 * bi + 3
    nb = pl.cdiv(Lc, bi)
    kernel = _make_residual_restrict_ext2d_kernel(
        n, nc, Lc, si, sje, sk, bi, sjlc, skc, h, nb
    )
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((Lc, sjlc, skc), u_ext.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, si, sje, sk), u_ext.dtype),
            pltpu.VMEM((2, bi, sjlc, skc), u_ext.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)(gij0, u_ext, f_ext)


# -------------------------- fused prolong + correct + post-smooth (2D)


def _prolong_band_j2d(rows, cols, dtype):
    """(fine ext rows, coarse ext cols) LOCAL interpolation band: fine
    ext col x <- coarse ext cols around (x - HJ)/2 + HJ (both exts carry
    an HJ halo; alignment makes the mapping static): 1 at d == 0, 0.5 at
    |d| == 1 where d = x - 2c + HJ."""
    a = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    d = a - (2 * b - HJ)
    return jnp.where(
        d == 0, 1.0, jnp.where(jnp.abs(d) == 1, 0.5, 0.0)
    ).astype(dtype)


def _make_prolong_smooth_ext2d_kernel(n, nc, L, si, sic, sje, sjec, sk, skc,
                                      bi, h, n_iter, nb):
    """e' = post_smooth(e + P(ec), r) on a 2D-sharded block in one pass.

    Fine ext halos: i = 2*n_iter, j = HJ. Coarse ext halos: i = n_iter+1,
    j = HJ (the caller ppermutes HJ coarse columns; only HJ//2 + 1 are
    consumed, the rest ride along for alignment)."""
    h2 = h * h
    H = 2 * n_iter

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)  # even: L, bi even

    def in_dma_fine(hbm, ref2, sem2, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(ob_of(blk), si)], ref2.at[slot], sem2.at[slot]
        )

    def in_dma_coarse(hbm, ref2, sem2, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(ob_of(blk) // 2 + 1, sic)], ref2.at[slot],
            sem2.at[slot]
        )

    def out_dma(out_hbm, tile2, sem2, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem2.at[slot]
        )

    def kernel(gij0_ref, ec_hbm, u_hbm, f_hbm, out_hbm, eu2, ef2, ec2, tile2,
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

        g0 = gij0_ref[0] + ob_of(i)
        gj0 = gij0_ref[1]
        dtype = eu2.dtype
        pj = _prolong_band_j2d(sje, sjec, dtype)
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

        interior, parity = _slab_masks2d(n, si, sje, sk, g0, gj0)
        ef = ef2[slot]
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

        eu2[slot, :] = eu
        sjl = tile2.shape[2]
        tile2[slot] = eu2[slot, pl.ds(H, bi), pl.ds(HJ, sjl)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def prolong_smooth_ext2d(ec_ext, e_ext, r_ext, gij0, h, n_iter, n, L, sjl,
                         block_i=8):
    """post_smooth(e + trilinear(ec), r) fused on a 2D-sharded block.

    e_ext/r_ext: (L + 4*n_iter, SJL + 16, SK); ec_ext: (L//2 + 2*(n_iter
    + 1), SJL//2 + 16, SKc). gij0 = [axis_i*L - 2*n_iter, axis_j*SJL -
    HJ] (fine indices; the coarse j origin is (gj0 + HJ)//2 - HJ)."""
    nc = (n + 1) // 2
    _, sje, sk = e_ext.shape
    _, sjec, skc = ec_ext.shape
    bi = block_i
    H = 2 * n_iter
    si = bi + 2 * H
    sic = si // 2 + 1
    nb = pl.cdiv(L, bi)
    kernel = _make_prolong_smooth_ext2d_kernel(
        n, nc, L, si, sic, sje, sjec, sk, skc, bi, h, n_iter, nb
    )
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((L, sjl, sk), e_ext.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, si, sje, sk), e_ext.dtype),
            pltpu.VMEM((2, si, sje, sk), e_ext.dtype),
            pltpu.VMEM((2, sic, sjec, skc), e_ext.dtype),
            pltpu.VMEM((2, bi, sjl, sk), e_ext.dtype),
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
    return _go_no_x64(call)(gij0, ec_ext, e_ext, r_ext)


# -------------------------------------- fused df residual + partial norm


def _make_residual_df_norm_ext2d_kernel(n, L, si, sje, sjl, sk, bi, h, nb):
    """EFT double-float residual on a 2D-sharded block + this device's
    partial ||r||^2 over OWNED rows and columns."""
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

    def kernel(gij0_ref, uhi_hbm, ulo_hbm, fhi_hbm, flo_hbm, out_hbm, nrm_ref,
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
        g0 = gij0_ref[0] + ob
        gj0 = gij0_ref[1]
        interior, _ = _slab_masks2d(n, si, sje, sk, g0, gj0)

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
        r = _eft_residual(f_hi[1:-1], f_lo[1:-1], hi_c, hi_n, lo_c, lo_n,
                          inv_h2)
        z = jnp.zeros((1, sje, sk), r.dtype)
        r = jnp.concatenate([z, r, z], axis=0)
        r = jnp.where(interior, r, jnp.zeros_like(r))

        # partial ||r||^2 over OWNED rows AND columns only
        ll = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + ob - 1
        owned_i = (ll >= i * bi) & (ll < jnp.minimum((i + 1) * bi, L))
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, sje, 1), 1)
        owned_j = (jj >= HJ) & (jj < HJ + sjl)
        owned = owned_i & owned_j
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
        tile2[slot] = ins2[0, slot, pl.ds(1, bi), pl.ds(HJ, sjl)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def residual_df_norm_ext2d(uhi_ext, ulo_ext, fhi_ext, flo_ext, gij0, h, n, L,
                           sjl, block_i=8):
    """(r_local (L, SJL, SK), partial ||r||^2) — caller psums the partial
    over BOTH mesh axes. Ext arrays carry a 1-plane i halo + HJ j halo."""
    _, sje, sk = uhi_ext.shape
    bi = block_i
    si = bi + 2
    nb = pl.cdiv(L, bi)
    kernel = _make_residual_df_norm_ext2d_kernel(n, L, si, sje, sjl, sk, bi,
                                                 h, nb)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((L, sjl, sk), uhi_ext.dtype),
            jax.ShapeDtypeStruct((1, 1), uhi_ext.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 2, si, sje, sk), uhi_ext.dtype),
            pltpu.VMEM((2, bi, sjl, sk), uhi_ext.dtype),
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
    r, nrm2 = _go_no_x64(call)(gij0, uhi_ext, ulo_ext, fhi_ext, flo_ext)
    return r, nrm2[0, 0]


# ---------------- i-axis halo-DMA variants (j-ext stays materialized) --
# The ext2d kernels read an array materialized with BOTH halos
# concatenated on: _halo_ext_j(_halo_ext_i(x)) — i.e. TWO full extra
# HBM write+read passes of every stream per stage (the 2D tier's
# "pays the copy twice" tax, docs/SCALING.md). These variants drop the
# i-axis concatenate the same way ops.pallas_sharded's 1D halo tier
# does: inputs are (B, lh, rhc) triples where B is the J-EXTENDED local
# array (the one remaining materialized copy — j stitching would need
# sublane-tiled DMA windows per source, a further lever), lh/rhc are
# small j-extended i-edge buffers, and each block's slab is assembled
# in-kernel by _tri_dma with the same overlapping-tail block scheme
# (ob = min(b*bi, L-bi); bi need not divide L). Corner (diagonal-
# neighbor) values ride along because lh/rhc are ppermuted from the
# already-j-extended B. Eligibility: halo_ok(L, bi, halo_i).


def _tri_dma2d(x, jl, jr, lh, rhc, dst, sem9, s, first, kl, mid, kr, L,
               tail_local, Lj, do_start):
    """Fully copy-free slab assembly for the 2D tier: stitch ``dst``
    (rows [0,kl)+[kl,kl+mid)+[kl+mid,+kr) x j cols [0,HJ)+[HJ,HJ+Lj)+
    [HJ+Lj,+HJ)) from the RAW local array ``x`` (Li, Lj, K), the
    j-halo buffers ``jl``/``jr`` (Li, HJ, K), and the J-EXTENDED i-edge
    buffers ``lh`` (kl, sje, K) / ``rhc`` (tail_local+kr, sje, K).
    Up to 9 DMAs per slab. Alignment: only the MINOR (lane/k) dim needs
    Mosaic tile alignment, and every window here spans the full k
    extent; the j windows land on the SUBLANE dim, where offsets need
    not be 8-aligned. On the fine levels they are anyway (HJ == 8 and
    the _use_pallas2d gate's Lj % 8 == 0); prolong's coarse slab
    (Lj = sjlc = sjl//2) may be sublane-unaligned (e.g. sjlc=68 under
    the 7%-cap 257^3 1x1 plan) — validated under real Mosaic by stage E
    of scripts/tpu_sharded_compile.py (whole-solve convergence match)
    and bitwise in tests/test_halo_kernels.py at sjlc % 8 != 0. Same
    overlap/composite predicates as _tri_dma (pallas_sharded)."""

    def op(c):
        c.start() if do_start else c.wait()

    def row3(rows_start, n_rows, dst_r0, sem0):
        # one i-row range from the three j sources
        op(pltpu.make_async_copy(
            jl.at[pl.ds(rows_start, n_rows)],
            dst.at[pl.ds(dst_r0, n_rows), pl.ds(0, HJ)], sem9.at[sem0]))
        op(pltpu.make_async_copy(
            x.at[pl.ds(rows_start, n_rows)],
            dst.at[pl.ds(dst_r0, n_rows), pl.ds(HJ, Lj)], sem9.at[sem0 + 1]))
        op(pltpu.make_async_copy(
            jr.at[pl.ds(rows_start, n_rows)],
            dst.at[pl.ds(dst_r0, n_rows), pl.ds(HJ + Lj, HJ)],
            sem9.at[sem0 + 2]))

    if kl:
        @pl.when(first)
        def _():
            op(pltpu.make_async_copy(
                lh.at[pl.ds(0, kl)], dst.at[pl.ds(0, kl)], sem9.at[0]))

        @pl.when(jnp.logical_not(first))
        def _():
            row3(s - kl, kl, 0, 0)
    row3(s, mid, kl, 3)
    if kr:
        t = s + mid
        in_comp = t + kr > L

        @pl.when(in_comp)
        def _():
            op(pltpu.make_async_copy(
                rhc.at[pl.ds(t - (L - tail_local), kr)],
                dst.at[pl.ds(kl + mid, kr)], sem9.at[6]))

        @pl.when(jnp.logical_not(in_comp))
        def _():
            row3(t, kr, kl + mid, 6)


def _stitch(srcs, dst, sem, s, first, kl, mid, kr, L, tail_local, Lj,
            do_start):
    """One slab assembly, dispatched by source arity: (x, jl, jr, lh,
    rhc) 5-tuples take the fully copy-free j-DMA stitch (_tri_dma2d),
    (B, lh, rhc) triples the j-extended i-halo stitch (_tri_dma; ``Lj``
    unused). Shared by all four halo2d kernel families so the stitch
    signature has a single dispatch point."""
    if len(srcs) == 5:
        _tri_dma2d(*srcs, dst, sem, s, first, kl, mid, kr, L, tail_local,
                   Lj, do_start)
    else:
        _tri_dma(*srcs, dst, sem, s, first, kl, mid, kr, L, tail_local,
                 do_start)


def _make_halo2d_kernel(L, si, sje, sjl, sk, bi, halo_i, nb, n_in, body,
                        with_norm=False, jdma=False):
    """_make_ext2d_kernel with tri-source i-halo DMA: inputs are n_in
    (B, lh, rhc) triples of j-extended arrays — or, with ``jdma=True``,
    n_in (x, jl, jr, lh, rhc) 5-tuples where the j extension is also
    stitched in-kernel (_tri_dma2d; no materialized copies at all).
    ``body(slabs, g0, gj0, blk, ob)`` -> out_slab (with_norm:
    (out_slab, part) — the body must mask its partial to the NOMINAL
    window [blk*bi, min((blk+1)*bi, L)) so overlapped rows count
    once)."""
    n_src = 5 if jdma else 3

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)

    def in_tri(hbms, ins2, sem_i, v, slot, blk, do_start):
        srcs = hbms[n_src * v: n_src * (v + 1)]
        _stitch(srcs, ins2.at[v, slot], sem_i.at[v, slot],
                ob_of(blk), blk == 0, halo_i, bi, halo_i, L, bi,
                sjl, do_start)

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gij0_ref, *refs):
        hbms = refs[: n_src * n_in]
        out_hbm = refs[n_src * n_in]
        idx = n_src * n_in + 1
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
        g0 = gij0_ref[0] + ob
        gj0 = gij0_ref[1]
        if with_norm:
            out_slab, part = body([ins2[v, slot] for v in range(n_in)],
                                  g0, gj0, i, ob)

            @pl.when(i == 0)
            def _():
                acc_ref[0, 0] = jnp.zeros((), ins2.dtype)

            acc_ref[0, 0] = acc_ref[0, 0] + part

            @pl.when(i == nb - 1)
            def _():
                nrm_ref[0, 0] = acc_ref[0, 0]
        else:
            out_slab = body([ins2[v, slot] for v in range(n_in)], g0, gj0,
                            i, ob)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        ins2[0, slot] = out_slab
        tile2[slot] = ins2[0, slot, pl.ds(halo_i, bi), pl.ds(HJ, sjl)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


def _halo2d_call(kernel, n_in, L, si, sje, sjl, sk, bi, dtype,
                 with_norm=False, jdma=False):
    n_src = 5 if jdma else 3
    out_shape = [jax.ShapeDtypeStruct((L, sjl, sk), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if with_norm:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch = [
        pltpu.VMEM((n_in, 2, si, sje, sk), dtype),
        pltpu.VMEM((2, bi, sjl, sk), dtype),
    ]
    if with_norm:
        scratch.append(pltpu.SMEM((1, 1), dtype))
    scratch += [
        pltpu.SemaphoreType.DMA((n_in, 2, 9 if jdma else 3)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    call = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(L, bi),),
        out_shape=tuple(out_shape) if with_norm else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (n_src * n_in),
        out_specs=tuple(out_specs) if with_norm else out_specs[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)


def rb_smooth_halo2d(u3, f3, gij0, h, n_iter, n, L, sjl, red_first=True,
                     block_i=8):
    """rb_smooth_ext2d without the i-ext copy: u3/f3 = (B, lh, rhc)
    triples of j-extended arrays with a 2*n_iter i halo and a
    block_i-plane composite tail — or (x, jl, jr, lh, rhc) 5-tuples
    (_halo_parts2dj) for the fully copy-free j-DMA path. Requires
    halo_ok(L, block_i, 2*n_iter)."""
    jdma = len(u3) == 5
    sje = sjl + 2 * HJ
    sk = u3[0].shape[2]
    hh = 2 * n_iter
    si = block_i + 2 * hh
    rb = _rb_body2d(h, n_iter, red_first, n, si, sje, sk)

    def body(slabs, g0, gj0, blk, ob):
        eu, ef = slabs
        return rb(eu, ef, g0, gj0)

    nb = pl.cdiv(L, block_i)
    kernel = _make_halo2d_kernel(L, si, sje, sjl, sk, block_i, hh, nb, 2,
                                 body, jdma=jdma)
    return _halo2d_call(kernel, 2, L, si, sje, sjl, sk, block_i,
                        u3[0].dtype, jdma=jdma)(gij0, *u3, *f3)


def rb_smooth_from_zero_halo2d(f3, gij0, h, n_iter, n, L, sjl,
                               red_first=True, block_i=8):
    """rb_smooth_halo2d with an implicit zero initial guess."""
    jdma = len(f3) == 5
    sje = sjl + 2 * HJ
    sk = f3[0].shape[2]
    hh = 2 * n_iter
    si = block_i + 2 * hh
    rb = _rb_body2d(h, n_iter, red_first, n, si, sje, sk)

    def body(slabs, g0, gj0, blk, ob):
        (ef,) = slabs
        return rb(jnp.zeros_like(ef), ef, g0, gj0)

    nb = pl.cdiv(L, block_i)
    kernel = _make_halo2d_kernel(L, si, sje, sjl, sk, block_i, hh, nb, 1,
                                 body, jdma=jdma)
    return _halo2d_call(kernel, 1, L, si, sje, sjl, sk, block_i,
                        f3[0].dtype, jdma=jdma)(gij0, *f3)


def residual_df_norm_halo2d(uhi3, ulo3, fhi3, flo3, gij0, h, n, L, sjl,
                            block_i=8):
    """residual_df_norm_ext2d without the i-ext copies (1-plane i-halo
    buffers; triples or j-DMA 5-tuples). Returns (r_local, partial
    ||r||^2 over owned rows+cols)."""
    jdma = len(uhi3) == 5
    sje = sjl + 2 * HJ
    sk = uhi3[0].shape[2]
    inv_h2 = 1.0 / (h * h)
    bi = block_i
    si = bi + 2
    nb = pl.cdiv(L, bi)

    def body(slabs, g0, gj0, blk, ob):
        u_hi, u_lo, f_hi, f_lo = slabs
        interior, _ = _slab_masks2d(n, si, sje, sk, g0, gj0)

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
        z = jnp.zeros((1, sje, sk), r.dtype)
        r = jnp.concatenate([z, r, z], axis=0)
        r = jnp.where(interior, r, jnp.zeros_like(r))
        ll = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + ob - 1
        owned_i = (ll >= blk * bi) & (ll < jnp.minimum((blk + 1) * bi, L))
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, sje, 1), 1)
        owned_j = (jj >= HJ) & (jj < HJ + sjl)
        part = jnp.sum(jnp.where(owned_i & owned_j, r * r,
                                 jnp.zeros_like(r)))
        return r, part

    kernel = _make_halo2d_kernel(L, si, sje, sjl, sk, bi, 1, nb, 4, body,
                                 with_norm=True, jdma=jdma)
    r, nrm2 = _halo2d_call(kernel, 4, L, si, sje, sjl, sk, bi,
                           uhi3[0].dtype, with_norm=True, jdma=jdma)(
        gij0, *uhi3, *ulo3, *fhi3, *flo3)
    return r, nrm2[0, 0]


def residual_restrict_halo2d(u3, f3, gij0, h, n, Lc, sjlc, skc, block_i=8,
                             sjl=None):
    """residual_restrict_ext2d without the i-ext copies: the fine slab of
    coarse block b (start c = min(b*bi, Lc-bi)) is stitched from the
    j-extended triples as head 2 / mid 2*bi / tail 1 rows (the tail can
    only cross into the right buffer on the last block — see
    pallas_sharded.residual_restrict_halo), or from (x, jl, jr, lh, rhc)
    5-tuples on the fully copy-free j-DMA path (the fine local j extent
    is read off the raw array; the ``sjl`` kwarg is kept for caller
    symmetry and checked when given). Requires halo_ok(Lc, bi, 1)."""
    jdma = len(u3) == 5
    nc = (n + 1) // 2
    L2 = u3[0].shape[0]
    sk = u3[0].shape[2]
    if jdma:
        assert sjl is None or sjl == u3[0].shape[1], (sjl, u3[0].shape)
        sjl = u3[0].shape[1]
    sje = (sjl + 2 * HJ) if jdma else u3[0].shape[1]
    n_src = 5 if jdma else 3
    bi = block_i
    si = 2 * bi + 3
    nb = pl.cdiv(Lc, bi)
    inv_h2 = 1.0 / (h * h)

    def ob_of(blk):
        return jnp.minimum(blk * bi, Lc - bi)

    def in_tri(hbms, ins2, sem_i, v, slot, blk, do_start):
        srcs = hbms[n_src * v: n_src * (v + 1)]
        _stitch(srcs, ins2.at[v, slot], sem_i.at[v, slot],
                2 * ob_of(blk), blk == 0, 2, 2 * bi, 1, L2, 0,
                sjl, do_start)

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gij0_ref, *refs):
        hbms = refs[: 2 * n_src]
        out_hbm = refs[2 * n_src]
        ins2, tile2, sem_i, sem_o = refs[2 * n_src + 1:]
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
        g0 = gij0_ref[0] + 2 * ob
        gj0 = gij0_ref[1]
        eu = ins2[0, slot]
        ef = ins2[1, slot]
        interior, _ = _slab_masks2d(n, si, sje, sk, g0, gj0)
        nbr, cen = pk._nbr_sum(eu)
        rr = ef[1:-1] - inv_h2 * (nbr - 6.0 * cen)
        rr = jnp.where(interior[1:-1], rr, jnp.zeros_like(rr))

        dtype = rr.dtype
        gcj0 = (gij0_ref[1] + HJ) // 2
        aj = _restrict_band_j2d(sjlc, sje, gcj0, nc, dtype)
        ak_t = _band_matrix(skc, sk, nc - 2, dtype).T
        kk = jax.lax.broadcasted_iota(jnp.int32, (sjlc, skc), 1)
        colmask = (kk >= 1) & (kk <= nc - 2)
        gc0 = (gij0_ref[0] + 2) // 2 + ob

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
        out_shape=jax.ShapeDtypeStruct((Lc, sjlc, skc), u3[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_src),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, si, sje, sk), u3[0].dtype),
            pltpu.VMEM((2, bi, sjlc, skc), u3[0].dtype),
            pltpu.SemaphoreType.DMA((2, 2, 9 if jdma else 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)(gij0, *u3, *f3)


def prolong_smooth_halo2d(ec3, e3, r3, gij0, h, n_iter, n, L, sjl,
                          block_i=8):
    """prolong_smooth_ext2d without the i-ext copies. Fine triples carry
    H = 2*n_iter i-halo buffers with a block_i-plane composite tail; the
    coarse triple lh has n_iter rows and its composite tail block_i//2
    local rows + n_iter+1 halo rows (all j-extended) — or all three as
    (x, jl, jr, lh, rhc) 5-tuples for the fully copy-free j-DMA path.
    Requires halo_ok(L, block_i, H) and block_i >= H+2."""
    jdma = len(e3) == 5
    n_src = 5 if jdma else 3
    nc = (n + 1) // 2
    sk = e3[0].shape[2]
    sje = (sjl + 2 * HJ) if jdma else e3[0].shape[1]
    Lc2, skc = ec3[0].shape[0], ec3[0].shape[2]
    sjlc = sjl // 2
    sjec = (sjlc + 2 * HJ) if jdma else ec3[0].shape[1]
    bi = block_i
    H = 2 * n_iter
    si = bi + 2 * H
    sic = si // 2 + 1
    nb = pl.cdiv(L, bi)
    h2 = h * h

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)  # even: L, bi even

    def in_tri_fine(hbms, ins2, sem_i, v, slot, blk, do_start):
        srcs = hbms[n_src * v: n_src * (v + 1)]
        _stitch(srcs, ins2.at[v, slot], sem_i.at[v, slot],
                ob_of(blk), blk == 0, H, bi, H, L, bi, sjl, do_start)

    def in_tri_coarse(hbms, ec2, sem_c, slot, blk, do_start):
        # On the j-DMA path the coarse slab's j windows are sublane-
        # unaligned whenever sjlc % 8 != 0 — allowed (see _tri_dma2d).
        _stitch(hbms[:n_src], ec2.at[slot], sem_c.at[slot],
                ob_of(blk) // 2, blk == 0, n_iter, bi // 2,
                n_iter + 1, Lc2, bi // 2, sjlc, do_start)

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gij0_ref, *refs):
        chbms = refs[:n_src]
        fhbms = refs[n_src: 3 * n_src]
        out_hbm = refs[3 * n_src]
        ins2, ec2, tile2, sem_i, sem_c, sem_o = refs[3 * n_src + 1:]
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

        g0 = gij0_ref[0] + ob_of(i)
        gj0 = gij0_ref[1]
        dtype = ins2.dtype
        pj = _prolong_band_j2d(sje, sjec, dtype)
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

        interior, parity = _slab_masks2d(n, si, sje, sk, g0, gj0)
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
        tile2[slot] = ins2[0, slot, pl.ds(H, bi), pl.ds(HJ, sjl)]
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
        out_shape=jax.ShapeDtypeStruct((L, sjl, sk), e3[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (3 * n_src),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, si, sje, sk), e3[0].dtype),
            pltpu.VMEM((2, sic, sjec, skc), e3[0].dtype),
            pltpu.VMEM((2, bi, sjl, sk), e3[0].dtype),
            pltpu.SemaphoreType.DMA((2, 2, 9 if jdma else 3)),
            pltpu.SemaphoreType.DMA((2, 9 if jdma else 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call)(gij0, *ec3, *e3, *r3)
