"""Fused Pallas kernels for the mixed-BC (electrospray) smoother.

The mg_3d_bkup.c physics problem (mixed Dirichlet patches + homogeneous
Neumann) on the padded performance layout: the per-half-sweep BC
enforcement — whole-face Neumann copies in x, y, z order followed by
the Dirichlet pin (ops.stencils_3d.apply_neumann_copy +
mixed_bc._apply_bcs) — runs INSIDE the streaming smoother kernel:

  * j/k face copies are sublane/lane roll-selects (u[:,0] = u[:,1] is
    where(jj==0, roll(u,-1,1), u), etc.) — pure VPU work per plane;
  * i (x) face copies are slab-row shifts, active only in the
    boundary-anchored blocks;
  * the Dirichlet patches live only on the two x faces; their masks
    arrive as a tiny (2, SJ, SK) 0/1 f32 input computed on the host
    from the problem geometry (f64-exact, matching boundary_masks) and
    held VMEM-resident — corrections pin to ZERO, so no values input.

Halo accounting matches the Dirichlet kernels: a BC copy reads
distance-1 neighbors (the adjacent interior plane/column), exactly like
a smoothing update, so the 2*n_iter-plane trapezoid halo of
_make_pipelined_kernel covers sweeps + copies.

The residual+restrict stage of the mixed correction cycle needs NO new
kernel: the interior residual reads the boundary values the smoother
maintained, which is exactly what pallas3d.residual_restrict_fused_
padded computes (mixed_bc.descend32 uses the same ops3.residual +
restrict_full_weighting pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops.pallas3d import (
    _VMEM_BUDGET,
    _VMEM_LIMIT,
    _interpret,
    _prolong_band_j,
    _prolong_band_kt,
    _roll,
    _slab_masks,
)


def dirichlet_pin_planes(problem, n: int, sj: int, sk: int):
    """(2, sj, sk) f32 pin mask (1.0 at Dirichlet patch nodes of the
    x=0 / x=end faces), host-computed in f64 from the problem geometry
    so the kernel's patch membership matches boundary_masks exactly."""
    import numpy as np

    mask, _ = problem.boundary_masks(n)
    # The fused kernels pin Dirichlet nodes only on the two x faces; a
    # patch anywhere else would be silently treated as Neumann.
    if np.any(np.asarray(mask)[1 : n - 1]):
        raise ValueError(
            "pallas_mixed supports Dirichlet patches on the i=0/i=n-1 "
            "faces only; this problem has patch nodes on other faces"
        )
    out = np.zeros((2, sj, sk), np.float32)
    out[0, :n, :n] = mask[0].astype(np.float32)
    out[1, :n, :n] = mask[n - 1].astype(np.float32)
    return jnp.asarray(out)


def _apply_bcs_slab(u, g0, n, si, sj, sk, pin0, pin1):
    """One BC-enforcement pass on an (si, sj, sk) slab at global plane
    g0: whole-face Neumann copies in x, y, z order (later faces win at
    edges, matching apply_neumann_copy), then the zero Dirichlet pin
    (correction fields). pin0/pin1: (sj, sk) f32 patch masks."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + g0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sk), 2)
    # x faces: plane copies (slab-row shifts via concatenate — axis-0
    # rolls don't lower on Mosaic); wrap rows land on rows whose global
    # index is not 0 / n-1, so they are never selected
    u = jnp.where(ii == 0, jnp.concatenate([u[1:], u[:1]], axis=0), u)
    u = jnp.where(ii == n - 1, jnp.concatenate([u[-1:], u[:-1]], axis=0), u)
    # y faces: sublane shifts
    u = jnp.where(jj == 0, _roll(u, -1, 1), u)
    u = jnp.where(jj == n - 1, _roll(u, 1, 1), u)
    # z faces: lane shifts (priority at edges: applied last)
    u = jnp.where(kk == 0, _roll(u, -1, 2), u)
    u = jnp.where(kk == n - 1, _roll(u, 1, 2), u)
    # Dirichlet pin (zero for corrections)
    pin = jnp.where(ii == 0, pin0[None], jnp.zeros_like(u))
    pin = jnp.where(ii == n - 1, pin1[None], pin)
    return jnp.where(pin > 0.5, jnp.zeros_like(u), u)


def _mixed_rb_body(h, n_iter, red_first, n, si, sj, sk):
    """Mixed-BC RB half-sweeps with the copy-BC FOLDED into the stencil.

    Interior stencils only ever touch boundary points with exactly ONE
    boundary coordinate, whose copy-BC value is by definition the
    adjacent interior value — i.e. the reading point's own current
    value (or zero at a Dirichlet patch). Folding that in (a select per
    face-adjacent direction) makes the sweeps independent of the stored
    boundary planes, so only ONE BC-enforcement pass per stage (at the
    end, for downstream readers) is needed instead of one per
    half-sweep — bit-identical iterates (copies are exact), ~30% fewer
    stage ops. The z>y>x overwrite priority of apply_neumann_copy only
    affects edge/corner nodes, which interior stencils never read."""
    h2 = h * h
    colors = (pk.RED, pk.BLACK) if red_first else (pk.BLACK, pk.RED)

    def body(eu, ef, g0, pin0, pin1):
        interior, parity = _slab_masks(n, si, sj, sk, g0)
        masks = {c: interior[1:-1] & (parity[1:-1] == c) for c in set(colors)}
        h2ef = h2 * ef[1:-1]
        gi = jax.lax.broadcasted_iota(jnp.int32, (si - 2, 1, 1), 0) + g0 + 1
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sk), 2)
        at_i1 = gi == 1
        at_in = gi == n - 2
        at_j1 = jj == 1
        at_jn = jj == n - 2
        at_k1 = kk == 1
        at_kn = kk == n - 2
        npin0 = pin0[None] > 0.5
        npin1 = pin1[None] > 0.5
        zero = jnp.zeros((), h2ef.dtype)
        for _ in range(n_iter):
            for c in colors:
                cen = eu[1:-1]
                im = jnp.where(at_i1, jnp.where(npin0, zero, cen), eu[:-2])
                ip = jnp.where(at_in, jnp.where(npin1, zero, cen), eu[2:])
                jm = jnp.where(at_j1, cen, _roll(cen, 1, 1))
                jp = jnp.where(at_jn, cen, _roll(cen, -1, 1))
                km = jnp.where(at_k1, cen, _roll(cen, 1, 2))
                kp = jnp.where(at_kn, cen, _roll(cen, -1, 2))
                nbr = im + ip + jm + jp + km + kp
                upd = (nbr - h2ef) * (1.0 / 6.0)
                mid = jnp.where(masks[c], upd, cen)
                eu = jnp.concatenate([eu[:1], mid, eu[-1:]], axis=0)
        # one BC pass so downstream kernels read valid boundary planes
        return _apply_bcs_slab(eu, g0, n, si, sj, sk, pin0, pin1)

    return body


def mixed_block_i(n, sj, sk, n_iter, itemsize=4, requested=8):
    """block_i for the mixed smoother stages, or 0. Even bi only: the
    prolong kernel's i-interpolation parity assumes even slab starts."""
    plane = sj * sk * itemsize
    for bi in (requested, 8, 4, 2):
        if bi > requested or bi % 2:
            continue
        si = bi + 4 * n_iter
        est = 2 * 2 * si * plane + 4 * si * plane + 2 * bi * plane
        if est <= _VMEM_BUDGET and n >= si and pl.cdiv(n, bi) >= 2:
            return bi
    return 0


def mixed_prolong_block_i(n, sj, sk, n_iter, itemsize=4, requested=8):
    """block_i for mixed_prolong_smooth_fused, or 0. Its slabs are one
    plane taller than the smoother's (si = bi + 4*n_iter + 1) and it
    double-buffers a (sic, sjc, skc) coarse slab the smoother estimate
    omits — budgeted separately so the planning margin stays honest."""
    nc = (n + 1) // 2
    _, sjc, skc = pk.padded_shape(nc)
    skc = pk.coarse_k_width(n, sk)
    plane = sj * sk * itemsize
    planec = sjc * skc * itemsize
    for bi in (requested, 8, 4, 2):
        if bi > requested or bi % 2:
            continue
        si = bi + 4 * n_iter + 1
        sic = (si + 1) // 2
        est = (2 * 2 * si * plane + 4 * si * plane + 2 * bi * plane
               + 2 * sic * planec)
        if est <= _VMEM_BUDGET and n >= si and pl.cdiv(n, bi) >= 2:
            return bi
    return 0


def _mixed_call(kernel, n_in, n, si, sj, sk, bi, dtype):
    call = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, bi),),
        out_shape=jax.ShapeDtypeStruct((n, sj, sk), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]  # pin planes
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

    def go(*args):
        with jax.enable_x64(False):
            return call(*args)

    return go


def _make_mixed_kernel(n, si, sj, sk, bi, nb, n_in, body):
    """Streaming double-buffered kernel with the (2, sj, sk) pin-plane
    input VMEM-resident (Pallas copies it in whole per grid step)."""

    def in_dma(hbm, ins2, sem_i, v, slot, blk):
        start = jnp.clip(blk * bi - (si - bi) // 2, 0, n - si)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, si)], ins2.at[v, slot], sem_i.at[v, slot]
        )

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        out_start = jnp.minimum(blk * bi, n - bi)
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(out_start, bi)], sem_o.at[slot]
        )

    halo = (si - bi) // 2

    def kernel(pin_ref, *refs):
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

        start = jnp.clip(i * bi - halo, 0, n - si)
        out_slab = body([ins2[v, slot] for v in range(n_in)], start,
                        pin_ref[0], pin_ref[1])

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        ins2[0, slot] = out_slab
        out_start = jnp.minimum(i * bi, n - bi)
        tile2[slot] = ins2[0, slot, pl.ds(out_start - start, bi)]
        out_dma(out_hbm, tile2, sem_o, slot, i).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, i - 1).wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "red_first", "block_i")
)
def mixed_rb_smooth_fused(e_pad, r_pad, pin, h, n_iter, n, red_first=True,
                          block_i=8):
    """All 2*n_iter mixed-BC RB half-sweeps (update + BC enforcement per
    half-sweep), one HBM pass. pin: dirichlet_pin_planes(...)."""
    _, sj, sk = e_pad.shape
    bi = block_i
    si = bi + 4 * n_iter
    nb = pl.cdiv(n, bi)
    rb = _mixed_rb_body(h, n_iter, red_first, n, si, sj, sk)

    def body(slabs, g0, pin0, pin1):
        eu, ef = slabs
        return rb(eu, ef, g0, pin0, pin1)

    kernel = _make_mixed_kernel(n, si, sj, sk, bi, nb, 2, body)
    return _mixed_call(kernel, 2, n, si, sj, sk, bi, e_pad.dtype)(
        pin, e_pad, r_pad
    )


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "red_first", "block_i")
)
def mixed_rb_smooth_from_zero_fused(r_pad, pin, h, n_iter, n,
                                    red_first=True, block_i=8):
    """mixed_rb_smooth_fused with an implicit zero initial guess."""
    _, sj, sk = r_pad.shape
    bi = block_i
    si = bi + 4 * n_iter
    nb = pl.cdiv(n, bi)
    rb = _mixed_rb_body(h, n_iter, red_first, n, si, sj, sk)

    def body(slabs, g0, pin0, pin1):
        (ef,) = slabs
        return rb(jnp.zeros_like(ef), ef, g0, pin0, pin1)

    kernel = _make_mixed_kernel(n, si, sj, sk, bi, nb, 1, body)
    return _mixed_call(kernel, 1, n, si, sj, sk, bi, r_pad.dtype)(pin, r_pad)


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "block_i")
)
def mixed_prolong_smooth_fused(ec_pad, e_pad, r_pad, pin, h, n_iter, n,
                               block_i=8):
    """e' = mixed_post_smooth(apply_bcs(e + P(ec)), r) in one pass:
    trilinear interpolation-add (j/k on the MXU, i by even/odd
    interleave — the coarse BOUNDARY values participate, as the mixed
    correction's Neumann boundaries are nonzero), one BC pass, then the
    black-first mixed half-sweeps."""
    nc = (n + 1) // 2
    _, sj, sk = e_pad.shape
    _, sjc, skc = ec_pad.shape
    bi = block_i
    si = bi + 4 * n_iter + 1
    sic = (si + 1) // 2
    nb = pl.cdiv(n, bi)
    rb = _mixed_rb_body(h, n_iter, False, n, si, sj, sk)

    def in_dma_fine(hbm, ref2, sem2, slot, blk):
        start = jnp.clip(blk * bi - (si - bi) // 2, 0, n - si)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, si)], ref2.at[slot], sem2.at[slot]
        )

    def in_dma_coarse(hbm, ref2, sem2, slot, blk):
        start = jnp.clip(blk * bi - (si - bi) // 2, 0, n - si)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start // 2, sic)], ref2.at[slot], sem2.at[slot]
        )

    def out_dma(out_hbm, tile2, sem2, slot, blk):
        out_start = jnp.minimum(blk * bi, n - bi)
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(out_start, bi)], sem2.at[slot]
        )

    halo = (si - bi) // 2

    def kernel(pin_ref, ec_hbm, u_hbm, f_hbm, out_hbm, eu2, ef2, ec2, tile2,
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

        start = jnp.clip(i * bi - halo, 0, n - si)
        dtype = eu2.dtype
        pj = _prolong_band_j(sj, sjc, dtype)
        pkt = _prolong_band_kt(skc, sk, dtype)

        yc = []
        for c in range(sic):
            y = jnp.dot(pj, ec2[slot, c], precision=jax.lax.Precision.HIGHEST)
            yc.append(jnp.dot(y, pkt, precision=jax.lax.Precision.HIGHEST))
        # fine slab row q is global start+q; its coarse parent pair is
        # (start+q)//2 - start//2 (+1 when odd) in the coarse slab
        corr = []
        for q in range(si):
            par = q % 2  # start is even (bi, halo even)
            base = q // 2
            if par == 0:
                corr.append(yc[base])
            else:
                corr.append(0.5 * (yc[base] + yc[base + 1]))
        corr = jnp.stack(corr, axis=0)
        eu = eu2[slot] + corr
        # no BC pass needed before the folded smoother (it never reads
        # boundary planes); rb's final in-body BC pass sets them
        eu = rb(eu, ef2[slot], start, pin_ref[0], pin_ref[1])

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        eu2[slot, :] = eu
        out_start = jnp.minimum(i * bi, n - bi)
        tile2[slot] = eu2[slot, pl.ds(out_start - start, bi)]
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
        out_shape=jax.ShapeDtypeStruct((n, sj, sk), e_pad.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, si, sj, sk), e_pad.dtype),
            pltpu.VMEM((2, si, sj, sk), e_pad.dtype),
            pltpu.VMEM((2, sic, sjc, skc), e_pad.dtype),
            pltpu.VMEM((2, bi, sj, sk), e_pad.dtype),
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

    def go(*args):
        with jax.enable_x64(False):
            return call(*args)

    return go(pin, ec_pad, e_pad, r_pad)


# ------------------- sharded ext variants (ops.pallas_sharded geometry)
# The mixed smoother/prolong stages on halo-extended LOCAL blocks, so
# the distributed electrospray solve keeps the fused-kernel tier
# (round-3 verdict item #4). Geometry contract == ops.pallas_sharded:
# ext arrays carry a 2*n_iter-plane halo, gi0 = global plane of ext row
# 0 (axis_index*L - halo), outputs are the L owned planes. The
# residual+restrict and EFT-norm stages need no mixed variants — the
# Dirichlet ext kernels read whatever boundary values the smoother
# maintained (same argument as the single-chip tier, module docstring).


def _make_mixed_ext_kernel(L, si, sj, sk, bi, halo, nb, n_in, body):
    """pallas_sharded._make_ext_kernel with the (2, SJ, SK) pin-plane
    VMEM input; ``body(slabs, g0, pin0, pin1)`` -> out slab."""

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

    def kernel(gi0_ref, pin_ref, *refs):
        hbms = refs[:n_in]
        out_hbm = refs[n_in]
        ins2, tile2, sem_i, sem_o = refs[n_in + 1 :]
        i = pl.program_id(0)
        slot = i % 2
        nslot = (i + 1) % 2

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
        out_slab = body([ins2[v, slot] for v in range(n_in)], g0,
                        pin_ref[0], pin_ref[1])

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

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


def _mixed_ext_call(kernel, n_in, L, si, sj, sk, bi, dtype):
    call = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(L, bi),),
        out_shape=jax.ShapeDtypeStruct((L, sj, sk), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
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

    def go(*args):
        with jax.enable_x64(False):
            return call(*args)

    return go


def mixed_rb_smooth_ext(u_ext, f_ext, pin, gi0, h, n_iter, n, L,
                        red_first=True, block_i=8):
    """All 2*n_iter mixed-BC RB half-sweeps on a local block, one pass
    (folded copy-BCs + one final BC pass, as mixed_rb_smooth_fused)."""
    _, sj, sk = u_ext.shape
    hh = 2 * n_iter
    si = block_i + 2 * hh
    nb = pl.cdiv(L, block_i)
    rb = _mixed_rb_body(h, n_iter, red_first, n, si, sj, sk)

    def body(slabs, g0, pin0, pin1):
        eu, ef = slabs
        return rb(eu, ef, g0, pin0, pin1)

    kernel = _make_mixed_ext_kernel(L, si, sj, sk, block_i, hh, nb, 2, body)
    return _mixed_ext_call(kernel, 2, L, si, sj, sk, block_i, u_ext.dtype)(
        gi0, pin, u_ext, f_ext
    )


def mixed_rb_smooth_from_zero_ext(f_ext, pin, gi0, h, n_iter, n, L,
                                  red_first=True, block_i=8):
    """mixed_rb_smooth_ext with an implicit zero initial guess."""
    _, sj, sk = f_ext.shape
    hh = 2 * n_iter
    si = block_i + 2 * hh
    nb = pl.cdiv(L, block_i)
    rb = _mixed_rb_body(h, n_iter, red_first, n, si, sj, sk)

    def body(slabs, g0, pin0, pin1):
        (ef,) = slabs
        return rb(jnp.zeros_like(ef), ef, g0, pin0, pin1)

    kernel = _make_mixed_ext_kernel(L, si, sj, sk, block_i, hh, nb, 1, body)
    return _mixed_ext_call(kernel, 1, L, si, sj, sk, block_i, f_ext.dtype)(
        gi0, pin, f_ext
    )


def mixed_prolong_smooth_ext(ec_ext, u_ext, f_ext, pin, gi0, h, n_iter, n,
                             L, block_i=8):
    """e' = mixed_post_smooth(e + P(ec), r) on a local block in one pass
    — the mixed twin of pallas_sharded.prolong_smooth_ext (coarse
    BOUNDARY values participate; black-first folded-BC half-sweeps).
    ec_ext carries an (n_iter + 1)-plane coarse halo; u/f a 2*n_iter
    fine halo."""
    nc = (n + 1) // 2
    _, sj, sk = u_ext.shape
    _, sjc, skc = ec_ext.shape
    bi = block_i
    H = 2 * n_iter
    si = bi + 2 * H
    sic = si // 2 + 1
    nb = pl.cdiv(L, bi)
    rb = _mixed_rb_body(h, n_iter, False, n, si, sj, sk)

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

    def kernel(gi0_ref, pin_ref, ec_hbm, u_hbm, f_hbm, out_hbm,
               eu2, ef2, ec2, tile2, sem_u, sem_f, sem_c, sem_o):
        i = pl.program_id(0)
        slot = i % 2
        nslot = (i + 1) % 2

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
        eu = rb(eu, ef2[slot], g0, pin_ref[0], pin_ref[1])

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

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((L, sj, sk), u_ext.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, si, sj, sk), u_ext.dtype),
            pltpu.VMEM((2, si, sj, sk), u_ext.dtype),
            pltpu.VMEM((2, sic, sjc, skc), u_ext.dtype),
            pltpu.VMEM((2, bi, sj, sk), u_ext.dtype),
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

    def go(*args):
        with jax.enable_x64(False):
            return call(*args)

    return go(gi0, pin, ec_ext, u_ext, f_ext)


# ------------------- halo-DMA variants (no ext-array materialization)
# The mixed twins of ops.pallas_sharded's halo tier: (local, lh, rhc)
# triples + in-kernel tri-source DMA (pallas_sharded._tri_dma) with the
# overlapping-tail block scheme, plus the (2, SJ, SK) pin-plane VMEM
# input. Eligibility: pallas_sharded.halo_ok(L, bi, halo).


def _make_mixed_halo_kernel(L, si, sj, sk, bi, halo, nb, n_in, body):
    """_make_mixed_ext_kernel with tri-source halo DMA (inputs are n_in
    (local, lh, rhc) triples)."""
    from multigrid_parallel_tpu.ops.pallas_sharded import _tri_dma

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

    def kernel(gi0_ref, pin_ref, *refs):
        hbms = refs[: 3 * n_in]
        out_hbm = refs[3 * n_in]
        ins2, tile2, sem_i, sem_o = refs[3 * n_in + 1 :]
        i = pl.program_id(0)
        slot = i % 2
        nslot = (i + 1) % 2

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

        g0 = gi0_ref[0] + ob_of(i)
        out_slab = body([ins2[v, slot] for v in range(n_in)], g0,
                        pin_ref[0], pin_ref[1])

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

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


def _mixed_halo_call(kernel, n_in, L, si, sj, sk, bi, dtype):
    call = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(L, bi),),
        out_shape=jax.ShapeDtypeStruct((L, sj, sk), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (3 * n_in),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_in, 2, si, sj, sk), dtype),
            pltpu.VMEM((2, bi, sj, sk), dtype),
            pltpu.SemaphoreType.DMA((n_in, 2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )

    def go(*args):
        with jax.enable_x64(False):
            return call(*args)

    return go


def mixed_rb_smooth_halo(u3, f3, pin, gi0, h, n_iter, n, L,
                         red_first=True, block_i=8):
    """mixed_rb_smooth_ext without the ext copies (triples from
    sharded_padded._halo_parts with tail_local=block_i)."""
    _, sj, sk = u3[0].shape
    hh = 2 * n_iter
    si = block_i + 2 * hh
    nb = pl.cdiv(L, block_i)
    rb = _mixed_rb_body(h, n_iter, red_first, n, si, sj, sk)

    def body(slabs, g0, pin0, pin1):
        eu, ef = slabs
        return rb(eu, ef, g0, pin0, pin1)

    kernel = _make_mixed_halo_kernel(L, si, sj, sk, block_i, hh, nb, 2, body)
    return _mixed_halo_call(kernel, 2, L, si, sj, sk, block_i,
                            u3[0].dtype)(gi0, pin, *u3, *f3)


def mixed_rb_smooth_from_zero_halo(f3, pin, gi0, h, n_iter, n, L,
                                   red_first=True, block_i=8):
    """mixed_rb_smooth_halo with an implicit zero initial guess."""
    _, sj, sk = f3[0].shape
    hh = 2 * n_iter
    si = block_i + 2 * hh
    nb = pl.cdiv(L, block_i)
    rb = _mixed_rb_body(h, n_iter, red_first, n, si, sj, sk)

    def body(slabs, g0, pin0, pin1):
        (ef,) = slabs
        return rb(jnp.zeros_like(ef), ef, g0, pin0, pin1)

    kernel = _make_mixed_halo_kernel(L, si, sj, sk, block_i, hh, nb, 1, body)
    return _mixed_halo_call(kernel, 1, L, si, sj, sk, block_i,
                            f3[0].dtype)(gi0, pin, *f3)


def mixed_prolong_smooth_halo(ec3, u3, f3, pin, gi0, h, n_iter, n, L,
                              block_i=8):
    """mixed_prolong_smooth_ext without the ext copies: fine triples
    carry H = 2*n_iter halo buffers (tail_local=block_i), the coarse
    triple n_iter/n_iter+1 (tail_local=block_i//2). Requires
    halo_ok(L, block_i, H) and block_i >= H+2."""
    from multigrid_parallel_tpu.ops.pallas_sharded import _tri_dma

    nc = (n + 1) // 2
    _, sj, sk = u3[0].shape
    Lc2, sjc, skc = ec3[0].shape
    bi = block_i
    H = 2 * n_iter
    si = bi + 2 * H
    sic = si // 2 + 1
    nb = pl.cdiv(L, bi)
    rb = _mixed_rb_body(h, n_iter, False, n, si, sj, sk)

    def ob_of(blk):
        return jnp.minimum(blk * bi, L - bi)  # even: L, bi even

    def in_tri_fine(hbms, ins2, sem_i, v, slot, blk, do_start):
        _tri_dma(hbms[3 * v], hbms[3 * v + 1], hbms[3 * v + 2],
                 ins2.at[v, slot], sem_i.at[v, slot],
                 ob_of(blk), blk == 0, H, bi, H, L, bi, do_start)

    def in_tri_coarse(hbms, ec2, sem_c, slot, blk, do_start):
        _tri_dma(hbms[0], hbms[1], hbms[2],
                 ec2.at[slot], sem_c.at[slot],
                 ob_of(blk) // 2, blk == 0, n_iter, bi // 2, n_iter + 1,
                 Lc2, bi // 2, do_start)

    def out_dma(out_hbm, tile2, sem_o, slot, blk):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(ob_of(blk), bi)], sem_o.at[slot]
        )

    def kernel(gi0_ref, pin_ref, *refs):
        chbms = refs[:3]
        fhbms = refs[3:9]
        out_hbm = refs[9]
        ins2, ec2, tile2, sem_i, sem_c, sem_o = refs[10:]
        i = pl.program_id(0)
        slot = i % 2
        nslot = (i + 1) % 2

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
        eu = rb(eu, ins2[1, slot], g0, pin_ref[0], pin_ref[1])

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
        out_shape=jax.ShapeDtypeStruct((L, sj, sk), u3[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 9,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, si, sj, sk), u3[0].dtype),
            pltpu.VMEM((2, sic, sjc, skc), u3[0].dtype),
            pltpu.VMEM((2, bi, sj, sk), u3[0].dtype),
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

    def go(*args):
        with jax.enable_x64(False):
            return call(*args)

    return go(gi0, pin, *ec3, *u3, *f3)
