"""Split-color (red/black compressed) RB-GS smoother stage — the
ROOFLINE lever-3 experiment (docs/ROOFLINE.md).

The rectangular fused stage computes an update for EVERY point of the
lane-padded (n, SJ, SK) slab each half-sweep and selects by parity mask
— VPU compute-bound at ~83% of peak (0.79 ms at 257³/bi=16). Here each
color is stored COMPRESSED along k. Because correction fields have zero
boundaries, only the n-2 interior k's need storing: ceil((n-2)/2) slots
per color — at 257³ exactly 128 lanes (one tile), i.e. **one third** of
the 384-lane padded width. Both colors (and both RHS colors) pack into
ONE array along the sublane axis:

    u2[(n, 2*SJ, SKH)]:  rows [0, SJ) = red, [SJ, 2*SJ) = black
    kk slot <-> k = 2*kk + 1 + ((i + j + color) % 2)

so a half-sweep updates ONLY the active color's points (1/3 of the
rectangular kernel's computed volume) and the stage's HBM traffic drops
to 2/3. The k-neighbor addressing becomes a single parity-selected lane
roll (details in _split_rb_body): red point neighbors live at the SAME
compressed index in the black array for i±1/j±1, and at {kk-1, kk} or
{kk, kk+1} (by row parity) for k∓1.

Status: EXPERIMENTAL — wired into nothing; scripts/splitcolor_bench.py
measures the stage against the rectangular kernel and its DMA floor
(docs/ROOFLINE.md records the outcome). Cycle-wide adoption would
require compressed variants of the residual/restrict/prolong kernels or
fused pack/unpack at the cycle edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops.pallas3d import (
    _VMEM_LIMIT,
    _interpret,
    _roll,
    _rup,
)


def split_shape(n: int):
    """(n, 2*SJ, SKH): SKH = rup(ceil((n-2)/2), 128) compressed slots."""
    _, sj, _ = pk.padded_shape(n)
    skh = _rup(-(-(n - 2) // 2), 128)
    return (n, 2 * sj, skh)


def pack_split(u_pad: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n, SJ, SK) padded field (zero boundary) -> packed split-color
    (n, 2*SJ, SKH). XLA-side gather — test/cycle-edge use only."""
    _, sj, sk = u_pad.shape
    _, sj2, skh = split_shape(n)
    ii = jnp.arange(n)[:, None, None]
    jj = jnp.arange(sj)[None, :, None]
    kk = jnp.arange(skh)[None, None, :]
    out = []
    for color in (0, 1):  # red, black
        k = 2 * kk + 1 + ((ii + jj + color) % 2)
        valid = k <= n - 2
        k = jnp.minimum(k, sk - 1)
        vals = jnp.take_along_axis(u_pad, jnp.broadcast_to(k, (n, sj, skh)),
                                   axis=2)
        out.append(jnp.where(valid, vals, 0.0))
    return jnp.concatenate(out, axis=1)


def unpack_split(u2: jnp.ndarray, n: int) -> jnp.ndarray:
    """Packed split-color -> (n, SJ, SK) padded field (zero boundary)."""
    _, sj, sk = pk.padded_shape(n)
    _, sj2, skh = split_shape(n)
    r2 = u2[:, :sj]
    b2 = u2[:, sj:]
    ii = jnp.arange(n)[:, None, None]
    jj = jnp.arange(sj)[None, :, None]
    kfull = jnp.arange(sk)[None, None, :]
    out = jnp.zeros((n, sj, sk), u2.dtype)
    for color, src in ((0, r2), (1, b2)):
        # k = 2kk + 1 + par  =>  kk = (k - 1 - par) // 2
        par = (ii + jj + color) % 2
        kk = (kfull - 1 - par) // 2
        sel = ((kfull - 1 - par) % 2 == 0) & (kk >= 0) & (kk < skh) \
            & (kfull >= 1) & (kfull <= n - 2)
        kk = jnp.clip(kk, 0, skh - 1)
        vals = jnp.take_along_axis(src, jnp.broadcast_to(kk, (n, sj, sk)),
                                   axis=2)
        out = jnp.where(sel, vals, out)
    return out


def _split_masks(n, si, sj, skh, start):
    """(maskR, maskB, or1) for an (si, 2*sj, skh) packed slab whose
    first row is global plane ``start``. or1: red k's are ODD on this
    (i, j) row ((i+j) even)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + start
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skh), 2)
    or1 = ((ii + jj) % 2) == 0
    interior_ij = (ii >= 1) & (ii <= n - 2) & (jj >= 1) & (jj <= n - 2)
    k_red = 2 * kk + 1 + jnp.where(or1, 0, 1)
    k_black = 2 * kk + 1 + jnp.where(or1, 1, 0)
    mask_r = interior_ij & (k_red <= n - 2)
    mask_b = interior_ij & (k_black <= n - 2)
    return mask_r, mask_b, or1


def _split_rb_body(h, n_iter, red_first, sj, skh):
    """Packed-slab body: n_iter iterations of (red, black) half-sweeps
    (or black-first), each updating ONLY the stored points of its
    color."""
    h2 = h * h

    def body(eu, ef, mask_r, mask_b, or1):
        r = eu[:, :sj]
        b = eu[:, sj:]
        fr = ef[1:-1, :sj]
        fb = ef[1:-1, sj:]
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skh), 2)
        first_lane = kk == 0
        last_lane = kk == skh - 1

        def half(dst, src, fsrc, mask, sel_minus):
            """Update color ``dst`` from neighbor color ``src``:
            sel_minus rows take {kk-1, kk} k-neighbors, others
            {kk, kk+1}."""
            sm = jnp.where(first_lane, 0.0, _roll(src, 1, 2))
            sp = jnp.where(last_lane, 0.0, _roll(src, -1, 2))
            sc = src[1:-1]
            sum_k = sc + jnp.where(sel_minus, sm, sp)[1:-1]
            nbr = (
                src[:-2] + src[2:]
                + _roll(sc, 1, 1) + _roll(sc, -1, 1)
                + sum_k
            )
            upd = (nbr - h2 * fsrc) * (1.0 / 6.0)
            mid = jnp.where(mask[1:-1], upd, dst[1:-1])
            return jnp.concatenate([dst[:1], mid, dst[-1:]], axis=0)

        for _ in range(n_iter):
            if red_first:
                r = half(r, b, fr, mask_r, or1)
                b = half(b, r, fb, mask_b, jnp.logical_not(or1))
            else:
                b = half(b, r, fb, mask_b, jnp.logical_not(or1))
                r = half(r, b, fr, mask_r, or1)
        return jnp.concatenate([r, b], axis=1)

    return body


def _make_split_rb_kernel(n, si, sj, skh, bi, h, n_iter, red_first, nb):
    """Double-buffered streaming kernel over the packed (n, 2*sj, skh)
    arrays — the pipelined template of pallas3d with split-color masks."""
    halo = 2 * n_iter
    body = _split_rb_body(h, n_iter, red_first, sj, skh)

    def in_dma(hbm, ref2, sem2, slot, blk):
        start = jnp.clip(blk * bi - halo, 0, n - si)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, si)], ref2.at[slot], sem2.at[slot]
        )

    def out_dma(out_hbm, tile2, sem2, slot, blk):
        out_start = jnp.minimum(blk * bi, n - bi)
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(out_start, bi)], sem2.at[slot]
        )

    def kernel(u_hbm, f_hbm, out_hbm, eu2, ef2, tile2, sem_u, sem_f, sem_o):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            in_dma(u_hbm, eu2, sem_u, slot, i).start()
            in_dma(f_hbm, ef2, sem_f, slot, i).start()

        @pl.when(i + 1 < nb)
        def _():
            in_dma(u_hbm, eu2, sem_u, nslot, i + 1).start()
            in_dma(f_hbm, ef2, sem_f, nslot, i + 1).start()

        in_dma(u_hbm, eu2, sem_u, slot, i).wait()
        in_dma(f_hbm, ef2, sem_f, slot, i).wait()

        start = jnp.clip(i * bi - halo, 0, n - si)
        mask_r, mask_b, or1 = _split_masks(n, si, sj, skh, start)
        out_slab = body(eu2[slot], ef2[slot], mask_r, mask_b, or1)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, i - 2).wait()

        eu2[slot, :] = out_slab
        out_start = jnp.minimum(i * bi, n - bi)
        tile2[slot, :] = eu2[slot, pl.ds(out_start - start, bi)]
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
def rb_smooth_split_fused(u2, f2, h, n_iter, n, red_first=True, block_i=16):
    """All 2*n_iter half-sweeps on packed split-color arrays, one HBM
    pass. u2/f2: (n, 2*SJ, SKH) from pack_split. Returns updated u2."""
    _, sj2, skh = u2.shape
    sj = sj2 // 2
    bi = block_i
    si = bi + 4 * n_iter
    nb = pl.cdiv(n, bi)
    kernel = _make_split_rb_kernel(n, si, sj, skh, bi, h, n_iter,
                                   red_first, nb)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((n, sj2, skh), u2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, si, sj2, skh), u2.dtype),
            pltpu.VMEM((2, si, sj2, skh), u2.dtype),
            pltpu.VMEM((2, bi, sj2, skh), u2.dtype),
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

    return go(u2, f2)
