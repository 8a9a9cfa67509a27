"""Split-color (red/black k-compressed) kernels for the MIXED-BC tier.

The round-4 verdict item #1: the electrospray (mg_3d_bkup.c) smoother is
the most compute-bound kernel in the repo — the in-kernel copy-BC folds
roughly double the ops per point (docs/MIXED_BC.md §3) — so the
split-color layout's compute halving (each half-sweep computes ONLY the
active color) pays most exactly here. This module marries the two
existing layouts:

  * ops.pallas_split — the Dirichlet split-pair layout: each color
    stored compressed along k, ``slot kk of color c at row (i, j) <->
    fine k = 2*kk + 1 + p`` with p(red) = (i+j) % 2, p(black) = 1 - p;
    shape ``split_shape(n) = (n, rup(n,8), rup((n-1)//2, 128))``.
  * ops.pallas_mixed_fold — the mixed-BC copy folds: an interior
    stencil only ever reads a boundary point with one boundary
    coordinate, whose homogeneous-Neumann copy value is the reading
    point's OWN current value (or zero at a Dirichlet patch node) —
    mg_3d_bkup.c:84-133 semantics.

What changes relative to the Dirichlet split kernels:

  * the k-edge reads fold to the CENTER instead of zero: only p = 0
    rows touch the k faces — slot 0's k-1 read (k = 1 reading k = 0)
    and slot (n-3)//2's k+1 read (k = n-2 reading k = n-1);
  * the smoother folds the i/j edge reads to the center too (x faces
    pin-masked), so half-sweeps never read stored boundary planes and
    need no per-half-sweep BC pass — iterates are BIT-IDENTICAL to the
    fold/full-layout mixed bodies (same im+ip+jm+jp+km+kp order);
  * one cross-color BC pass per stage maintains the stored i/j
    boundary planes for the residual/restrict/EFT readers: color A's
    face plane copies color B's adjacent interior plane AT THE SAME
    SLOT (the parity identity that makes i/j neighbors same-slot holds
    at boundary rows too);
  * the Dirichlet pin masks need TWO parity packs,
    ``pinp[p][face][j, kk] = pin_full[face][j, 2kk+1+p]``, selected
    per row by the or1 mask (p_red = (i+j) % 2 uniformly);
  * the fused residual+restrict EMITS the coarse RHS in the mixed
    k-FOLD layout (lane a <-> kc = a+1) and the fused prolong+smooth
    CONSUMES the fold coarse correction — the sub-hierarchy stays on
    ops.pallas_mixed_fold, and the compressed fine width equals the
    fold coarse width (rup((n-1)//2,128) == rup(nc-2,128) for 2^m+1
    grids), so lanes line up exactly.

All kernels double-buffer i-slabs through VMEM (the pallas3d
trapezoidal-halo streaming design) and run under the Pallas interpreter
off-TPU so CPU tests exercise the identical code path.

Reference parity: mg_3d_bkup.c (whole program) via mixed_bc; verified
by tests/test_mixed_split.py (smoother bitwise vs the fold tier).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_mixed as pm
from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf
from multigrid_parallel_tpu.ops import pallas_split as psp
from multigrid_parallel_tpu.ops.pallas3d import (
    _VMEM_BUDGET,
    _VMEM_LIMIT,
    _band_matrix,
    _eft_residual,
    _interpret,
    _prolong_band_j,
    _roll,
    _rup,
)
from multigrid_parallel_tpu.ops.pallas_split import (
    _go_no_x64,
    _split_masks,
    split_shape,
    split_supported,
)


def msplit_widths_ok(n: int) -> bool:
    """The layout-boundary contract: compressed fine k width equals the
    fold coarse width (true for every 2^m+1 grid)."""
    nc = (n + 1) // 2
    return split_shape(n)[2] == pmf.fold_shape(nc)[2]


# ------------------------------------------------------------- layout


def msplit_pin_packs(problem, n: int, sj: int, skh: int):
    """(2, 2, sj, skh) f32 x-face Dirichlet pin masks in split slot
    coordinates: packs[p][face][j, kk] = pin_full[face][j, 2kk+1+p]
    (zero beyond the stored k range). A reader of color c at row (i, j)
    uses p = p_c((i+j) % 2), i.e. where(or1, packs[0], packs[1]) for
    red and the swap for black — uniform over rows, boundary included."""
    _, sjp, skp = pk.padded_shape(n)
    full = pm.dirichlet_pin_planes(problem, n, sjp, skp)[:, :sj]
    kk = jnp.arange(skh)
    packs = []
    for p in (0, 1):
        k = 2 * kk + 1 + p
        valid = k <= n - 2
        kc = jnp.minimum(k, skp - 1)
        vals = full[:, :, kc]
        packs.append(jnp.where(valid[None, None, :], vals,
                               jnp.zeros_like(vals)))
    return jnp.stack(packs)


def msplit_plane_packs(planes, n: int, sj: int, skh: int):
    """(2, sj_any, sk_any) face-plane pair (lane = k) -> (2, 2, sj, skh)
    [p][face] packs in split slot coordinates (values beyond the stored
    k range zeroed). For the outer Dirichlet patch VALUES."""
    if planes.shape[1] < sj:
        planes = jnp.pad(planes, ((0, 0), (0, sj - planes.shape[1]), (0, 0)))
    planes = planes[:, :sj]
    skp = planes.shape[2]
    kk = jnp.arange(skh)
    packs = []
    for p in (0, 1):
        k = 2 * kk + 1 + p
        valid = k <= n - 2
        kc = jnp.minimum(k, skp - 1)
        vals = planes[:, :, kc]
        packs.append(jnp.where(valid[None, None, :], vals,
                               jnp.zeros_like(vals)))
    return jnp.stack(packs)


def fold_to_split(xf: jnp.ndarray, n: int):
    """Mixed k-FOLD (n, sj, skf; lane = k-1) -> (red, black) split pair.
    XLA gather — setup/teardown and tests only."""
    _, sj, skf = xf.shape
    _, sjs, skh = split_shape(n)
    assert sj == sjs, (sj, sjs)
    ii = jnp.arange(n)[:, None, None]
    jj = jnp.arange(sj)[None, :, None]
    kk = jnp.arange(skh)[None, None, :]
    q = (ii + jj) % 2
    out = []
    for p in (q, 1 - q):
        lane = 2 * kk + p  # fold lane of k = 2kk+1+p
        valid = lane <= n - 3
        lc = jnp.minimum(lane, skf - 1)
        vals = jnp.take_along_axis(
            xf, jnp.broadcast_to(lc, (n, sj, skh)), axis=2
        )
        out.append(jnp.where(valid, vals, jnp.zeros_like(vals)))
    return out[0], out[1]


def split_to_fold(xr: jnp.ndarray, xb: jnp.ndarray, n: int):
    """Split pair -> mixed k-FOLD layout (lane a = k-1, k = 1..n-2)."""
    _, sj, skh = xr.shape
    _, _, skf = pmf.fold_shape(n)
    ii = jnp.arange(n)[:, None, None]
    jj = jnp.arange(sj)[None, :, None]
    aa = jnp.arange(skf)[None, None, :]
    q = (ii + jj) % 2
    out = jnp.zeros((n, sj, skf), xr.dtype)
    for src, p in ((xr, q), (xb, 1 - q)):
        kk = (aa - p) // 2
        sel = ((aa - p) % 2 == 0) & (kk >= 0) & (kk < skh) & (aa <= n - 3)
        kks = jnp.clip(kk, 0, skh - 1)
        vals = jnp.take_along_axis(
            src, jnp.broadcast_to(kks, (n, sj, skf)), axis=2
        )
        out = jnp.where(sel, vals, out)
    return out


# ----------------------------------------------------- masks + bodies


def _at_klast(n, skh):
    """(1, 1, skh) mask of the slot holding k = n-2 on p = 0 rows
    (logical — may be below the physical last lane when skh pads)."""
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skh), 2)
    return kk == (n - 3) // 2


def _mixed_k_terms(sc, cen, selm, first, klast):
    """(km, kp): the k-1 / k+1 neighbor values for the active color
    (fold-ordered, so nbr sums are bit-identical to the fold body).
    selm: rows where the dst color's k's are odd (p = 0) — neighbors
    live at src slots {kk-1, kk}; else {kk, kk+1}. The k-edge reads
    (only on selm rows: slot 0's k-1 and slot (n-3)//2's k+1) fold to
    the center's own value (exact Neumann copies, mg_3d_bkup.c:84-133).
    """
    km = jnp.where(selm, jnp.where(first, cen, _roll(sc, 1, 2)), sc)
    kp = jnp.where(selm, jnp.where(klast, cen, sc), _roll(sc, -1, 2))
    return km, kp


def _apply_bcs_slab_msplit(er, eb, g0, n, si, sj, skh, pinp):
    """The end-of-stage BC pass on a split slab pair: x then y whole-
    face Neumann copies (cross-color — the same-slot identity holds at
    boundary rows), then the zero Dirichlet pin (correction fields).
    Matches pallas_mixed._apply_bcs_slab's order/priority on the stored
    planes (the z faces are not stored)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + g0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
    # x faces: cross-color slab-row shifts (concatenate — axis-0 rolls
    # don't lower on Mosaic); wrap rows are never selected
    erx = jnp.where(ii == 0, jnp.concatenate([eb[1:], eb[:1]], axis=0), er)
    ebx = jnp.where(ii == 0, jnp.concatenate([er[1:], er[:1]], axis=0), eb)
    erx = jnp.where(ii == n - 1,
                    jnp.concatenate([eb[-1:], eb[:-1]], axis=0), erx)
    ebx = jnp.where(ii == n - 1,
                    jnp.concatenate([er[-1:], er[:-1]], axis=0), ebx)
    # y faces: cross-color sublane shifts of the POST-X slabs
    ery = jnp.where(jj == 0, _roll(ebx, -1, 1), erx)
    eby = jnp.where(jj == 0, _roll(erx, -1, 1), ebx)
    ery = jnp.where(jj == n - 1, _roll(ebx, 1, 1), ery)
    eby = jnp.where(jj == n - 1, _roll(erx, 1, 1), eby)
    # Dirichlet pin (zero for corrections); rows i = 0 / n-1 only
    or1 = (ii + jj) % 2 == 0
    pr0 = jnp.where(or1, pinp[0, 0], pinp[1, 0])
    pr1 = jnp.where(or1, pinp[0, 1], pinp[1, 1])
    pb0 = jnp.where(or1, pinp[1, 0], pinp[0, 0])
    pb1 = jnp.where(or1, pinp[1, 1], pinp[0, 1])

    def pin(u, p0, p1):
        m = jnp.where(ii == 0, p0, jnp.zeros_like(u))
        m = jnp.where(ii == n - 1, p1, m)
        return jnp.where(m > 0.5, jnp.zeros_like(u), u)

    return pin(ery, pr0, pr1), pin(eby, pb0, pb1)


def _mixed_rb_msplit_body(h, n_iter, red_first, n, si, sj, skh):
    """All 2*n_iter mixed-BC half-sweeps on an (er, eb, fr, fb) slab
    quad. Fold semantics per pallas_mixed._mixed_rb_body (bit-identical
    iterates: same im+ip+jm+jp+km+kp addition order), split addressing
    per pallas_split._rb_split_body. Ends with the cross-color BC pass.
    """
    h2 = h * h

    def body(er, eb, fr, fb, g0, pinp):
        or1, mask_r, mask_b, first, _ = _split_masks(n, si, sj, skh, g0)
        klast = _at_klast(n, skh)
        gi = jax.lax.broadcasted_iota(jnp.int32, (si - 2, 1, 1), 0) + g0 + 1
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
        at_i1 = gi == 1
        at_in = gi == n - 2
        at_j1 = jj == 1
        at_jn = jj == n - 2
        or1m = or1[1:-1]
        h2fr = h2 * fr[1:-1]
        h2fb = h2 * fb[1:-1]
        zero = jnp.zeros((), h2fr.dtype)
        # (dst?, src?, h2f, mask, selm, pin selectors) per color; selm:
        # rows where the DST's k's are odd (p = 0)
        cfg = {
            pk.RED: (h2fr, mask_r[1:-1], or1m,
                     (pinp[0, 0], pinp[1, 0]), (pinp[0, 1], pinp[1, 1])),
            pk.BLACK: (h2fb, mask_b[1:-1], jnp.logical_not(or1m),
                       (pinp[1, 0], pinp[0, 0]), (pinp[1, 1], pinp[0, 1])),
        }
        colors = (pk.RED, pk.BLACK) if red_first else (pk.BLACK, pk.RED)
        for _ in range(n_iter):
            for c in colors:
                dst, src = (er, eb) if c == pk.RED else (eb, er)
                h2f, mask, selm, sel0, sel1 = cfg[c]
                cen = dst[1:-1]
                sc = src[1:-1]
                npin0 = jnp.where(or1m, sel0[0], sel0[1]) > 0.5
                npin1 = jnp.where(or1m, sel1[0], sel1[1]) > 0.5
                im = jnp.where(at_i1, jnp.where(npin0, zero, cen), src[:-2])
                ip = jnp.where(at_in, jnp.where(npin1, zero, cen), src[2:])
                jm = jnp.where(at_j1, cen, _roll(sc, 1, 1))
                jp = jnp.where(at_jn, cen, _roll(sc, -1, 1))
                km, kp = _mixed_k_terms(sc, cen, selm, first, klast)
                nbr = im + ip + jm + jp + km + kp
                upd = (nbr - h2f) * (1.0 / 6.0)
                mid = jnp.where(mask, upd, cen)
                new = jnp.concatenate([dst[:1], mid, dst[-1:]], axis=0)
                if c == pk.RED:
                    er = new
                else:
                    eb = new
        return _apply_bcs_slab_msplit(er, eb, g0, n, si, sj, skh, pinp)

    return body


def _mixed_residual_msplit(er, eb, fr, fb, inv_h2, n, si, sj, skh, g0):
    """(sr, sb, or1): interior mixed residual per color on a slab quad,
    zero outside live interior slots. The i/j neighbor reads use the
    stored BC-maintained boundary planes (like the fold rr kernel); the
    k-edge reads fold to the center. Fold-ordered nbr sum."""
    or1, mask_r, mask_b, first, _ = _split_masks(n, si, sj, skh, g0)
    klast = _at_klast(n, skh)
    selr = or1[1:-1]
    selb = jnp.logical_not(or1)[1:-1]

    def one(dst, src, f, mask, selm):
        cen = dst[1:-1]
        sc = src[1:-1]
        km, kp = _mixed_k_terms(sc, cen, selm, first, klast)
        nbr = (
            src[:-2] + src[2:]
            + _roll(sc, 1, 1) + _roll(sc, -1, 1)
            + km + kp
        )
        r = f[1:-1] - inv_h2 * (nbr - 6.0 * cen)
        z = jnp.zeros((1, sj, skh), r.dtype)
        r = jnp.concatenate([z, r, z], axis=0)
        return jnp.where(mask, r, jnp.zeros_like(r))

    sr = one(er, eb, fr, mask_r, selr)
    sb = one(eb, er, fb, mask_b, selb)
    return sr, sb, or1


# ------------------------------------------- generic streaming template


def _make_msplit_stream_kernel(n, si, sj, skh, bi, halo, nb, n_in, n_out,
                               body):
    """pallas_split._make_split_stream_kernel with a leading
    (2, 2, sj, skh) pin-pack VMEM input passed through to the body.
    body(slabs, start, pin_ref) -> list of n_out output slabs."""
    assert n_out <= n_in

    def in_dma(hbm, ins2, sem_i, v, slot, blk):
        start = jnp.clip(blk * bi - halo, 0, n - si)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, si)], ins2.at[v, slot], sem_i.at[v, slot]
        )

    def out_dma(out_hbm, tile2, sem_o, slot, blk, t):
        out_start = jnp.minimum(blk * bi, n - bi)
        return pltpu.make_async_copy(
            tile2.at[slot, t], out_hbm.at[pl.ds(out_start, bi)],
            sem_o.at[slot, t],
        )

    def kernel(pin_ref, *refs):
        hbms = refs[:n_in]
        outs = refs[n_in : n_in + n_out]
        ins2, tile2, sem_i, sem_o = refs[n_in + n_out :]

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

        start = jnp.clip(i * bi - halo, 0, n - si)
        out_slabs = body([ins2[v, slot] for v in range(n_in)], start,
                         pin_ref)

        @pl.when(i >= 2)
        def _():
            for t in range(n_out):
                out_dma(outs[t], tile2, sem_o, slot, i - 2, t).wait()

        out_start = jnp.minimum(i * bi, n - bi)
        off = out_start - start
        for t in range(n_out):
            ins2[t, slot] = out_slabs[t]  # staging for the ds-read
            tile2[slot, t] = ins2[t, slot, pl.ds(off, bi)]
            out_dma(outs[t], tile2, sem_o, slot, i, t).start()

        @pl.when(i == nb - 1)
        def _():
            for t in range(n_out):
                out_dma(outs[t], tile2, sem_o, slot, i, t).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            for t in range(n_out):
                out_dma(outs[t], tile2, sem_o, nslot, i - 1, t).wait()

    return kernel


def _call_msplit_stream(kernel, n, si, sj, skh, bi, nb, n_in, n_out, dtype):
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, sj, skh), dtype) for _ in range(n_out)
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]  # pin packs
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)
        ),
        scratch_shapes=[
            pltpu.VMEM((n_in, 2, si, sj, skh), dtype),
            pltpu.VMEM((2, n_out, bi, sj, skh), dtype),
            pltpu.SemaphoreType.DMA((n_in, 2)),
            pltpu.SemaphoreType.DMA((2, n_out)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call, dtype)


def _msplit_auto_bi(n, sj, skh, halo, n_in, n_out, temps, itemsize=4,
                    requested=24):
    """Largest block_i whose estimated VMEM footprint fits the planning
    budget (pallas_split._split_auto_bi with a caller-chosen temporary
    count — the mixed bodies hold more live slabs: pin selects + the BC
    pass). 0 = does not fit."""
    plane = sj * skh * itemsize
    for bi in (requested, 24, 16, 12, 8, 6, 4, 2):
        if bi > requested:
            continue
        si = bi + 2 * halo
        est = (n_in * 2 * si + temps * si + 2 * n_out * bi) * plane
        if est <= _VMEM_BUDGET and n >= si and pl.cdiv(n, bi) >= 2:
            return bi
    return 0


# ------------------------------------------------------ smoother stages


def msplit_smooth_block_i(n, sj, skh, n_iter, itemsize=4, requested=24):
    return _msplit_auto_bi(n, sj, skh, 2 * n_iter, 4, 2, 8, itemsize,
                           requested)


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "red_first", "block_i")
)
def mixed_rb_smooth_msplit(er, eb, fr, fb, pinp, h, n_iter, n,
                           red_first=True, block_i=24):
    """All 2*n_iter mixed-BC RB half-sweeps on a split pair, one HBM
    pass (mg_3d_bkup.c smoother orderings). pinp: msplit_pin_packs(...).
    Caller must check msplit_smooth_block_i(...) > 0."""
    _, sj, skh = er.shape
    bi = block_i
    hh = 2 * n_iter
    si = bi + 2 * hh
    nb = pl.cdiv(n, bi)
    rb = _mixed_rb_msplit_body(h, n_iter, red_first, n, si, sj, skh)

    def body(slabs, start, pin_ref):
        er_s, eb_s, fr_s, fb_s = slabs
        return list(rb(er_s, eb_s, fr_s, fb_s, start, pin_ref))

    kernel = _make_msplit_stream_kernel(n, si, sj, skh, bi, hh, nb, 4, 2,
                                        body)
    call = _call_msplit_stream(kernel, n, si, sj, skh, bi, nb, 4, 2,
                               er.dtype)
    return call(pinp, er, eb, fr, fb)


def msplit_from_zero_block_i(n, sj, skh, n_iter, itemsize=4, requested=24):
    return _msplit_auto_bi(n, sj, skh, 2 * n_iter, 2, 2, 8, itemsize,
                           requested)


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "red_first", "block_i")
)
def mixed_rb_smooth_from_zero_msplit(fr, fb, pinp, h, n_iter, n,
                                     red_first=True, block_i=24):
    """mixed_rb_smooth_msplit with an implicit zero initial guess."""
    _, sj, skh = fr.shape
    bi = block_i
    hh = 2 * n_iter
    si = bi + 2 * hh
    nb = pl.cdiv(n, bi)
    rb = _mixed_rb_msplit_body(h, n_iter, red_first, n, si, sj, skh)

    def body(slabs, start, pin_ref):
        fr_s, fb_s = slabs
        z = jnp.zeros_like(fr_s)
        return list(rb(z, z, fr_s, fb_s, start, pin_ref))

    kernel = _make_msplit_stream_kernel(n, si, sj, skh, bi, hh, nb, 2, 2,
                                        body)
    call = _call_msplit_stream(kernel, n, si, sj, skh, bi, nb, 2, 2,
                               fr.dtype)
    return call(pinp, fr, fb)


# ------------------------------------------- fused residual + restrict


def msplit_rr_block_i(n, sj, skh, itemsize=4, requested=8):
    """block_i (coarse planes) for residual_restrict_msplit, or 0."""
    plane = sj * skh * itemsize
    nc = (n + 1) // 2
    for bi in (requested, 8, 4, 2):
        if bi > requested:
            continue
        si = 2 * bi + 3
        est = (4 * 2 * si + 6 * si) * plane
        if est <= _VMEM_BUDGET and n >= si and pl.cdiv(nc, bi) >= 2:
            return bi
    return 0


def _make_rr_msplit_kernel(n, si, sj, skh, bi, h, nc, sjc, skc_f, nb):
    """Mixed residual + full-weighting restriction on split pairs, one
    pass, EMITTING the coarse k-FOLD layout (lane a <-> kc = a+1): the
    k-taps collapse to coarse_fold[a] = 0.25*(O[a] + O[a+1]) + 0.5*E[a]
    where O/E are the colors holding odd/even k's on the row; i-taps
    combine planes in VMEM; j-taps are one MXU band matmul per coarse
    plane (mg_3d.h:844-998 weights; mixed boundary semantics via the
    BC-maintained stored planes)."""
    inv_h2 = 1.0 / (h * h)

    def fs_of(blk):
        return jnp.clip(2 * blk * bi - 2, 0, n - si)

    def row_base_of(blk):
        return fs_of(blk) // 2 + 1  # fs is always even

    def in_dma(hbm, ins2, sem_i, v, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(fs_of(blk), si)], ins2.at[v, slot], sem_i.at[v, slot]
        )

    def out_dma(out_hbm, tile2, sem_o, slot, row_base):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(row_base, bi)], sem_o.at[slot]
        )

    def kernel(er_hbm, eb_hbm, rr_hbm, rb_hbm, out_hbm, ins2, tile2,
               sem_i, sem_o):
        hbms = (er_hbm, eb_hbm, rr_hbm, rb_hbm)
        i = pl.program_id(0)
        slot = i % 2
        nslot = (i + 1) % 2

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

        fs = fs_of(i)
        row_base = row_base_of(i)
        er_s, eb_s, rr_s, rb_s = (ins2[v, slot] for v in range(4))
        sr, sb, or1 = _mixed_residual_msplit(
            er_s, eb_s, rr_s, rb_s, inv_h2, n, si, sj, skh, fs
        )
        # k-restrict per fine plane into FOLD lanes: a <-> kc = a+1 sums
        # fine k = 2a+1..2a+3 with (0.25, 0.5, 0.25); O (odd-k color)
        # holds slots a, a+1; E (even-k color) holds slot a.
        srp = _roll(sr, -1, 2)
        sbp = _roll(sb, -1, 2)
        cpl = jnp.where(
            or1,
            0.25 * (sr + srp) + 0.5 * sb,
            0.25 * (sb + sbp) + 0.5 * sr,
        )

        dtype = cpl.dtype
        aj = _band_matrix(sjc, sj, nc - 2, dtype)
        jjc = jax.lax.broadcasted_iota(jnp.int32, (sjc, skc_f), 0)
        kkc = jax.lax.broadcasted_iota(jnp.int32, (sjc, skc_f), 1)
        colmask = (jjc >= 1) & (jjc <= nc - 2) & (kkc <= nc - 3)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, row_base_of(i - 2)).wait()

        ci = cpl[1:-1]  # inner fine planes (si-2)
        for t in range(bi):
            plane = 0.25 * ci[2 * t] + 0.5 * ci[2 * t + 1] + 0.25 * ci[2 * t + 2]
            z = jnp.dot(aj, plane, precision=jax.lax.Precision.HIGHEST)
            row = row_base + t
            ok = jnp.logical_and(row >= 1, row <= nc - 2)
            tile2[slot, t] = jnp.where(
                jnp.logical_and(ok, colmask), z, jnp.zeros_like(z)
            )

        out_dma(out_hbm, tile2, sem_o, slot, row_base).start()

        @pl.when(i == nb - 1)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, row_base).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            out_dma(out_hbm, tile2, sem_o, nslot, row_base_of(i - 1)).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "n", "block_i"))
def residual_restrict_msplit(er, eb, rr_, rb_, h, n, block_i=8):
    """Fused mixed split residual + full-weighting restriction -> coarse
    k-FOLD (nc, sjc, skc_f) RHS, one fine-grid HBM pass. Caller must
    check msplit_rr_block_i(...) > 0 first."""
    nc = (n + 1) // 2
    _, sj, skh = er.shape
    _, sjc, skc_f = pmf.fold_shape(nc)
    assert skc_f == skh, (skc_f, skh)  # compressed fine == fold coarse
    bi = block_i
    si = 2 * bi + 3
    nb = pl.cdiv(nc, bi)
    kernel = _make_rr_msplit_kernel(n, si, sj, skh, bi, h, nc, sjc, skc_f,
                                    nb)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((nc, sjc, skc_f), er.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, 2, si, sj, skh), er.dtype),
            pltpu.VMEM((2, bi, sjc, skc_f), er.dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    rc = _go_no_x64(call, er.dtype)(er, eb, rr_, rb_)
    # Rows 0 / nc-1 are boundary and outside every block's write window.
    z = jnp.zeros((1, sjc, skc_f), rc.dtype)
    return jnp.concatenate([z, rc[1 : nc - 1], z], axis=0)


# --------------------------------- fused prolong+correct+post-smooth


def msplit_ps_block_i(n, sj, skh, n_iter, itemsize=4, requested=16):
    """block_i for mixed_prolong_smooth_msplit, or 0. Even bi only (the
    i-interpolation parity assumes even slab starts)."""
    plane = sj * skh * itemsize
    nc = (n + 1) // 2
    _, sjc, skc_f = pmf.fold_shape(nc)
    planec = sjc * skc_f * itemsize
    for bi in (requested, 16, 12, 8, 4, 2):
        if bi > requested or bi % 2:
            continue
        si = bi + 4 * n_iter + 1
        sic = (si + 1) // 2
        est = (4 * 2 * si + 7 * si + 2 * 2 * bi) * plane + 2 * sic * planec
        if est <= _VMEM_BUDGET and n >= si and pl.cdiv(n, bi) >= 2:
            return bi
    return 0


def _make_ps_msplit_kernel(n, nc, si, sic, sj, skh, sjc, skc_f, bi, h,
                           n_iter, nb, with_delta):
    """e' = mixed_post_smooth(e + P(ec), r) on split pairs in one pass:
    the coarse k-FOLD slab is j-interpolated on the MXU, i-interpolated
    by even-copy/odd-average, k-expanded per color by roll+parity
    selects (the unstored coarse kc = 0 / nc-1 planes fold to their
    stored neighbors, with the optional pin-priority delta hitting only
    the fine edge slots — pallas_mixed_fold._prolong_band_kt_fold
    semantics in compressed coordinates), masked-added, then the
    black-first mixed split RB stage runs on the corrected slabs."""
    hh = 2 * n_iter

    def fs_of(blk):
        return jnp.clip(blk * bi - hh, 0, n - si)

    def in_dma_fine(hbm, ins2, sem_i, v, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(fs_of(blk), si)], ins2.at[v, slot], sem_i.at[v, slot]
        )

    def in_dma_coarse(hbm, ec2, sem_c, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(fs_of(blk) // 2, sic)], ec2.at[slot], sem_c.at[slot]
        )

    def out_dma(out_hbm, tile2, sem_o, slot, blk, t):
        out_start = jnp.minimum(blk * bi, n - bi)
        return pltpu.make_async_copy(
            tile2.at[slot, t], out_hbm.at[pl.ds(out_start, bi)],
            sem_o.at[slot, t],
        )

    rb = _mixed_rb_msplit_body(h, n_iter, False, n, si, sj, skh)

    def kernel(pin_ref, sgn_ref, ec_hbm, er_hbm, eb_hbm, rr_hbm, rb_hbm,
               or_hbm, ob_hbm, ins2, ec2, tile2, sem_i, sem_c, sem_o):
        hbms = (er_hbm, eb_hbm, rr_hbm, rb_hbm)
        i = pl.program_id(0)
        slot = i % 2
        nslot = (i + 1) % 2

        @pl.when(i == 0)
        def _():
            for v in range(4):
                in_dma_fine(hbms[v], ins2, sem_i, v, slot, i).start()
            in_dma_coarse(ec_hbm, ec2, sem_c, slot, i).start()

        @pl.when(i + 1 < nb)
        def _():
            for v in range(4):
                in_dma_fine(hbms[v], ins2, sem_i, v, nslot, i + 1).start()
            in_dma_coarse(ec_hbm, ec2, sem_c, nslot, i + 1).start()

        for v in range(4):
            in_dma_fine(hbms[v], ins2, sem_i, v, slot, i).wait()
        in_dma_coarse(ec_hbm, ec2, sem_c, slot, i).wait()

        start = fs_of(i)
        dtype = ins2.dtype
        pj = _prolong_band_j(sj, sjc, dtype)

        # j interpolation of each coarse FOLD slab plane (MXU), plus the
        # pin-priority delta plane when the coarse geometry needs it
        yc = []
        dc = []
        for c in range(sic):
            yc.append(
                jnp.dot(pj, ec2[slot, c], precision=jax.lax.Precision.HIGHEST)
            )
            if with_delta:
                gidx = start // 2 + c
                nbr = jnp.where(
                    gidx == 0,
                    ec2[slot, min(c + 1, sic - 1)],
                    ec2[slot, max(c - 1, 0)],
                )
                sgn = jnp.where(
                    gidx == 0, sgn_ref[0],
                    jnp.where(gidx == nc - 1, sgn_ref[1],
                              jnp.zeros_like(sgn_ref[0])),
                )
                dc.append(jnp.dot(pj, sgn * nbr,
                                  precision=jax.lax.Precision.HIGHEST))
        # i interpolation: even fine planes copy, odd planes average
        # (start is even, so local parity == global parity)
        corr = []
        dcorr = []
        for q in range(si):
            if q % 2 == 0:
                corr.append(yc[q // 2])
                if with_delta:
                    dcorr.append(dc[q // 2])
            else:
                corr.append(0.5 * (yc[q // 2] + yc[q // 2 + 1]))
                if with_delta:
                    dcorr.append(0.5 * (dc[q // 2] + dc[q // 2 + 1]))
        corr = jnp.stack(corr, axis=0)

        or1, mask_r, mask_b, first, _ = _split_masks(n, si, sj, skh, start)
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skh), 2)
        at_hi = kk == nc - 2  # fine slot of k = n-2 (p = 0 rows)
        # k expansion: fold lane a = kc-1. Odd fine k = 2kk+1 (p = 0)
        # averages parents kc = kk / kk+1 -> lanes kk-1 / kk, with the
        # unstored kc = 0 / nc-1 folding to lanes 0 / nc-3 (both reach
        # the target slot through the SAME backward roll); even fine
        # k = 2kk+2 (p = 1) injects kc = kk+1 -> lane kk.
        yr = jnp.where(first, corr, _roll(corr, 1, 2))
        plo = yr  # where(first, corr, roll): kk=0 parent kc=0 -> lane 0
        phi = jnp.where(at_hi, yr, corr)
        avg = 0.5 * (plo + phi)
        if with_delta:
            dstk = jnp.stack(dcorr, axis=0)
            avg = avg + 0.5 * (
                jnp.where(first, dstk, jnp.zeros_like(dstk))
                + jnp.where(at_hi, _roll(dstk, 1, 2), jnp.zeros_like(dstk))
            )
        corr_r = jnp.where(or1, avg, corr)
        corr_b = jnp.where(or1, corr, avg)
        er_s = ins2[0, slot] + jnp.where(mask_r, corr_r,
                                         jnp.zeros_like(corr))
        eb_s = ins2[1, slot] + jnp.where(mask_b, corr_b,
                                         jnp.zeros_like(corr))

        er_s, eb_s = rb(er_s, eb_s, ins2[2, slot], ins2[3, slot], start,
                        pin_ref)

        @pl.when(i >= 2)
        def _():
            for t in range(2):
                out_dma((or_hbm, ob_hbm)[t], tile2, sem_o, slot, i - 2,
                        t).wait()

        out_start = jnp.minimum(i * bi, n - bi)
        off = out_start - start
        ins2[0, slot] = er_s
        ins2[1, slot] = eb_s
        for t in range(2):
            tile2[slot, t] = ins2[t, slot, pl.ds(off, bi)]
            out_dma((or_hbm, ob_hbm)[t], tile2, sem_o, slot, i, t).start()

        @pl.when(i == nb - 1)
        def _():
            for t in range(2):
                out_dma((or_hbm, ob_hbm)[t], tile2, sem_o, slot, i,
                        t).wait()

        @pl.when(jnp.logical_and(i == nb - 1, nb >= 2))
        def _():
            for t in range(2):
                out_dma((or_hbm, ob_hbm)[t], tile2, sem_o, nslot, i - 1,
                        t).wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "block_i", "with_delta")
)
def mixed_prolong_smooth_msplit(ec_f, er, eb, rr_, rb_, pinp, sgn_c, h,
                                n_iter, n, block_i=16, with_delta=True):
    """e' = mixed_post_smooth(e + P(ec), r) fused on split pairs; ec_f
    is the coarse k-FOLD correction. sgn_c: pallas_mixed_fold.
    fold_edge_sign_planes at the COARSE level; pass with_delta=False
    (statically) when it is all zero. Caller must check
    msplit_ps_block_i(...) > 0 first."""
    nc = (n + 1) // 2
    _, sj, skh = er.shape
    _, sjc, skc_f = ec_f.shape
    assert skc_f == skh, (skc_f, skh)
    bi = block_i
    si = bi + 4 * n_iter + 1
    sic = (si + 1) // 2
    nb = pl.cdiv(n, bi)
    kernel = _make_ps_msplit_kernel(
        n, nc, si, sic, sj, skh, sjc, skc_f, bi, h, n_iter, nb, with_delta
    )
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((n, sj, skh), er.dtype),
            jax.ShapeDtypeStruct((n, sj, skh), er.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 2, si, sj, skh), er.dtype),
            pltpu.VMEM((2, sic, sjc, skc_f), er.dtype),
            pltpu.VMEM((2, 2, bi, sj, skh), er.dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )
    return _go_no_x64(call, er.dtype)(pinp, sgn_c, ec_f, er, eb, rr_, rb_)


# --------------------------------------- outer EFT residual + norm


def msplit_residual_block_i(n, sj, skh, itemsize=4, requested=8):
    return psp._split_auto_bi(n, sj, skh, 1, 8, 2, itemsize, requested)


def _eft_msplit_pair(u_hi, u_lo, f_hi, f_lo, inv_h2, n, si, sj, skh, gi0):
    """(r_r, r_b): compensated double-float mixed residual per color
    (the fold kernel's EFT math with split addressing: i/j neighbors
    from the stored BC-maintained planes, k-edge reads folded to the
    center's OWN hi/lo values — exact Neumann copies, hence exact in
    double-float too). Fold-ordered terms for bitwise parity."""
    or1, mask_r, mask_b, first, _ = _split_masks(n, si, sj, skh, gi0)
    klast = _at_klast(n, skh)
    selr = or1[1:-1]
    selb = jnp.logical_not(or1)[1:-1]

    def terms(dst, src, selm):
        cen = dst[1:-1]
        sc = src[1:-1]
        km, kp = _mixed_k_terms(sc, cen, selm, first, klast)
        return cen, [
            src[:-2], src[2:],
            _roll(sc, 1, 1), _roll(sc, -1, 1),
            km, kp,
        ]

    def one(c_idx, s_idx, fh, fl, mask, selm):
        hi_c, hi_n = terms(u_hi[c_idx], u_hi[s_idx], selm)
        lo_c, lo_n = terms(u_lo[c_idx], u_lo[s_idx], selm)
        r = _eft_residual(fh[1:-1], fl[1:-1], hi_c, hi_n, lo_c, lo_n,
                          inv_h2)
        z = jnp.zeros((1, sj, skh), r.dtype)
        r = jnp.concatenate([z, r, z], axis=0)
        return jnp.where(mask, r, jnp.zeros_like(r))

    r_r = one(0, 1, f_hi[0], f_lo[0], mask_r, selr)
    r_b = one(1, 0, f_hi[1], f_lo[1], mask_b, selb)
    return r_r, r_b


@functools.partial(jax.jit, static_argnames=("h", "n", "block_i"))
def residual_df_norm_msplit(u_hr, u_hb, u_lr, u_lb,
                            f_hr, f_hb, f_lr, f_lb, h, n, block_i=8):
    """(r_r, r_b, ||r||^2): the outer EFT residual + norm of the mixed
    defect iteration on split pairs (residual_df_norm_fold twin). The
    stored boundary planes must be BC-enforced (apply_bcs happens in
    the driver after each df add). Caller must check
    msplit_residual_block_i(...) > 0 first."""
    _, sj, skh = u_hr.shape
    inv_h2 = 1.0 / (h * h)
    bi = block_i
    si = bi + 2
    nb = pl.cdiv(n, bi)

    def body(slabs, start):
        uhr, uhb, ulr, ulb, fhr, fhb, flr, flb = slabs
        r_r, r_b = _eft_msplit_pair(
            (uhr, uhb), (ulr, ulb), (fhr, fhb), (flr, flb),
            inv_h2, n, si, sj, skh, start,
        )
        gg = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + start
        i = pl.program_id(0)
        owned = (gg >= i * bi) & (gg < (i + 1) * bi)
        part = jnp.sum(jnp.where(owned, r_r * r_r + r_b * r_b,
                                 jnp.zeros_like(r_r)))
        return [r_r, r_b], part

    kernel = psp._make_split_stream_kernel(
        n, si, sj, skh, bi, 1, nb, 8, 2, body, with_norm=True
    )
    call = psp._call_split_stream(
        kernel, n, si, sj, skh, bi, nb, 8, 2, u_hr.dtype, with_norm=True
    )
    r_r, r_b, nrm2 = call(u_hr, u_hb, u_lr, u_lb, f_hr, f_hb, f_lr, f_lb)
    return r_r, r_b, nrm2[0, 0]


# --------------------------------------------- driver-level BC helper


def apply_bcs_split_pair(ar, ab, n, pinp, valsp=None):
    """mixed_padded.apply_bcs_fold on a split pair (XLA, outer loop):
    cross-color x then y Neumann copies, then the Dirichlet pin with
    optional value packs (valsp: msplit_plane_packs of the patch
    values; None = zero pin, the correction-equation case)."""
    arx = ar.at[0].set(ab[1]).at[n - 1].set(ab[n - 2])
    abx = ab.at[0].set(ar[1]).at[n - 1].set(ar[n - 2])
    ary = arx.at[:, 0].set(abx[:, 1]).at[:, n - 1].set(abx[:, n - 2])
    aby = abx.at[:, 0].set(arx[:, 1]).at[:, n - 1].set(arx[:, n - 2])
    sj = ar.shape[1]
    je = (jnp.arange(sj) % 2 == 0)[:, None]

    def pick(p0, p1):
        return jnp.where(je, p0, p1)

    # rows i = 0 / n-1 are even (n odd), so q = j % 2 and p_red = q
    pr = (pick(pinp[0, 0], pinp[1, 0]), pick(pinp[0, 1], pinp[1, 1]))
    pb = (pick(pinp[1, 0], pinp[0, 0]), pick(pinp[1, 1], pinp[0, 1]))
    if valsp is None:
        z = jnp.zeros_like(ar[0])
        vr = vb = (z, z)
    else:
        vr = (pick(valsp[0, 0], valsp[1, 0]), pick(valsp[0, 1], valsp[1, 1]))
        vb = (pick(valsp[1, 0], valsp[0, 0]), pick(valsp[1, 1], valsp[0, 1]))
    ary = ary.at[0].set(jnp.where(pr[0] > 0.5, vr[0], ary[0]))
    ary = ary.at[n - 1].set(jnp.where(pr[1] > 0.5, vr[1], ary[n - 1]))
    aby = aby.at[0].set(jnp.where(pb[0] > 0.5, vb[0], aby[0]))
    aby = aby.at[n - 1].set(jnp.where(pb[1] > 0.5, vb[1], aby[n - 1]))
    return ary, aby
