"""k-FOLD layout for the mixed-BC (electrospray) fused kernels.

The Dirichlet headline's k-trim layout (pallas3d.padded_shape_trim)
cannot drop the electrospray's k boundary planes — they hold LIVE
homogeneous-Neumann copy values, not zeros. But the copy-BC *fold*
that pallas_mixed already performs in-kernel (mg_3d_bkup.c:84-133
semantics: an interior stencil only ever reads a boundary point with
one boundary coordinate, whose copy value is the reading point's own
current value) means those planes never need to be STORED either:

    k-FOLD layout: lanes hold k = 1..n-2 only (slot kk = k-1), i.e.
    rup(n-2, 128) lanes — 384->256 at 257, 256->128 at 129: 2/3
    (resp. 1/2) of the HBM traffic and computed lanes of every mixed
    kernel, the mixed twin of the Dirichlet k-trim win.

The k=0 / k=n-1 planes are reconstructed exactly on unpack (they are
copies of the adjacent stored plane under the reference's z-last BC
overwrite priority, ops.stencils_3d.apply_neumann_copy). i and j keep
their boundary planes: i slabs stream through VMEM anyway and j saves
at most one 8-row sublane tile.

Contents:
  * layout helpers: fold_shape / pack_fold / unpack_fold /
    fold_pin_planes / fold_vals_planes / fold_to_full / full_to_fold
  * the fold smoother body + BC pass (k selects shifted; no z copies)
  * fused stages on the fold layout: RB smoother (+from-zero),
    residual+full-weighting restrict, prolong+correct+post-smooth,
    and the outer EFT residual+norm — mirrors of the pallas_mixed /
    pallas3d kernels with fold-coordinate bands and masks.

Reference parity: mg_3d_bkup.c (whole program) via mixed_bc; the
layout changes nothing about the iterates on interior nodes (folded
reads are exact copies), verified by tests/test_mixed_fold.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_mixed as pm
from multigrid_parallel_tpu.ops.pallas3d import (
    _VMEM_BUDGET,
    _VMEM_LIMIT,
    _band_matrix,
    _eft_residual,
    _interpret,
    _prolong_band_j,
    _roll,
    _rup,
    _write_tile,
)


# ------------------------------------------------------------- layout


def fold_shape(n: int):
    """(n, rup(n, 8), rup(n-2, 128)): lanes store k = 1..n-2 only."""
    return (n, _rup(n, 8), _rup(n - 2, 128))


def fold_pays(n: int) -> bool:
    """True when the fold actually reduces the lane count (n >= 129
    for 2^k+1 grids); below that it is correct but free."""
    return fold_shape(n)[2] < pk.padded_shape(n)[2]


def pack_fold(x_pad: jnp.ndarray, n: int) -> jnp.ndarray:
    """Full padded (n, sj, sk) -> fold (n, sj, skf): drop the k=0 and
    k=n-1 planes (whose values are copies of their stored neighbors)."""
    _, sj, skf = fold_shape(n)
    out = x_pad[:, :, 1 : n - 1]
    return jnp.pad(out, ((0, 0), (0, 0), (0, skf - (n - 2))))


def unpack_fold(xf: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fold -> full padded, reconstructing the k faces as Neumann
    copies (exact: apply_neumann_copy's z-last priority makes every
    k-face node, edges and corners included, a copy of the adjacent
    stored plane). Dirichlet patch values on k-face EDGES of the x
    faces are re-pinned by the caller where needed (unpack_mixed_fold
    _solution re-applies the full BC pass in f64)."""
    _, sj, sk = pk.padded_shape(n)
    body = xf[:, :, : n - 2]
    out = jnp.concatenate(
        [body[:, :, :1], body, body[:, :, -1:]], axis=2
    )
    return jnp.pad(out, ((0, 0), (0, 0), (0, sk - n)))


def fold_to_full_rhs(rc_f: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fold-layout RHS (interior-only residual) -> full padded with
    ZERO k boundary planes (what restrict_padded would have emitted)."""
    _, sj, sk = pk.padded_shape(n)
    y = jnp.zeros((n, sj, sk), rc_f.dtype)
    return y.at[:, :, 1 : n - 1].set(rc_f[:, :, : n - 2])


def full_to_fold(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Full padded correction -> fold layout (drop k boundary planes;
    the fold transfer bands reconstruct their copy values)."""
    return pack_fold(x, n)


def fold_pin_planes(problem, n: int, sj: int, skf: int):
    """(2, sj, skf) f32 x-face Dirichlet patch masks in fold k
    coordinates (pallas_mixed.dirichlet_pin_planes sliced to the
    stored k range)."""
    _, sjp, skp = pk.padded_shape(n)
    full = pm.dirichlet_pin_planes(problem, n, sjp, skp)
    out = full[:, :, 1 : n - 1]
    out = jnp.pad(out, ((0, 0), (0, 0), (0, skf - (n - 2))))
    return out[:, :sj]


def fold_edge_sign_planes(problem, n: int, sj: int, skf: int):
    """(2, sj, skf) signed coefficient planes for the prolong edge fix.

    The fold band reconstructs the unstored k-face value of an x-face
    plane as its stored neighbor column — exact EXCEPT where the pin
    (applied LAST, after the z copy, matching _apply_bcs_slab priority)
    differs between the k-face node and its stored neighbor:

        true(k=0)   = 0 if pin(j,0) else u_nbr(j,1)
        stored(k=1) = 0 if pin(j,1) else u_nbr(j,1)
        delta       = (pin(j,1) - pin(j,0)) * u_nbr(j,1)

    (u_nbr = the adjacent interior i plane, present in the coarse
    slab). Nonzero only at columns kk=0 / kk=n-3 of the two x faces,
    and only on grids coarse enough for the extractor annulus to reach
    the k-edge-adjacent plane (mg_3d_bkup.c geometry: never at fine
    257^3 levels — callers should statically skip when all-zero)."""
    _, sjp, skp = pk.padded_shape(n)
    full = pm.dirichlet_pin_planes(problem, n, sjp, skp)
    sgn = jnp.zeros((2, sj, skf), full.dtype)
    sgn = sgn.at[:, :sjp, 0].set(full[:, :, 1] - full[:, :, 0])
    sgn = sgn.at[:, :sjp, n - 3].set(full[:, :, n - 2] - full[:, :, n - 1])
    return sgn[:, :sj]


# ----------------------------------------------------- masks + bodies


def _fold_masks(n, si, sj, skf, g0):
    """Interior + parity masks for an (si, sj, skf) fold slab at global
    plane g0. Stored lane kk maps to global k = kk + 1."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + g0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skf), 2)
    interior = (
        (ii >= 1) & (ii <= n - 2) & (jj >= 1) & (jj <= n - 2)
        & (kk <= n - 3)
    )
    parity = (ii + jj + kk + 1) % 2
    return interior, parity


def _apply_bcs_slab_fold(u, g0, n, si, sj, skf, pin0, pin1):
    """The in-kernel BC pass on a fold slab: x and y whole-face Neumann
    copies (same order/priority as pallas_mixed._apply_bcs_slab) + the
    zero Dirichlet pin. No z copies — the k faces are not stored."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + g0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
    u = jnp.where(ii == 0, jnp.concatenate([u[1:], u[:1]], axis=0), u)
    u = jnp.where(ii == n - 1, jnp.concatenate([u[-1:], u[:-1]], axis=0), u)
    u = jnp.where(jj == 0, _roll(u, -1, 1), u)
    u = jnp.where(jj == n - 1, _roll(u, 1, 1), u)
    pin = jnp.where(ii == 0, pin0[None], jnp.zeros_like(u))
    pin = jnp.where(ii == n - 1, pin1[None], pin)
    return jnp.where(pin > 0.5, jnp.zeros_like(u), u)


def _mixed_rb_body_fold(h, n_iter, red_first, n, si, sj, skf):
    """pallas_mixed._mixed_rb_body in fold k coordinates: the copy-BC
    folds at k edges move to stored slots kk == 0 / n-3 and the final
    BC pass skips the (unstored) z faces. Same arithmetic per interior
    node — iterates are bit-identical to the full-layout body."""
    h2 = h * h
    colors = (pk.RED, pk.BLACK) if red_first else (pk.BLACK, pk.RED)

    def body(eu, ef, g0, pin0, pin1):
        interior, parity = _fold_masks(n, si, sj, skf, g0)
        masks = {c: interior[1:-1] & (parity[1:-1] == c) for c in set(colors)}
        h2ef = h2 * ef[1:-1]
        gi = jax.lax.broadcasted_iota(jnp.int32, (si - 2, 1, 1), 0) + g0 + 1
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skf), 2)
        at_i1 = gi == 1
        at_in = gi == n - 2
        at_j1 = jj == 1
        at_jn = jj == n - 2
        at_k1 = kk == 0
        at_kn = kk == n - 3
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
        return _apply_bcs_slab_fold(eu, g0, n, si, sj, skf, pin0, pin1)

    return body


# ------------------------------------------------------ smoother stage


def mixed_fold_block_i(n, sj, skf, n_iter, itemsize=4, requested=8):
    """block_i for the fold smoother stages, or 0 (same estimate shape
    as pallas_mixed.mixed_block_i on the fold plane size)."""
    return pm.mixed_block_i(n, sj, skf, n_iter, itemsize, requested)


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "red_first", "block_i")
)
def mixed_rb_smooth_fold(e_f, r_f, pin, h, n_iter, n, red_first=True,
                         block_i=8):
    """All 2*n_iter mixed-BC RB half-sweeps on the fold layout, one HBM
    pass. pin: fold_pin_planes(...)."""
    _, sj, skf = e_f.shape
    bi = block_i
    si = bi + 4 * n_iter
    nb = pl.cdiv(n, bi)
    rb = _mixed_rb_body_fold(h, n_iter, red_first, n, si, sj, skf)

    def body(slabs, g0, pin0, pin1):
        eu, ef = slabs
        return rb(eu, ef, g0, pin0, pin1)

    kernel = pm._make_mixed_kernel(n, si, sj, skf, bi, nb, 2, body)
    return pm._mixed_call(kernel, 2, n, si, sj, skf, bi, e_f.dtype)(
        pin, e_f, r_f
    )


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "red_first", "block_i")
)
def mixed_rb_smooth_from_zero_fold(r_f, pin, h, n_iter, n, red_first=True,
                                   block_i=8):
    """mixed_rb_smooth_fold with an implicit zero initial guess."""
    _, sj, skf = r_f.shape
    bi = block_i
    si = bi + 4 * n_iter
    nb = pl.cdiv(n, bi)
    rb = _mixed_rb_body_fold(h, n_iter, red_first, n, si, sj, skf)

    def body(slabs, g0, pin0, pin1):
        (ef,) = slabs
        return rb(jnp.zeros_like(ef), ef, g0, pin0, pin1)

    kernel = pm._make_mixed_kernel(n, si, sj, skf, bi, nb, 1, body)
    return pm._mixed_call(kernel, 1, n, si, sj, skf, bi, r_f.dtype)(pin, r_f)


# --------------------------------------- fused residual + restriction


def _restrict_band_kt_fold(skc_f, skf, n, nc, dtype):
    """(coarse skc_f, fine skf) TRANSPOSED full-weighting band in fold
    coordinates: coarse slot a (kc = a+1) sums fine slots 2a..2a+2
    (k = 2a+1..2a+3) with (0.25, 0.5, 0.25); rows a <= nc-3 only."""
    a = jax.lax.broadcasted_iota(jnp.int32, (skc_f, skf), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (skc_f, skf), 1)
    d = b - 2 * a
    val = jnp.where(
        d == 1, 0.5,
        jnp.where(jnp.logical_or(d == 0, d == 2), 0.25, 0.0),
    ).astype(dtype)
    ok = (a <= nc - 3) & (b <= n - 3)
    return jnp.where(ok, val, jnp.zeros_like(val)).T


def _make_rr_fold_kernel(n, si, sj, skf, bi, h, nc, sjc, skc_f, nb):
    """pallas3d._make_residual_restrict_kernel on the fold layout: the
    interior residual's k-neighbor reads at stored edge slots fold to
    the center value (exact Neumann copies); i/j neighbors read the
    smoother-maintained stored boundary planes. j band unchanged; k
    band in fold coordinates."""
    inv_h2 = 1.0 / (h * h)

    def fs_of(blk):
        return jnp.clip(2 * blk * bi - 2, 0, n - si)

    def in_dma(hbm, ref2, sem2, slot, blk):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(fs_of(blk), si)], ref2.at[slot], sem2.at[slot]
        )

    def out_dma(out_hbm, tile2, sem2, slot, row_base):
        return pltpu.make_async_copy(
            tile2.at[slot], out_hbm.at[pl.ds(row_base, bi)], sem2.at[slot]
        )

    def row_base_of(blk):
        return fs_of(blk) // 2 + 1  # fs is always even

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

        fs = fs_of(i)
        row_base = row_base_of(i)
        eu = eu2[slot]
        ef = ef2[slot]
        interior, _ = _fold_masks(n, si, sj, skf, fs)
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skf), 2)
        cen = eu[1:-1]
        km = jnp.where(kk == 0, cen, _roll(cen, 1, 2))
        kp = jnp.where(kk == n - 3, cen, _roll(cen, -1, 2))
        nbr = (
            eu[:-2] + eu[2:]
            + _roll(cen, 1, 1) + _roll(cen, -1, 1)
            + km + kp
        )
        rr = ef[1:-1] - inv_h2 * (nbr - 6.0 * cen)
        rr = jnp.where(interior[1:-1], rr, jnp.zeros_like(rr))

        dtype = rr.dtype
        aj = _band_matrix(sjc, sj, nc - 2, dtype)
        ak_t = _restrict_band_kt_fold(skc_f, skf, n, nc, dtype)
        jj = jax.lax.broadcasted_iota(jnp.int32, (sjc, skc_f), 0)
        kc = jax.lax.broadcasted_iota(jnp.int32, (sjc, skc_f), 1)
        colmask = (jj >= 1) & (jj <= nc - 2) & (kc <= nc - 3)

        @pl.when(i >= 2)
        def _():
            out_dma(out_hbm, tile2, sem_o, slot, row_base_of(i - 2)).wait()

        for t in range(bi):
            plane = 0.25 * rr[2 * t] + 0.5 * rr[2 * t + 1] + 0.25 * rr[2 * t + 2]
            y = jnp.dot(aj, plane, precision=jax.lax.Precision.HIGHEST)
            z = jnp.dot(y, ak_t, precision=jax.lax.Precision.HIGHEST)
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


def rr_fold_block_i(n, sj, skf, itemsize=4, requested=8):
    """block_i for residual_restrict_fold, or 0."""
    plane = sj * skf * itemsize
    for bi in (requested, 8, 4, 2):
        if bi > requested:
            continue
        si = 2 * bi + 3
        est = 2 * 2 * si * plane + 3 * si * plane
        nc = (n + 1) // 2
        if est <= _VMEM_BUDGET and n >= si and pl.cdiv(nc, bi) >= 2:
            return bi
    return 0


@functools.partial(jax.jit, static_argnames=("h", "n", "block_i"))
def residual_restrict_fold(u_f, r_f, h, n, block_i=8):
    """Fused interior-residual + full-weighting restriction, fold
    layout in AND out: (n, sj, skf) -> (nc, sjc, skc_f), one HBM pass.
    Caller must check rr_fold_block_i(...) > 0 first."""
    nc = (n + 1) // 2
    _, sj, skf = u_f.shape
    _, sjc, skc_f = fold_shape(nc)
    bi = block_i
    si = 2 * bi + 3
    nb = pl.cdiv(nc, bi)
    kernel = _make_rr_fold_kernel(n, si, sj, skf, bi, h, nc, sjc, skc_f, nb)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((nc, sjc, skc_f), u_f.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, si, sj, skf), u_f.dtype),
            pltpu.VMEM((2, si, sj, skf), u_f.dtype),
            pltpu.VMEM((2, bi, sjc, skc_f), u_f.dtype),
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

    rc = go(u_f, r_f)
    z = jnp.zeros((1, sjc, skc_f), rc.dtype)
    return jnp.concatenate([z, rc[1 : nc - 1], z], axis=0)


# --------------------------------- fused prolong + correct + smooth


def _prolong_band_kt_fold(skc_f, skf, n, nc, dtype):
    """(coarse skc_f, fine skf) transposed interpolation band in fold
    coordinates. Fine slot kk (k = kk+1): odd k interpolates the two
    parent coarse slots, even k injects its aligned parent; the
    UNSTORED coarse boundary planes kc = 0 / nc-1 are Neumann copies
    of their stored neighbors, so their weights fold onto columns
    c = 0 / nc-3 (weight 1.0 at the two fine edge slots)."""
    c = jax.lax.broadcasted_iota(jnp.int32, (skc_f, skf), 0)
    kkf = jax.lax.broadcasted_iota(jnp.int32, (skc_f, skf), 1)
    d = kkf - 2 * c
    val = jnp.where(
        d == 1, 1.0,
        jnp.where(jnp.logical_or(d == 0, d == 2), 0.5, 0.0),
    ).astype(dtype)
    edge_lo = (c == 0) & (kkf == 0)
    edge_hi = (c == nc - 3) & (kkf == n - 3)
    val = jnp.where(jnp.logical_or(edge_lo, edge_hi),
                    jnp.ones_like(val), val)
    ok = (c <= nc - 3) & (kkf <= n - 3)
    return jnp.where(ok, val, jnp.zeros_like(val))


def _delta_band_kt_fold(skc_f, skf, n, nc, dtype):
    """(coarse skc_f, fine skf) transposed band carrying the pin-edge
    delta (fold_edge_sign_planes) to the fine edge slots: the unstored
    coarse kc=0 / kc=nc-1 planes contribute weight 0.5 to fine k=1
    (slot 0) / k=n-2 (slot n-3) only."""
    c = jax.lax.broadcasted_iota(jnp.int32, (skc_f, skf), 0)
    kkf = jax.lax.broadcasted_iota(jnp.int32, (skc_f, skf), 1)
    hit = ((c == 0) & (kkf == 0)) | ((c == nc - 3) & (kkf == n - 3))
    return jnp.where(hit, jnp.full((skc_f, skf), 0.5, dtype),
                     jnp.zeros((skc_f, skf), dtype))


def mixed_fold_prolong_block_i(n, skj, skf, n_iter, itemsize=4, requested=8):
    """block_i for mixed_prolong_smooth_fold, or 0 (separate coarse
    double-buffer term, as pallas_mixed.mixed_prolong_block_i)."""
    nc = (n + 1) // 2
    _, sjc, skc_f = fold_shape(nc)
    plane = skj * skf * itemsize
    planec = sjc * skc_f * itemsize
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


@functools.partial(
    jax.jit, static_argnames=("h", "n_iter", "n", "block_i", "with_delta")
)
def mixed_prolong_smooth_fold(ec_f, e_f, r_f, pin, sgn_c, h, n_iter, n,
                              block_i=8, with_delta=True):
    """e' = mixed_post_smooth(e + P(ec), r) in one pass on the fold
    layout (pallas_mixed.mixed_prolong_smooth_fused with fold bands +
    fold smoother body; coarse boundary participation happens through
    the band's edge folds instead of stored planes).

    sgn_c: fold_edge_sign_planes(...) at the COARSE level — the pin-
    priority correction to the band's edge folds (see that docstring).
    Pass with_delta=False (statically) when sgn_c is all zero (every
    fine level of the electrospray geometry) to skip the extra
    per-plane matmuls entirely."""
    nc = (n + 1) // 2
    _, sj, skf = e_f.shape
    _, sjc, skc_f = ec_f.shape
    bi = block_i
    si = bi + 4 * n_iter + 1
    sic = (si + 1) // 2
    nb = pl.cdiv(n, bi)
    rb = _mixed_rb_body_fold(h, n_iter, False, n, si, sj, skf)

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

    def kernel(pin_ref, sgn_ref, ec_hbm, u_hbm, f_hbm, out_hbm, eu2, ef2,
               ec2, tile2, sem_u, sem_f, sem_c, sem_o):
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
        pkt = _prolong_band_kt_fold(skc_f, skf, n, nc, dtype)
        dkt = _delta_band_kt_fold(skc_f, skf, n, nc, dtype)

        yc = []
        for c in range(sic):
            y = jnp.dot(pj, ec2[slot, c], precision=jax.lax.Precision.HIGHEST)
            out = jnp.dot(y, pkt, precision=jax.lax.Precision.HIGHEST)
            if with_delta:
                # pin-priority edge fix: the coarse x-face planes'
                # unstored k-edge values differ from the stored copy by
                # sgn * (adjacent interior plane) — fold it through its
                # own 0.5-weight band onto the fine edge slots.
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
                yd = jnp.dot(pj, sgn * nbr,
                             precision=jax.lax.Precision.HIGHEST)
                out = out + jnp.dot(yd, dkt,
                                    precision=jax.lax.Precision.HIGHEST)
            yc.append(out)
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
        out_shape=jax.ShapeDtypeStruct((n, sj, skf), e_f.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, si, sj, skf), e_f.dtype),
            pltpu.VMEM((2, si, sj, skf), e_f.dtype),
            pltpu.VMEM((2, sic, sjc, skc_f), e_f.dtype),
            pltpu.VMEM((2, bi, sj, skf), e_f.dtype),
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

    return go(pin, sgn_c, ec_f, e_f, r_f)


# --------------------------------------- outer EFT residual + norm


def fold_residual_block_i(n, sj, skf, itemsize=4, requested=8):
    """block_i for residual_df_norm_fold, or 0."""
    plane = sj * skf * itemsize
    for bi in (requested, 8, 4, 2):
        if bi > requested:
            continue
        si = bi + 2
        est = 4 * si * plane + 3 * si * plane + bi * plane
        if est <= _VMEM_BUDGET and n >= si and pl.cdiv(n, bi) >= 2:
            return bi
    return 0


def _make_residual_df_norm_fold_kernel(n, si, sj, skf, bi, h, nb):
    """pallas3d._make_residual_df_norm_kernel on the fold layout: the
    k-edge neighbor reads fold to the center's own hi/lo values (exact
    Neumann copies, hence exact in double-float too); i/j neighbors
    read the stored BC-maintained boundary planes (which hold the LIVE
    Dirichlet patch values on the x faces)."""
    inv_h2 = 1.0 / (h * h)

    def kernel(uhi_hbm, ulo_hbm, fhi_hbm, flo_hbm, out_hbm, nrm_ref,
               ehi_ref, elo_ref, efh_ref, efl_ref, tile_ref, acc_ref, sem):
        i = pl.program_id(0)
        start = jnp.clip(i * bi - 1, 0, n - si)
        for hbm, ref, s_idx in (
            (uhi_hbm, ehi_ref, 0), (ulo_hbm, elo_ref, 1),
            (fhi_hbm, efh_ref, 2), (flo_hbm, efl_ref, 3),
        ):
            pltpu.make_async_copy(hbm.at[pl.ds(start, si)], ref,
                                  sem.at[s_idx]).start()
        for hbm, ref, s_idx in (
            (uhi_hbm, ehi_ref, 0), (ulo_hbm, elo_ref, 1),
            (fhi_hbm, efh_ref, 2), (flo_hbm, efl_ref, 3),
        ):
            pltpu.make_async_copy(hbm.at[pl.ds(start, si)], ref,
                                  sem.at[s_idx]).wait()

        interior, _ = _fold_masks(n, si, sj, skf, start)
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, skf), 2)
        at_k1 = kk == 0
        at_kn = kk == n - 3

        def slab_nbrs(e):
            x = e[1:-1]
            km = jnp.where(at_k1, x, _roll(x, 1, 2))
            kp = jnp.where(at_kn, x, _roll(x, -1, 2))
            return x, [
                e[:-2], e[2:],
                _roll(x, 1, 1), _roll(x, -1, 1),
                km, kp,
            ]

        hi_c, hi_n = slab_nbrs(ehi_ref[:])
        lo_c, lo_n = slab_nbrs(elo_ref[:])
        r = _eft_residual(
            efh_ref[1:-1], efl_ref[1:-1], hi_c, hi_n, lo_c, lo_n, inv_h2
        )
        z = jnp.zeros((1, sj, skf), r.dtype)
        r = jnp.concatenate([z, r, z], axis=0)
        r = jnp.where(interior, r, jnp.zeros_like(r))

        gg = jax.lax.broadcasted_iota(jnp.int32, (si, 1, 1), 0) + start
        owned = (gg >= i * bi) & (gg < (i + 1) * bi)
        part = jnp.sum(jnp.where(owned, r * r, jnp.zeros_like(r)))

        @pl.when(i == 0)
        def _():
            acc_ref[0, 0] = jnp.zeros((), r.dtype)

        acc_ref[0, 0] = acc_ref[0, 0] + part

        @pl.when(i == nb - 1)
        def _():
            nrm_ref[0, 0] = acc_ref[0, 0]

        efh_ref[:] = r
        out_start = jnp.minimum(i * bi, n - bi)
        _write_tile(efh_ref, out_hbm, tile_ref, sem, out_start - start,
                    out_start, bi)

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "n", "block_i"))
def residual_df_norm_fold(u_hi, u_lo, f_hi, f_lo, h, n, block_i=8):
    """(r_hi, ||r||^2) in one fused pass on the fold layout. Caller
    must check fold_residual_block_i(...) > 0 first."""
    _, sj, skf = u_hi.shape
    bi = block_i
    si = bi + 2
    nb = pl.cdiv(n, bi)
    kernel = _make_residual_df_norm_fold_kernel(n, si, sj, skf, bi, h, nb)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((n, sj, skf), u_hi.dtype),
            jax.ShapeDtypeStruct((1, 1), u_hi.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((si, sj, skf), u_hi.dtype),
            pltpu.VMEM((si, sj, skf), u_hi.dtype),
            pltpu.VMEM((si, sj, skf), u_hi.dtype),
            pltpu.VMEM((si, sj, skf), u_hi.dtype),
            pltpu.VMEM((bi, sj, skf), u_hi.dtype),
            pltpu.SMEM((1, 1), u_hi.dtype),
            pltpu.SemaphoreType.DMA((4,)),
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

    r, nrm2 = go(u_hi, u_lo, f_hi, f_lo)
    return r, nrm2[0, 0]
