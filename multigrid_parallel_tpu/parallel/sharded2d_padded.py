"""2D-mesh distributed performance path: fused Pallas under shard_map
on an (i, j) device mesh, in the lane-padded layout.

The 2D twin of parallel/sharded_padded.py: the i axis (planes) is
sharded over mesh axis 0 and the j axis (TPU sublanes) over mesh axis
1; k (lanes) stays on-device. Every hot stage runs the 2D ext kernels
of ops.pallas_sharded2d — one (i-ppermute + j-ppermute) halo exchange
feeds a whole fused stage — with masked-roll jnp fallbacks on levels too
small to pay a Pallas launch, and a gather-to-replicated coarse tail
reusing the single-chip padded cycle (cycles_padded). This is the tier
docs/SCALING.md's constant-volume weak scaling needs past the 1D plan's
plane budget (>16 chips at 1025³).

Layout contract:
  * level with n valid planes -> global (nx*Li, ny*SJL, SK) array,
    SK = rup(n, 128); pad rows (global i >= n), pad columns (global
    j >= n) and pad lanes are zero and masked everywhere.
  * Li is a multiple of 2**n_sharded; SJL of max(8·j_align, 2**n_sharded)
    — Pallas runs on the levels where the halved SJL stays a multiple
    of 8 (the sublane tile; ops.pallas_sharded2d's fixed HJ=8 halo),
    jnp fallbacks below.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.cycles import CycleConfig
from multigrid_parallel_tpu.hierarchy import Hierarchy
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_sharded as px1
from multigrid_parallel_tpu.ops import pallas_sharded2d as px2
from multigrid_parallel_tpu.ops import stencils_3d as ops3
from multigrid_parallel_tpu.parallel.sharded import _perm_bwd, _perm_fwd
from multigrid_parallel_tpu.parallel.sharded_padded import _halo_bi
from multigrid_parallel_tpu.parallel.sharded2d import (
    ShardPlan2D,
    _prolong_band_local_np,
    _restrict_band_local_np,
    make_mesh_2d,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def plan_sharding_2d_padded(
    hier: Hierarchy, nx: int, ny: int, axes=("x", "y"), min_local: int = 4,
    j_align: int = 16, max_j_pad: float = 0.07,
) -> ShardPlan2D:
    """ShardPlan2D for the padded tier: fine_local_j is additionally
    rounded to ``j_align`` (a multiple of 8) so the finest
    log2(j_align/8)+1 sharded levels keep sublane-tile-aligned local j
    extents (Pallas-eligible); deeper levels take the jnp fallback.

    Deep sharding forces 2**n_sharded alignment, which can inflate the
    local j extent by up to ~50% (1025³ on a 4×4 mesh: 257 -> 384
    columns at n_sharded=7) — enough padding to push the finest level's
    plane past the VMEM budget and off the fused path. n_sharded is
    therefore reduced while that strictly shrinks the aligned extent
    and the j padding still exceeds ``max_j_pad`` (the forgone depth
    only moves small replicated-tail levels, which every device
    recomputes cheaply). 7%: per-axis padding compounds across i AND j
    (~1.26x finest volume at the 12.5% cap, measured as exactly the 2D
    tier's 1x1 tax at 513^3), while the replicated tail it buys is a
    <= 65^3 subtree."""
    n_sharded = 1
    while n_sharded < hier.num_levels - 1 and (
        min(
            hier.sizes[hier.num_levels - 1 - n_sharded] // nx,
            hier.sizes[hier.num_levels - 1 - n_sharded] // ny,
        )
        >= min_local
    ):
        n_sharded += 1

    fj0 = -(-hier.finest_n // ny)

    def fj_of(ns):
        return _round_up(fj0, max(j_align, 1 << ns))

    while (n_sharded > 1 and fj_of(n_sharded) - fj0 > max_j_pad * fj0
           and fj_of(n_sharded - 1) < fj_of(n_sharded)):
        n_sharded -= 1
    align = 1 << n_sharded
    fi = _round_up(-(-hier.finest_n // nx), align)
    fj = _round_up(fj0, max(j_align, align))
    return ShardPlan2D(
        nx=nx, ny=ny, axes=tuple(axes), n_sharded=n_sharded,
        fine_local_i=fi, fine_local_j=fj,
    )


def _halo_ext_i(x, axis: str, nd: int, k: int):
    left = jax.lax.ppermute(x[-k:], axis, _perm_fwd(nd))
    right = jax.lax.ppermute(x[:k], axis, _perm_bwd(nd))
    return jnp.concatenate([left, x, right], axis=0)


def _halo_ext_j(x, axis: str, nd: int, k: int):
    left = jax.lax.ppermute(x[:, -k:], axis, _perm_fwd(nd))
    right = jax.lax.ppermute(x[:, :k], axis, _perm_bwd(nd))
    return jnp.concatenate([left, x, right], axis=1)


def _halo_parts2d(x, plan: ShardPlan2D, kl: int, kr: int,
                  tail_local: int = 0):
    """(B, lh, rhc) for the i-halo-DMA 2D kernels (ops.pallas_sharded2d
    *_halo2d): B is the J-EXTENDED local array — the one remaining
    materialized copy, replacing the ext2d tier's TWO concatenated
    copies (i-ext then j-ext, docs/SCALING.md's double tax) — and
    lh/rhc are small j-extended i-edge buffers assembled in-kernel by
    tri-source DMA. Corner (diagonal-neighbor) values are correct
    because the i ppermute happens AFTER the j extension. ``tail_local``
    prepends that many local tail rows to rhc (the composite the
    overlapped last block reads — see pallas_sharded._tri_dma)."""
    ax_i, ax_j = plan.axes
    B = _halo_ext_j(x, ax_j, plan.ny, px2.HJ)
    lh = jax.lax.ppermute(B[-kl:], ax_i, _perm_fwd(plan.nx))
    rh = jax.lax.ppermute(B[:kr], ax_i, _perm_bwd(plan.nx))
    if tail_local:
        rh = jnp.concatenate([B[B.shape[0] - tail_local:], rh], axis=0)
    return (B, lh, rh)


def _halo_parts2dj(x, plan: ShardPlan2D, kl: int, kr: int,
                   tail_local: int = 0):
    """(x, jl, jr, lh, rhc) for the fully COPY-FREE j-DMA 2D kernels
    (ops.pallas_sharded2d _tri_dma2d): the raw local array, the two
    (Li, HJ, K) j-halo buffers, and small J-EXTENDED i-edge buffers —
    no (Li, SJL+16) array is ever materialized; the kernels stitch each
    slab from up to 9 tile-aligned DMAs. Corner (diagonal-neighbor)
    values are correct because the i ppermute happens AFTER the edge
    rows are j-extended (two-hop j-then-i exchange). ``tail_local``
    prepends that many j-extended local tail rows to rhc (the composite
    the overlapped last block reads)."""
    ax_i, ax_j = plan.axes
    jl = jax.lax.ppermute(x[:, -px2.HJ:], ax_j, _perm_fwd(plan.ny))
    jr = jax.lax.ppermute(x[:, :px2.HJ], ax_j, _perm_bwd(plan.ny))

    def jrows(sl):
        return jnp.concatenate([jl[sl], x[sl], jr[sl]], axis=1)

    lh = jax.lax.ppermute(jrows(slice(-kl, None)), ax_i,
                          _perm_fwd(plan.nx))
    rh = jax.lax.ppermute(jrows(slice(None, kr)), ax_i,
                          _perm_bwd(plan.nx))
    if tail_local:
        rh = jnp.concatenate([jrows(slice(x.shape[0] - tail_local, None)),
                              rh], axis=0)
    return (x, jl, jr, lh, rh)


def _gij0(plan: ShardPlan2D, depth: int, halo_i: int):
    """(2,) i32 [global i of ext row 0, global j of ext col 0]."""
    gi = jax.lax.axis_index(plan.axes[0]) * plan.local_i(depth) - halo_i
    gj = jax.lax.axis_index(plan.axes[1]) * plan.local_j(depth) - px2.HJ
    return jnp.stack([gi, gj]).astype(jnp.int32)


# -------------------- jnp fallback local ops (padded layout, 2D mesh)


def _local_masks2d(plan, depth, Li, Lj, n, sk, color=None):
    gi0 = jax.lax.axis_index(plan.axes[0]) * plan.local_i(depth)
    gj0 = jax.lax.axis_index(plan.axes[1]) * plan.local_j(depth)
    ii = jax.lax.broadcasted_iota(jnp.int32, (Li, 1, 1), 0) + gi0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, Lj, 1), 1) + gj0
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sk), 2)
    interior = (
        (ii >= 1) & (ii <= n - 2) & (jj >= 1) & (jj <= n - 2)
        & (kk >= 1) & (kk <= n - 2)
    )
    if color is None:
        return interior
    return interior & (((ii + jj + kk) % 2) == color)


def _nbr_sum_2dp(u, plan):
    ax_i, ax_j = plan.axes
    ei = _halo_ext_i(u, ax_i, plan.nx, 1)
    ej = _halo_ext_j(u, ax_j, plan.ny, 1)
    return (
        ei[:-2] + ei[2:]
        + ej[:, :-2] + ej[:, 2:]
        + jnp.roll(u, 1, 2) + jnp.roll(u, -1, 2)
    )


def rb_smooth_local2dp(e, r, h, n_iter, n, plan, depth, red_first=True):
    h2 = h * h
    Li, Lj, sk = e.shape
    colors = (ops3.RED, ops3.BLACK) if red_first else (ops3.BLACK, ops3.RED)
    masks = {c: _local_masks2d(plan, depth, Li, Lj, n, sk, c)
             for c in set(colors)}
    for _ in range(n_iter):
        for c in colors:
            upd = (_nbr_sum_2dp(e, plan) - h2 * r) * (1.0 / 6.0)
            e = jnp.where(masks[c], upd, e)
    return e


def residual_local2dp(e, r, h, n, plan, depth):
    inv_h2 = 1.0 / (h * h)
    res = r - inv_h2 * (_nbr_sum_2dp(e, plan) - 6.0 * e)
    mask = _local_masks2d(plan, depth, e.shape[0], e.shape[1], n, e.shape[2])
    return jnp.where(mask, res, jnp.zeros_like(res))


@functools.lru_cache(maxsize=None)
def _restrict_k_np(nf: int, skf: int = 0, skc: int = 0):
    """(SKc, SKf) padded full-width 3-tap k restriction matrix. skf/skc
    override the widths (k-trim layout); 0 = full padded widths."""
    nc = (nf + 1) // 2
    skf = skf or pk.padded_shape(nf)[2]
    skc = skc or pk.padded_shape(nc)[2]
    m = np.zeros((skc, skf))
    for c in range(1, nc - 1):
        m[c, 2 * c - 1 : 2 * c + 2] = (0.25, 0.5, 0.25)
    return m


@functools.lru_cache(maxsize=None)
def _prolong_k_np(nc: int, skc: int = 0, skf: int = 0):
    """(SKf, SKc) padded full-width interpolation k matrix; trim
    layouts pass their widths (taps into dropped boundary cols vanish —
    the coarse boundary value is zero)."""
    nf = 2 * nc - 1
    skf = skf or pk.padded_shape(nf)[2]
    skc = skc or pk.padded_shape(nc)[2]
    m = np.zeros((skf, skc))
    fine = 2 * np.arange(nc)
    ok = fine < skf
    m[fine[ok], np.arange(nc)[ok]] = 1.0
    fo = 2 * np.arange(nc - 1) + 1
    m[fo, np.arange(nc - 1)] = 0.5
    hi = np.arange(nc - 1) + 1
    ok = hi < skc
    m[fo[ok], hi[ok]] = 0.5
    return m


def restrict_local2dp(res, n, plan, depth):
    """(Li, Lj, SK) residual -> (Li/2, Lj/2, SKc): k full-width padded
    matmul, i and j local band matmuls over 1-halo exchanges."""
    Li, Lj, _ = res.shape
    skm = jnp.asarray(
        _restrict_k_np(n, res.shape[2], cp._coarse_k_width(n, res.shape[2])),
        res.dtype,
    )
    t = jnp.einsum("ck,ijk->ijc", skm, res, precision=ops3._HIGHEST)
    ej = _halo_ext_j(t, plan.axes[1], plan.ny, 1)
    bj = jnp.asarray(_restrict_band_local_np(Lj), res.dtype)
    t = jnp.einsum("cj,ijk->ick", bj, ej, precision=ops3._HIGHEST)
    ei = _halo_ext_i(t, plan.axes[0], plan.nx, 1)
    bi = jnp.asarray(_restrict_band_local_np(Li), res.dtype)
    t = jnp.einsum("ci,ijk->cjk", bi, ei, precision=ops3._HIGHEST)
    nc = (n + 1) // 2
    mask = _local_masks2d(plan, depth + 1, t.shape[0], t.shape[1], nc,
                          t.shape[2])
    return jnp.where(mask, t, jnp.zeros_like(t))


def prolong_correct_local2dp(ec, ef, nc, plan, depth):
    """ef += trilinear interp of ec (padded local blocks)."""
    pkm = jnp.asarray(_prolong_k_np(nc, ec.shape[2], ef.shape[2]), ec.dtype)
    t = jnp.einsum("kc,ijc->ijk", pkm, ec, precision=ops3._HIGHEST)
    ej = jnp.concatenate(
        [t, jax.lax.ppermute(t[:, :1], plan.axes[1], _perm_bwd(plan.ny))],
        axis=1,
    )
    bj = jnp.asarray(_prolong_band_local_np(2 * t.shape[1]), ec.dtype)
    t = jnp.einsum("fj,ijk->ifk", bj, ej, precision=ops3._HIGHEST)
    ei = jnp.concatenate(
        [t, jax.lax.ppermute(t[:1], plan.axes[0], _perm_bwd(plan.nx))],
        axis=0,
    )
    bi = jnp.asarray(_prolong_band_local_np(2 * t.shape[0]), ec.dtype)
    fine = jnp.einsum("fi,ijk->fjk", bi, ei, precision=ops3._HIGHEST)
    nf = 2 * nc - 1
    gi0 = jax.lax.axis_index(plan.axes[0]) * plan.local_i(depth)
    gj0 = jax.lax.axis_index(plan.axes[1]) * plan.local_j(depth)
    ii = jax.lax.broadcasted_iota(jnp.int32, (fine.shape[0], 1, 1), 0) + gi0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, fine.shape[1], 1), 1) + gj0
    valid = (ii <= nf - 1) & (jj <= nf - 1)
    fine = jnp.where(valid, fine, jnp.zeros_like(fine))
    return ef + fine


def _residual_df_norm_local2dp_jnp(u_hi, u_lo, f_hi, f_lo, h, n, plan):
    inv_h2 = 1.0 / (h * h)
    ax_i, ax_j = plan.axes

    def halo_nbrs(u):
        ei = _halo_ext_i(u, ax_i, plan.nx, 1)
        ej = _halo_ext_j(u, ax_j, plan.ny, 1)
        return [
            ei[:-2], ei[2:],
            ej[:, :-2], ej[:, 2:],
            jnp.roll(u, 1, 2), jnp.roll(u, -1, 2),
        ]

    r = pk._eft_residual(
        f_hi, f_lo, u_hi, halo_nbrs(u_hi), u_lo, halo_nbrs(u_lo), inv_h2
    )
    mask = _local_masks2d(plan, 0, u_hi.shape[0], u_hi.shape[1], n,
                          u_hi.shape[2])
    r = jnp.where(mask, r, jnp.zeros_like(r))
    return r, jnp.sum(r * r)


# ----------------------------------------------------- cycle + solver


def _use_pallas2d(n, Li, Lj, H, jnp_level_max, min_lj=None) -> bool:
    """Pallas needs the level big enough to pay the launch, i-halo
    coverage, and a sublane-tile-aligned local j extent. The default
    min_lj = 2*HJ covers the CYCLE kernels: the fixed HJ=8 fine halo
    must come from ONE neighbor, AND the prolong stage's COARSE ext
    needs an HJ-column halo from the Lj//2-wide coarse blocks (Lj == 8
    would silently clamp the coarse halo to 4 columns and shift the
    static band mapping — caught by review,
    tests/test_sharded2d_padded.py::test_lj8_level_falls_back).
    Kernels with no coarse ext (the residual_df norm step) pass
    min_lj=px2.HJ: they need only the fine one-neighbor halo."""
    if min_lj is None:
        min_lj = 2 * px2.HJ
    return (
        n > jnp_level_max
        and Li >= max(H + 2, 4)
        and Lj % 8 == 0
        and Lj >= min_lj
    )


def _build_local_cycle2d(
    hier32: Hierarchy,
    cfg: CycleConfig,
    plan: ShardPlan2D,
    jnp_level_max: int,
    block_i: int = 8,
):
    """cycle_local(e, r, from_zero) -> e' on local padded (Li, Lj, SK)
    blocks inside shard_map."""
    ax_i, ax_j = plan.axes
    n_smooth = cfg.n_smooth
    H = 2 * n_smooth
    assert H <= px2.HJ, (n_smooth, "fixed j halo covers n_smooth <= 4")
    rep_level = hier32.num_levels - 1 - plan.n_sharded
    sub = dataclasses.replace(hier32, num_levels=rep_level + 1)
    rep_cycle = cp.make_padded_correction_cycle(sub, cfg, jnp_level_max)
    n_rep = hier32.sizes[rep_level]
    assert plan.padded_i(plan.n_sharded) >= n_rep, (plan, n_rep)
    assert plan.padded_j(plan.n_sharded) >= n_rep, (plan, n_rep)

    def descend(e, r, level, depth, from_zero=False):
        n = hier32.sizes[level]
        if depth == plan.n_sharded:
            # Gather both axes to replicated; run the single-chip padded
            # cycle; re-slice this device's (i, j) block. The gathered j
            # extent (ny*Lj) can exceed the padded SJ — cut to n then
            # re-pad so rep_cycle sees its canonical layout.
            _, sj_rep, _ = pk.padded_shape(n)

            def to_rep(x):
                x = jax.lax.all_gather(x, ax_i, axis=0, tiled=True)[:n]
                x = jax.lax.all_gather(x, ax_j, axis=1, tiled=True)[:, :n]
                return jnp.pad(x, ((0, 0), (0, sj_rep - n), (0, 0)))

            r_rep = to_rep(r)
            if from_zero:
                e_rep = rep_cycle(None, r_rep, from_zero=True)
            else:
                e_rep = rep_cycle(to_rep(e), r_rep)
            Li = plan.local_i(depth)
            Lj = plan.local_j(depth)
            pad_i = plan.padded_i(depth) - n
            pad_j = plan.padded_j(depth) - e_rep.shape[1]
            e_pad = jnp.pad(e_rep, ((0, pad_i), (0, max(pad_j, 0)), (0, 0)))
            gi0 = (jax.lax.axis_index(ax_i) * Li).astype(jnp.int32)
            gj0 = (jax.lax.axis_index(ax_j) * Lj).astype(jnp.int32)
            z = jnp.zeros((), jnp.int32)
            return jax.lax.dynamic_slice(
                e_pad, (gi0, gj0, z), (Li, Lj, e_rep.shape[2])
            )

        Li = plan.local_i(depth)
        Lj = plan.local_j(depth)
        h = hier32.spacing(level)
        sk = r.shape[2]
        pal = _use_pallas2d(n, Li, Lj, H, jnp_level_max)
        nc = hier32.sizes[level - 1]
        sje = Lj + 2 * px2.HJ

        if not pal and n > jnp_level_max and Li >= max(H + 2, 4):
            # j-REPLICATED 1D tier (round 4, closes the Lj < 2*HJ
            # fallback of the dispatch map): when the local j extent is
            # too narrow for the 2D ext kernels, gather j to full width
            # and run the level on the 1D ext kernels (i stays sharded).
            # Every device in a j row computes identical replicated
            # values; the device's block is sliced back at the end — so
            # e.g. the 65^3 level of an 8x8 mesh stays on the fused
            # path instead of dropping to masked-roll jnp.
            _, sj_rep, _ = pk.padded_shape(n)
            bi_s1 = px1.ext_block_i(Li, sj_rep, sk, H, 2,
                                    requested=block_i)
            bi_r1 = px1.restrict_ext_block_i(Li // 2, sj_rep, sk)
            bi_p1 = px1.prolong_ext_block_i(Li, sj_rep, sk, n_smooth,
                                            requested=block_i)
            if bi_s1 and bi_r1 and bi_p1:
                def to_jrep(x, nv):
                    xg = jax.lax.all_gather(x, ax_j, axis=1,
                                            tiled=True)[:, :nv]
                    w = pk.padded_shape(nv)[1]
                    return jnp.pad(xg, ((0, 0), (0, w - nv), (0, 0)))

                def slice_j(x, ljl):
                    xp = jnp.pad(
                        x,
                        ((0, 0), (0, max(plan.ny * ljl - x.shape[1], 0)),
                         (0, 0)),
                    )
                    gj0 = (jax.lax.axis_index(ax_j) * ljl).astype(jnp.int32)
                    z = jnp.zeros((), jnp.int32)
                    return jax.lax.dynamic_slice(
                        xp, (z, gj0, z), (x.shape[0], ljl, x.shape[2])
                    )

                def gi0_1d(halo):
                    g = jax.lax.axis_index(ax_i) * Li - halo
                    return g.astype(jnp.int32).reshape(1)

                def exti(x, k):
                    return _halo_ext_i(x, ax_i, plan.nx, k)

                r_rep = to_jrep(r, n)
                if from_zero:
                    e_rep = px1.rb_smooth_from_zero_ext(
                        exti(r_rep, H), gi0_1d(H), h, n_smooth, n, Li,
                        red_first=True, block_i=bi_s1,
                    )
                else:
                    e_rep = px1.rb_smooth_ext(
                        exti(to_jrep(e, n), H), exti(r_rep, H), gi0_1d(H),
                        h, n_smooth, n, Li, red_first=True, block_i=bi_s1,
                    )
                skc = cp._coarse_k_width(n, sk)
                rc_rep = px1.residual_restrict_ext(
                    exti(e_rep, 2), exti(r_rep, 2), gi0_1d(2), h, n,
                    Li // 2, block_i=bi_r1,
                )
                rc = slice_j(rc_rep, plan.local_j(depth + 1))
                ec = descend(None, rc, level - 1, depth + 1, from_zero=True)
                if level - 1 > 0 and nc >= cfg.gamma_min_n:
                    for _ in range(cfg.gamma - 1):
                        ec = descend(ec, rc, level - 1, depth + 1)
                hc = H // 2 + 1
                ec_rep = to_jrep(ec, nc)
                e_rep = px1.prolong_smooth_ext(
                    exti(ec_rep, hc), exti(e_rep, H), exti(r_rep, H),
                    gi0_1d(H), h, n_smooth, n, Li, block_i=bi_p1,
                )
                return slice_j(e_rep, Lj)

        def ext2(x, hi):
            return _halo_ext_j(
                _halo_ext_i(x, ax_i, plan.nx, hi), ax_j, plan.ny, px2.HJ
            )

        def smooth_stage(e, r, red_first, from_zero=False, n_it=n_smooth):
            """Fused smoothing stage with the split ladder of
            sharded_padded.smooth_stage: full-window fusion at bi >= 4,
            else n_it SINGLE-ITERATION passes (halo 2 — what the
            1025-scale levels need, where the full window only fits
            bi=2), else the tiny full window, else masked-roll jnp."""
            Hs = 2 * n_it
            bi_f = px2.ext2d_block_i(Li, sje, sk, Hs, 2,
                                     requested=block_i) if pal else 0
            bi_fh = _halo_bi(bi_f, Li, Hs)
            bi_1 = px2.ext2d_block_i(Li, sje, sk, 2, 2,
                                     requested=block_i) \
                if (pal and n_it > 1) else 0
            bi_1h = _halo_bi(bi_1, Li, 2)
            # bi_fh <= bi_f by construction (_halo_bi caps at bi0)
            use_split = bi_f < 4 and bi_1h >= 4
            if use_split:
                g = _gij0(plan, depth, 2)
                for it in range(n_it):
                    if from_zero and it == 0:
                        e = px2.rb_smooth_from_zero_halo2d(
                            _halo_parts2dj(r, plan, 2, 2, bi_1h), g, h, 1,
                            n, Li, Lj, red_first=red_first, block_i=bi_1h,
                        )
                    else:
                        e = px2.rb_smooth_halo2d(
                            _halo_parts2dj(e, plan, 2, 2, bi_1h),
                            _halo_parts2dj(r, plan, 2, 2, bi_1h),
                            g, h, 1, n, Li, Lj, red_first=red_first,
                            block_i=bi_1h,
                        )
                return e
            if bi_fh:
                # copy-free j-DMA tier: both halos stitched in-kernel
                g = _gij0(plan, depth, Hs)
                if from_zero:
                    return px2.rb_smooth_from_zero_halo2d(
                        _halo_parts2dj(r, plan, Hs, Hs, bi_fh), g, h, n_it,
                        n, Li, Lj, red_first=red_first, block_i=bi_fh,
                    )
                return px2.rb_smooth_halo2d(
                    _halo_parts2dj(e, plan, Hs, Hs, bi_fh),
                    _halo_parts2dj(r, plan, Hs, Hs, bi_fh),
                    g, h, n_it, n, Li, Lj,
                    red_first=red_first, block_i=bi_fh,
                )
            if bi_f:
                g = _gij0(plan, depth, Hs)
                if from_zero:
                    return px2.rb_smooth_from_zero_ext2d(
                        ext2(r, Hs), g, h, n_it, n, Li, Lj,
                        red_first=red_first, block_i=bi_f,
                    )
                return px2.rb_smooth_ext2d(
                    ext2(e, Hs), ext2(r, Hs), g, h, n_it, n, Li, Lj,
                    red_first=red_first, block_i=bi_f,
                )
            if from_zero:
                e = jnp.zeros_like(r)
            return rb_smooth_local2dp(e, r, h, n_it, n, plan, depth,
                                      red_first)

        # --- pre-smooth (red-first)
        e = smooth_stage(e, r, red_first=True, from_zero=from_zero)

        # --- residual + restrict
        bi_r = px2.restrict2d_block_i(Li // 2, sje, sk) if pal else 0
        bi_rh = _halo_bi(bi_r, Li // 2, 1)
        if bi_rh:
            skc = cp._coarse_k_width(n, sk)
            rc = px2.residual_restrict_halo2d(
                _halo_parts2dj(e, plan, 2, 1),
                _halo_parts2dj(r, plan, 2, 1),
                _gij0(plan, depth, 2), h, n,
                Li // 2, Lj // 2, skc, block_i=bi_rh, sjl=Lj,
            )
        elif bi_r:
            skc = cp._coarse_k_width(n, sk)
            rc = px2.residual_restrict_ext2d(
                ext2(e, 2), ext2(r, 2), _gij0(plan, depth, 2), h, n,
                Li // 2, Lj // 2, skc, block_i=bi_r,
            )
        else:
            res = residual_local2dp(e, r, h, n, plan, depth)
            rc = restrict_local2dp(res, n, plan, depth)

        ec = descend(None, rc, level - 1, depth + 1, from_zero=True)
        if level - 1 > 0 and nc >= cfg.gamma_min_n:
            for _ in range(cfg.gamma - 1):  # W-cycle revisits
                ec = descend(ec, rc, level - 1, depth + 1)

        # --- prolong + correct + post-smooth (black-first)
        bi_p = px2.prolong2d_block_i(Li, sje, sk, n_smooth,
                                     requested=block_i) if pal else 0
        bi_ph = _halo_bi(bi_p, Li, H + 2)
        if pal and bi_p < 4 and n_smooth > 1:
            # split post-smooth (sharded_padded's prolong ladder): fuse
            # interpolate+correct+ONE black-first iteration, then
            # n_smooth-1 single-iteration smoother passes
            bi_p1 = px2.prolong2d_block_i(Li, sje, sk, 1,
                                          requested=block_i)
            bi_p1h = _halo_bi(bi_p1, Li, 4)
            if bi_p1h:
                e = px2.prolong_smooth_halo2d(
                    _halo_parts2dj(ec, plan, 1, 2, bi_p1h // 2),
                    _halo_parts2dj(e, plan, 2, 2, bi_p1h),
                    _halo_parts2dj(r, plan, 2, 2, bi_p1h),
                    _gij0(plan, depth, 2), h, 1, n, Li, Lj,
                    block_i=bi_p1h,
                )
                return smooth_stage(e, r, red_first=False,
                                    n_it=n_smooth - 1)
            if bi_p1 >= 4:
                ec_ext = _halo_ext_j(
                    _halo_ext_i(ec, ax_i, plan.nx, 2), ax_j, plan.ny,
                    px2.HJ
                )
                e = px2.prolong_smooth_ext2d(
                    ec_ext, ext2(e, 2), ext2(r, 2),
                    _gij0(plan, depth, 2), h, 1, n, Li, Lj, block_i=bi_p1,
                )
                return smooth_stage(e, r, red_first=False,
                                    n_it=n_smooth - 1)
            e = prolong_correct_local2dp(ec, e, nc, plan, depth)
            return smooth_stage(e, r, red_first=False)
        if bi_ph:
            e = px2.prolong_smooth_halo2d(
                _halo_parts2dj(ec, plan, n_smooth, n_smooth + 1,
                               bi_ph // 2),
                _halo_parts2dj(e, plan, H, H, bi_ph),
                _halo_parts2dj(r, plan, H, H, bi_ph),
                _gij0(plan, depth, H), h, n_smooth, n, Li, Lj,
                block_i=bi_ph,
            )
        elif bi_p:
            hc = H // 2 + 1
            ec_ext = _halo_ext_j(
                _halo_ext_i(ec, ax_i, plan.nx, hc), ax_j, plan.ny, px2.HJ
            )
            e = px2.prolong_smooth_ext2d(
                ec_ext, ext2(e, H), ext2(r, H), _gij0(plan, depth, H),
                h, n_smooth, n, Li, Lj, block_i=bi_p,
            )
        else:
            e = prolong_correct_local2dp(ec, e, nc, plan, depth)
            e = smooth_stage(e, r, red_first=False)
        return e

    level = hier32.num_levels - 1

    def cycle(e, r, from_zero=False):
        return descend(e, r, level, 0, from_zero=from_zero)

    return cycle


def make_sharded2d_padded_cycle(
    hier: Hierarchy,
    cfg: CycleConfig,
    mesh: Mesh,
    plan: Optional[ShardPlan2D] = None,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 8,
) -> Tuple[Callable, ShardPlan2D]:
    """jitted cycle(e_global, r_global) -> e': one correction V-cycle on
    (i, j)-sharded padded f32 arrays (2D ext Pallas stages inside
    shard_map)."""
    ax_i, ax_j = mesh.axis_names
    if plan is None:
        plan = plan_sharding_2d_padded(
            hier, mesh.devices.shape[0], mesh.devices.shape[1], (ax_i, ax_j)
        )
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    cycle_local = _build_local_cycle2d(hier32, cfg, plan, jnp_level_max,
                                       block_i)
    spec = P(*plan.axes)
    mapped = jax.shard_map(
        lambda e, r: cycle_local(e, r, from_zero=False),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(mapped), plan


def make_sharded2d_padded_df_solver(
    hier: Hierarchy,
    cfg: CycleConfig = CycleConfig(),
    mesh: Optional[Mesh] = None,
    plan: Optional[ShardPlan2D] = None,
    rel_tol: float = 1e-8,
    max_cycles: int = 40,
    inner_cycles: int = 4,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 8,
    trim: bool = False,
    init_norm: float = None,
) -> Tuple[Callable, ShardPlan2D]:
    """run(u_hi, u_lo, f_hi, f_lo) -> (u_hi, u_lo, norm, n_outer): the
    2D-mesh twin of sharded_padded.make_sharded_df_solver — whole solve
    as ONE jitted lax.while_loop, fused EFT residual+norm 2D ext kernel
    (partials psummed over both axes), ``inner_cycles`` fused V-cycles
    per defect step. ``trim``: k-TRIM layout (pair with
    setup_df_problem_sharded2d_padded(trim=True) + init_norm)."""
    import sys

    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    if trim and init_norm is None:
        raise ValueError("trim layout needs the reference-convention "
                         "init_norm (||f|| before the boundary fold)")
    if mesh is None:
        raise ValueError("mesh is required")

    ax_i, ax_j = mesh.axis_names
    nx, ny = mesh.devices.shape
    if plan is None:
        plan = plan_sharding_2d_padded(hier, nx, ny, (ax_i, ax_j))
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    inner = _build_local_cycle2d(hier32, cfg, plan, jnp_level_max, block_i)
    level = hier.num_levels - 1
    n = hier.sizes[level]
    h = hier.spacing(level)
    Li0, Lj0 = plan.local_i(0), plan.local_j(0)
    sk = (pk.padded_shape_trim(n) if trim else pk.padded_shape(n))[2]
    sje = Lj0 + 2 * px2.HJ

    def residual_norm(u_hi, u_lo, f_hi, f_lo):
        bi = px2.ext2d_block_i(Li0, sje, sk, 1, 4, requested=block_i)
        # min_lj=HJ: this kernel needs only the fine one-neighbor halo
        # (no coarse ext), hence the looser bound vs the cycle kernels.
        bi_h = _halo_bi(bi, Li0, 1)
        use2d = _use_pallas2d(n, Li0, Lj0, 1, jnp_level_max, min_lj=px2.HJ)
        if bi_h and use2d:
            parts = [_halo_parts2dj(a, plan, 1, 1, bi_h)
                     for a in (u_hi, u_lo, f_hi, f_lo)]
            r, part = px2.residual_df_norm_halo2d(
                *parts, _gij0(plan, 0, 1), h, n, Li0, Lj0, block_i=bi_h,
            )
        elif bi and use2d:
            def ext2(x):
                return _halo_ext_j(
                    _halo_ext_i(x, ax_i, plan.nx, 1), ax_j, plan.ny, px2.HJ
                )

            r, part = px2.residual_df_norm_ext2d(
                ext2(u_hi), ext2(u_lo), ext2(f_hi), ext2(f_lo),
                _gij0(plan, 0, 1), h, n, Li0, Lj0, block_i=bi,
            )
        else:
            r, part = _residual_df_norm_local2dp_jnp(
                u_hi, u_lo, f_hi, f_lo, h, n, plan
            )
        return r, jnp.sqrt(jax.lax.psum(part, (ax_i, ax_j)))

    def local_fn(u_hi, u_lo, f_hi, f_lo):
        if init_norm is not None:
            init = jnp.asarray(init_norm, f32)
        else:
            init = jnp.sqrt(jax.lax.psum(jnp.sum(f_hi * f_hi), (ax_i, ax_j)))
        tol = jnp.asarray(rel_tol, f32) * init

        def body(state):
            u_hi, u_lo, r, nrm, it, f_hi, f_lo = state
            e = inner(None, r, from_zero=True)
            for _ in range(inner_cycles - 1):  # static unroll
                e = inner(e, r)
            u_hi, u_lo = pk.df_add(u_hi, u_lo, e)
            r, nrm = residual_norm(u_hi, u_lo, f_hi, f_lo)
            return u_hi, u_lo, r, nrm, it + 1, f_hi, f_lo

        def cond(state):
            nrm, it = state[3], state[4]
            return jnp.logical_and(nrm > tol, it < max_cycles)

        r0, n0 = residual_norm(u_hi, u_lo, f_hi, f_lo)
        out = jax.lax.while_loop(
            cond, body, (u_hi, u_lo, r0, n0, jnp.asarray(0), f_hi, f_lo)
        )
        return out[0], out[1], out[3], out[4]

    spec = P(*plan.axes)
    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec,) * 4,
        out_specs=(spec, spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped), plan


# ------------------------------------------------------------------ setup


def setup_df_problem_sharded2d_padded(problem, hier: Hierarchy, mesh: Mesh,
                                      plan: ShardPlan2D, trim: bool = False):
    """(u_hi, u_lo, f_hi, f_lo): double-float, lane-padded, (i, j)-padded
    to (nx*Li, ny*Lj), placed with a NamedSharding over the mesh.
    ``trim``: k-TRIM layout (boundary fold, cycles_padded)."""
    from multigrid_parallel_tpu.cycles import setup_problem

    n = hier.finest_n
    sh = NamedSharding(mesh, P(*plan.axes))

    if trim:
        parts = cp.setup_df_problem(problem, hier, trim=True)
        _, sj, _ = pk.padded_shape_trim(n)
        ipad = plan.padded_i(0) - n
        jpad = plan.padded_j(0) - sj

        def place(x):
            return jax.device_put(
                jnp.pad(x, ((0, ipad), (0, jpad), (0, 0))), sh)

        return tuple(place(x) for x in parts)

    u64, f64 = setup_problem(problem, hier)
    _, sj, _ = pk.padded_shape(n)
    ipad = plan.padded_i(0) - n
    jpad = plan.padded_j(0) - sj

    def prep(x64):
        hi, lo = pk.df_split(x64, pad=True)  # (n, SJ, SK)
        pads = ((0, ipad), (0, jpad), (0, 0))
        return (jax.device_put(jnp.pad(hi, pads), sh),
                jax.device_put(jnp.pad(lo, pads), sh))

    u_hi, u_lo = prep(u64)
    f_hi, f_lo = prep(f64)
    return u_hi, u_lo, f_hi, f_lo


def unpad_solution2d(u_hi, u_lo, hier: Hierarchy):
    n = hier.finest_n
    return pk.unpad3(pk.df_to_f64(u_hi, u_lo)[:n, :n], n)


def untrim_solution2d(u_hi, u_lo, problem, hier: Hierarchy):
    """2D-sharded TRIM df pair -> (n, n, n) f64 cube with the k-face
    Dirichlet boundaries re-attached."""
    n = hier.finest_n
    return cp.untrim_solution(u_hi[:n], u_lo[:n], problem, hier)
