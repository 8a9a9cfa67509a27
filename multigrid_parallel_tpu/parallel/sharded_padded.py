"""Distributed performance path: the padded fused-Pallas cycle under
shard_map.

Round-1's sharded cycles (parallel/sharded.py) use plain jnp roll/mask
local ops — correct, but they forfeit the single-chip fusion wins. Here
the i axis is sharded over a 1D mesh in the LANE-PADDED layout of
ops.pallas3d, and every hot stage of the correction V-cycle runs the
sharded-local fused kernels (ops.pallas_sharded): one ppermute halo
exchange feeds a whole fused stage (all half-sweeps of a smoothing
stage; residual+restrict; prolong+correct+post-smooth), mirroring the
reference's worksharing-inside-kernels (/root/reference/mg_3d.h:658,
681, 807). Coarse levels gather to replicated and reuse the single-chip
padded cycle (cycles_padded) — the analogue of the reference's
`omp single` coarse section (mg_3d.h:1262-1277).

Layout contract (extends parallel/sharded.py):
  * level with n valid planes -> global (n_dev * L, SJ, SK) array,
    (SJ, SK) = pallas3d.padded_shape(n)[1:]; pad planes (global index
    >= n) and pad j/k columns are zero and masked everywhere.
  * L is a multiple of 2**n_sharded (ShardPlan), so device offsets stay
    even across sharded coarsenings and fine/coarse plane parity is
    static inside every kernel.

The whole-solve driver (make_sharded_df_solver) is the distributed twin
of cycles_padded.make_on_device_df_solver: a double-float (two-f32)
solution, EFT outer residual (fused kernel + psum), ``inner_cycles``
V-cycles per defect step, one jitted lax.while_loop — solve-to-tolerance
with no host sync per cycle (driver shape: test_mg_3d.c:37-67).
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
from multigrid_parallel_tpu.ops import pallas_sharded as px
from multigrid_parallel_tpu.ops import stencils_3d as ops3
from multigrid_parallel_tpu.parallel.sharded import (
    ShardPlan,
    _perm_bwd,
    _perm_fwd,
    make_mesh,
    plan_sharding,
)


def _halo_ext(x, axis: str, n_dev: int, k: int):
    """(L, SJ, SK) -> (L+2k, SJ, SK): k neighbor planes ppermuted onto
    each side (chain ends receive zeros — exactly the zero boundary /
    zero padding of correction fields)."""
    left = jax.lax.ppermute(x[-k:], axis, _perm_fwd(n_dev))
    right = jax.lax.ppermute(x[:k], axis, _perm_bwd(n_dev))
    return jnp.concatenate([left, x, right], axis=0)


def _gi0(axis: str, L: int, halo: int):
    """(1,) i32 global plane index of ext row 0 for this device."""
    g = jax.lax.axis_index(axis) * L - halo
    return g.astype(jnp.int32).reshape(1)


def _halo_bi(bi0: int, L: int, min_halo: int = 0) -> int:
    """Largest block_i <= bi0 eligible for the halo-DMA kernels
    (px.halo_ok): even, covers min_halo, and L >= bi + min_halo (the
    kernels use the same overlapping-tail block scheme as the ext tier,
    so bi need NOT divide L)."""
    for bi in (bi0, 16, 12, 8, 6, 4, 2):
        if 0 < bi <= bi0 and px.halo_ok(L, bi, min_halo):
            return bi
    return 0


def _halo_parts(x, axis: str, n_dev: int, kl: int, kr: int,
                tail_local: int = 0):
    """(x, lh, rhc) for the halo-DMA kernels (ops.pallas_sharded
    *_halo): ONLY the kl/kr edge planes are ppermuted — the body is
    read in-kernel straight from the local array, eliminating the
    (L+2H)-plane extended copy _halo_ext materializes per stage (the
    round-3 1.14-1.26x distributed tax, docs/SCALING.md). ``tail_local``
    (the kernel's block size, or block//2 for a coarse stream) prepends
    that many local tail planes to the right-halo buffer, forming the
    composite the kernels' overlapped last blocks read their tail rows
    from (px._tri_dma)."""
    lh = jax.lax.ppermute(x[-kl:], axis, _perm_fwd(n_dev))
    rh = jax.lax.ppermute(x[:kr], axis, _perm_bwd(n_dev))
    if tail_local:
        rh = jnp.concatenate([x[x.shape[0] - tail_local:], rh], axis=0)
    return (x, lh, rh)


# ------------------------------- jnp fallback local ops (padded layout)
# Small levels (or tiny local plane counts) skip Pallas launches, like
# cycles_padded's jnp_level_max dispatch; masks use GLOBAL indices.


def _local_masks(axis: str, L: int, n: int, sj: int, sk: int, color=None):
    g = jax.lax.axis_index(axis) * L + jax.lax.broadcasted_iota(
        jnp.int32, (L, 1, 1), 0
    )
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sk), 2)
    interior = (
        (g >= 1) & (g <= n - 2) & (jj >= 1) & (jj <= n - 2)
        & (kk >= 1) & (kk <= n - 2)
    )
    if color is None:
        return interior
    return interior & (((g + jj + kk) % 2) == color)


def rb_smooth_local_padded(e, r, h, n_iter, n, axis, n_dev, red_first=True):
    """Masked-roll RB stage on a padded local block; 1-plane halo exchange
    per half-sweep (the small-level path — Pallas trapezoidal fusion is
    not worth a launch here)."""
    h2 = h * h
    L, sj, sk = e.shape
    colors = (ops3.RED, ops3.BLACK) if red_first else (ops3.BLACK, ops3.RED)
    masks = {c: _local_masks(axis, L, n, sj, sk, c) for c in set(colors)}
    for _ in range(n_iter):
        for c in colors:
            ext = _halo_ext(e, axis, n_dev, 1)
            nbr = (
                ext[:-2] + ext[2:]
                + jnp.roll(e, 1, 1) + jnp.roll(e, -1, 1)
                + jnp.roll(e, 1, 2) + jnp.roll(e, -1, 2)
            )
            e = jnp.where(masks[c], (nbr - h2 * r) * (1.0 / 6.0), e)
    return e


def residual_local_padded(e, r, h, n, axis, n_dev):
    inv_h2 = 1.0 / (h * h)
    L, sj, sk = e.shape
    ext = _halo_ext(e, axis, n_dev, 1)
    nbr = (
        ext[:-2] + ext[2:]
        + jnp.roll(e, 1, 1) + jnp.roll(e, -1, 1)
        + jnp.roll(e, 1, 2) + jnp.roll(e, -1, 2)
    )
    res = r - inv_h2 * (nbr - 6.0 * e)
    mask = _local_masks(axis, L, n, sj, sk)
    return jnp.where(mask, res, jnp.zeros_like(res))


@functools.lru_cache(maxsize=None)
def _restrict_i_local_np(L: int):
    """(L/2, L+2) i-tap matrix onto a 1-plane halo-extended local block:
    coarse local row c <- 0.25/0.5/0.25 of ext rows 2c, 2c+1, 2c+2
    (device offsets are even, so parents are always ext-local)."""
    lc = L // 2
    m = np.zeros((lc, L + 2))
    for c in range(lc):
        m[c, 2 * c : 2 * c + 3] = (0.25, 0.5, 0.25)
    return m


@functools.lru_cache(maxsize=None)
def _prolong_i_local_np(L: int):
    """(L, L/2+1) i-interpolation onto a right-halo-extended coarse block:
    even fine local rows copy coarse row g/2, odd rows average g/2, g/2+1."""
    lc = L // 2
    m = np.zeros((L, lc + 1))
    for g in range(L):
        if g % 2 == 0:
            m[g, g // 2] = 1.0
        else:
            m[g, g // 2] = 0.5
            m[g, g // 2 + 1] = 0.5
    return m


def restrict_local_padded(res, n, axis, n_dev):
    """(L, SJ, SK) residual -> (L/2, SJc, SKc) coarse RHS: j/k via the
    padded separable matmuls (cycles_padded), i via a local band matmul
    over a 1-plane halo (no stride-2 slicing). k widths follow the
    input layout (full or k-trim)."""
    L = res.shape[0]
    sjm, skm = cp._restrict_matrices_np(
        n, res.shape[2], cp._coarse_k_width(n, res.shape[2])
    )
    sjm = jnp.asarray(sjm, res.dtype)
    skm = jnp.asarray(skm, res.dtype)
    t = jnp.einsum("bj,ijk->ibk", sjm, res, precision=ops3._HIGHEST)
    t = jnp.einsum("dk,ibk->ibd", skm, t, precision=ops3._HIGHEST)
    ext = _halo_ext(t, axis, n_dev, 1)
    si = jnp.asarray(_restrict_i_local_np(L), res.dtype)
    coarse = jnp.einsum("ci,ijk->cjk", si, ext, precision=ops3._HIGHEST)
    nc = (n + 1) // 2
    lc, sjc, skc = coarse.shape
    mask = _local_masks(axis, lc, nc, sjc, skc)
    return jnp.where(mask, coarse, jnp.zeros_like(coarse))


def prolong_correct_local_padded(ec, ef, nc, axis, n_dev):
    """ef += trilinear interp of ec on local blocks (coarse right-halo 1)."""
    lc = ec.shape[0]
    L = 2 * lc
    pj, pkm = cp._prolong_matrices_np(nc, ec.shape[2], ef.shape[2])
    pj = jnp.asarray(pj, ec.dtype)
    pkm = jnp.asarray(pkm, ec.dtype)
    t = jnp.einsum("jb,ibc->ijc", pj, ec, precision=ops3._HIGHEST)
    t = jnp.einsum("kc,ijc->ijk", pkm, t, precision=ops3._HIGHEST)
    from_right = jax.lax.ppermute(t[:1], axis, _perm_bwd(n_dev))
    ext = jnp.concatenate([t, from_right], axis=0)
    pi = jnp.asarray(_prolong_i_local_np(L), ec.dtype)
    corr = jnp.einsum("fi,ijk->fjk", pi, ext, precision=ops3._HIGHEST)
    nf = 2 * nc - 1
    # corr is already zero on boundary/pads (coarse boundary/pads are
    # zero), but pin pad planes exactly zero for invariance.
    g = jax.lax.axis_index(axis) * L + jax.lax.broadcasted_iota(
        jnp.int32, (L, 1, 1), 0
    )
    corr = jnp.where(g <= nf - 1, corr, jnp.zeros_like(corr))
    return ef + corr


def _residual_df_norm_local_jnp(u_hi, u_lo, f_hi, f_lo, h, n, axis, n_dev):
    """XLA fallback for the fused EFT residual + partial norm."""
    inv_h2 = 1.0 / (h * h)

    def halo_nbrs(u):
        ext = _halo_ext(u, axis, n_dev, 1)
        return [
            ext[:-2], ext[2:],
            jnp.roll(u, 1, 1), jnp.roll(u, -1, 1),
            jnp.roll(u, 1, 2), jnp.roll(u, -1, 2),
        ]

    r = pk._eft_residual(
        f_hi, f_lo, u_hi, halo_nbrs(u_hi), u_lo, halo_nbrs(u_lo), inv_h2
    )
    L, sj, sk = u_hi.shape
    mask = _local_masks(axis, L, n, sj, sk)
    r = jnp.where(mask, r, jnp.zeros_like(r))
    return r, jnp.sum(r * r)


# ----------------------------------------------------- cycle + solver


def _use_pallas(n: int, L: int, H: int, jnp_level_max: int) -> bool:
    """Pallas at a sharded level needs the level big enough to pay the
    launch AND a one-neighbor halo to cover the fusion window (L >= H;
    prolong additionally needs the coarse halo local: L >= H + 2)."""
    return n > jnp_level_max and L >= max(H + 2, 4)


def _build_local_cycle(
    hier32: Hierarchy,
    cfg: CycleConfig,
    plan: ShardPlan,
    jnp_level_max: int,
    block_i: int = 8,
):
    """Returns cycle_local(e, r, from_zero) -> e' operating on local
    padded blocks inside shard_map (finest level of hier32)."""
    axis, n_dev = plan.axis, plan.n_dev
    n_smooth = cfg.n_smooth
    H = 2 * n_smooth
    rep_level = hier32.num_levels - 1 - plan.n_sharded
    sub = dataclasses.replace(hier32, num_levels=rep_level + 1)
    rep_cycle = cp.make_padded_correction_cycle(sub, cfg, jnp_level_max)
    n_rep = hier32.sizes[rep_level]
    assert plan.padded_planes(plan.n_sharded) >= n_rep, (plan, n_rep)

    def descend(e, r, level, depth, from_zero=False):
        n = hier32.sizes[level]
        if depth == plan.n_sharded:
            # Gather to replicated; run the single-chip padded cycle
            # (same fused kernels); re-slice this device's planes. A
            # non-from_zero entry (gamma revisit) gathers e too.
            r_rep = jax.lax.all_gather(r, axis, axis=0, tiled=True)[:n]
            if from_zero:
                e_rep = rep_cycle(None, r_rep, from_zero=True)
            else:
                e_gath = jax.lax.all_gather(e, axis, axis=0, tiled=True)[:n]
                e_rep = rep_cycle(e_gath, r_rep)
            L = plan.local_planes(depth)
            pad = plan.padded_planes(depth) - n
            e_pad = jnp.pad(e_rep, ((0, pad), (0, 0), (0, 0)))
            g0 = (jax.lax.axis_index(axis) * L).astype(jnp.int32)
            z = jnp.zeros((), jnp.int32)
            return jax.lax.dynamic_slice(
                e_pad, (g0, z, z), (L, e_rep.shape[1], e_rep.shape[2])
            )

        L = plan.local_planes(depth)
        h = hier32.spacing(level)
        _, sj, sk = r.shape
        pal = _use_pallas(n, L, H, jnp_level_max)
        nc = hier32.sizes[level - 1]

        def smooth_stage(e, r, red_first, from_zero=False, n_it=n_smooth):
            """Fused smoothing stage with the single-chip planner's
            ladder (pallas3d.rb_smooth_fused_pipelined): full-window
            fusion when VMEM allows bi >= 4, else n_it SINGLE-ITERATION
            passes (halo 2 each — bigger blocks, less trapezoid
            recompute; this is what the single-chip path runs at the
            513-trim level, where the full H=4 window only fits at
            bi=2), else the bi=2 full window, else masked-roll jnp."""
            Hs = 2 * n_it
            bi_f = px.ext_block_i(L, sj, sk, Hs, 2, requested=block_i) \
                if pal else 0
            bi_fh = _halo_bi(bi_f, L, Hs)
            bi_1 = px.ext_block_i(L, sj, sk, 2, 2, requested=block_i) \
                if (pal and n_it > 1) else 0
            bi_1h = _halo_bi(bi_1, L, 2)
            # bi_fh <= bi_f by construction (_halo_bi caps at bi0)
            use_split = bi_f < 4 and bi_1h >= 4
            if use_split:
                g = _gi0(axis, L, 2)
                for it in range(n_it):
                    if from_zero and it == 0:
                        e = px.rb_smooth_from_zero_halo(
                            _halo_parts(r, axis, n_dev, 2, 2, bi_1h), g, h,
                            1, n, L, red_first=red_first, block_i=bi_1h,
                        )
                    else:
                        e = px.rb_smooth_halo(
                            _halo_parts(e, axis, n_dev, 2, 2, bi_1h),
                            _halo_parts(r, axis, n_dev, 2, 2, bi_1h),
                            g, h, 1, n, L, red_first=red_first,
                            block_i=bi_1h,
                        )
                return e
            if bi_fh:
                # halo-DMA tier: only the Hs edge planes travel; the
                # body is read in-kernel from the local array
                g = _gi0(axis, L, Hs)
                if from_zero:
                    return px.rb_smooth_from_zero_halo(
                        _halo_parts(r, axis, n_dev, Hs, Hs, bi_fh), g, h,
                        n_it, n, L, red_first=red_first, block_i=bi_fh,
                    )
                return px.rb_smooth_halo(
                    _halo_parts(e, axis, n_dev, Hs, Hs, bi_fh),
                    _halo_parts(r, axis, n_dev, Hs, Hs, bi_fh),
                    g, h, n_it, n, L, red_first=red_first,
                    block_i=bi_fh,
                )
            if bi_f:
                g = _gi0(axis, L, Hs)
                if from_zero:
                    return px.rb_smooth_from_zero_ext(
                        _halo_ext(r, axis, n_dev, Hs), g, h, n_it, n, L,
                        red_first=red_first, block_i=bi_f,
                    )
                return px.rb_smooth_ext(
                    _halo_ext(e, axis, n_dev, Hs),
                    _halo_ext(r, axis, n_dev, Hs),
                    g, h, n_it, n, L, red_first=red_first, block_i=bi_f,
                )
            if from_zero:
                e = jnp.zeros_like(r)
            return rb_smooth_local_padded(e, r, h, n_it, n, axis, n_dev,
                                          red_first)

        # --- pre-smooth (red-first)
        e = smooth_stage(e, r, red_first=True, from_zero=from_zero)

        # --- residual + restrict
        bi_r = px.restrict_ext_block_i(L // 2, sj, sk) if pal else 0
        bi_rh = _halo_bi(bi_r, L // 2, 1)
        if bi_rh:
            rc = px.residual_restrict_halo(
                _halo_parts(e, axis, n_dev, 2, 1),
                _halo_parts(r, axis, n_dev, 2, 1),
                _gi0(axis, L, 2), h, n, L // 2, block_i=bi_rh,
            )
        elif bi_r:
            rc = px.residual_restrict_ext(
                _halo_ext(e, axis, n_dev, 2), _halo_ext(r, axis, n_dev, 2),
                _gi0(axis, L, 2), h, n, L // 2, block_i=bi_r,
            )
        else:
            res = residual_local_padded(e, r, h, n, axis, n_dev)
            rc = restrict_local_padded(res, n, axis, n_dev)

        ec = descend(None, rc, level - 1, depth + 1, from_zero=True)
        if level - 1 > 0 and nc >= cfg.gamma_min_n:
            # gamma > 1 revisits the coarse correction (W-cycle), exactly
            # as cycles._descend / cycles_padded._make_descend do. The
            # replicated sub-cycle honors gamma internally.
            for _ in range(cfg.gamma - 1):
                ec = descend(ec, rc, level - 1, depth + 1)

        # --- prolong + correct + post-smooth (black-first)
        bi_p = px.prolong_ext_block_i(L, sj, sk, n_smooth,
                                      requested=block_i) if pal else 0
        bi_ph = _halo_bi(bi_p, L, H + 2)
        if pal and bi_p < 4 and n_smooth > 1:
            # Tiny-block full-window fused prolong pays 5x trapezoid
            # recompute (the 513-trim level). Split the POST-SMOOTH the
            # same way as smooth_stage: fuse interpolate+correct+ONE
            # black-first iteration (halo 2 — fits bi >= 4 where the
            # full window only fits bi=2), then n_smooth-1
            # single-iteration smoother passes. Identical half-sweep
            # sequence, much bigger blocks.
            bi_p1 = px.prolong_ext_block_i(L, sj, sk, 1, requested=block_i)
            bi_p1h = _halo_bi(bi_p1, L, 4)  # n_iter=1: bi >= H1+2 = 4
            if bi_p1h:
                e = px.prolong_smooth_halo(
                    _halo_parts(ec, axis, n_dev, 1, 2, bi_p1h // 2),
                    _halo_parts(e, axis, n_dev, 2, 2, bi_p1h),
                    _halo_parts(r, axis, n_dev, 2, 2, bi_p1h),
                    _gi0(axis, L, 2), h, 1, n, L, block_i=bi_p1h,
                )
                return smooth_stage(e, r, red_first=False,
                                    n_it=n_smooth - 1)
            if bi_p1 >= 4:
                e = px.prolong_smooth_ext(
                    _halo_ext(ec, axis, n_dev, 2), _halo_ext(e, axis, n_dev, 2),
                    _halo_ext(r, axis, n_dev, 2), _gi0(axis, L, 2),
                    h, 1, n, L, block_i=bi_p1,
                )
                return smooth_stage(e, r, red_first=False,
                                    n_it=n_smooth - 1)
            # separable-matmul interpolation + split smoother (the
            # single-chip planner's last resort at this level)
            e = prolong_correct_local_padded(ec, e, nc, axis, n_dev)
            return smooth_stage(e, r, red_first=False)
        if bi_ph:
            e = px.prolong_smooth_halo(
                _halo_parts(ec, axis, n_dev, n_smooth, n_smooth + 1,
                            bi_ph // 2),
                _halo_parts(e, axis, n_dev, H, H, bi_ph),
                _halo_parts(r, axis, n_dev, H, H, bi_ph),
                _gi0(axis, L, H), h, n_smooth, n, L, block_i=bi_ph,
            )
        elif bi_p:
            hc = H // 2 + 1
            e = px.prolong_smooth_ext(
                _halo_ext(ec, axis, n_dev, hc), _halo_ext(e, axis, n_dev, H),
                _halo_ext(r, axis, n_dev, H), _gi0(axis, L, H),
                h, n_smooth, n, L, block_i=bi_p,
            )
        else:
            e = prolong_correct_local_padded(ec, e, nc, axis, n_dev)
            e = smooth_stage(e, r, red_first=False)
        return e

    level = hier32.num_levels - 1

    def cycle(e, r, from_zero=False):
        return descend(e, r, level, 0, from_zero=from_zero)

    def restrict_stage(r, level, depth):
        """Plain residual-free restriction of a defect field (for the
        FMG ladder): r is already a residual, so restrict directly."""
        n = hier32.sizes[level]
        return restrict_local_padded(r, n, axis, n_dev)

    def fmg(r):
        """Full-multigrid bootstrap on the correction equation A e = r,
        distributed: restrict the defect down the sharded ladder, run
        the replicated single-chip FMG bootstrap on the gathered coarse
        defect, then per sharded level prolongate up and run one
        distributed V-cycle — the sharded twin of
        cycles_padded.make_padded_fmg_bootstrap (reference driver:
        mg_dirichlet_analytic.c:771-806)."""
        rep_fmg = cp.make_padded_fmg_bootstrap(sub, cfg, jnp_level_max)
        rs = [r]  # depth 0 (finest) first
        for depth in range(plan.n_sharded):
            lvl = hier32.num_levels - 1 - depth
            rs.append(restrict_stage(rs[-1], lvl, depth))
        # replicated FMG on the gathered coarse defect
        r_rep = jax.lax.all_gather(rs[-1], axis, axis=0, tiled=True)[:n_rep]
        e_rep = rep_fmg(r_rep)
        depth = plan.n_sharded
        L = plan.local_planes(depth)
        pad = plan.padded_planes(depth) - n_rep
        e_pad = jnp.pad(e_rep, ((0, pad), (0, 0), (0, 0)))
        g0 = (jax.lax.axis_index(axis) * L).astype(jnp.int32)
        z = jnp.zeros((), jnp.int32)
        e = jax.lax.dynamic_slice(
            e_pad, (g0, z, z), (L, e_rep.shape[1], e_rep.shape[2])
        )
        for depth in range(plan.n_sharded - 1, -1, -1):
            lvl = hier32.num_levels - 1 - depth
            nc = hier32.sizes[lvl - 1]
            ef = prolong_correct_local_padded(
                e, jnp.zeros_like(rs[depth]), nc, axis, n_dev
            )
            e = descend(ef, rs[depth], lvl, depth)
        return e

    cycle.fmg = fmg
    return cycle


def make_sharded_padded_cycle(
    hier: Hierarchy,
    cfg: CycleConfig,
    mesh: Mesh,
    plan: Optional[ShardPlan] = None,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 8,
) -> Tuple[Callable, ShardPlan]:
    """jitted cycle(e_global, r_global) -> e': one correction V-cycle on
    i-sharded padded f32 arrays (fused Pallas stages inside shard_map).
    Pass e_global = zeros for a from-zero cycle (XLA folds it)."""
    axis = mesh.axis_names[0]
    if plan is None:
        plan = plan_sharding(hier, mesh.devices.size, axis)
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    cycle_local = _build_local_cycle(hier32, cfg, plan, jnp_level_max, block_i)

    mapped = jax.shard_map(
        lambda e, r: cycle_local(e, r, from_zero=False),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(mapped), plan


def make_sharded_df_solver(
    hier: Hierarchy,
    cfg: CycleConfig = CycleConfig(),
    mesh: Optional[Mesh] = None,
    plan: Optional[ShardPlan] = None,
    rel_tol: float = 1e-8,
    max_cycles: int = 40,
    inner_cycles: int = 4,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 8,
    use_fmg: bool = False,
    trim: bool = False,
    init_norm: float = None,
) -> Tuple[Callable, ShardPlan]:
    """run(u_hi, u_lo, f_hi, f_lo) -> (u_hi, u_lo, norm, n_outer): the
    distributed twin of cycles_padded.make_on_device_df_solver — the
    whole solve-to-tolerance as ONE jitted lax.while_loop under
    shard_map. Double-float solution, fused EFT residual+norm kernel
    (partials psummed over the mesh), ``inner_cycles`` fused-Pallas
    V-cycles per outer defect step. ``use_fmg`` bootstraps with a
    distributed full-multigrid pass on the initial defect (the sharded
    analogue of mg_dirichlet_analytic.c:984-1001; not counted in
    n_outer). ``trim``: k-TRIM layout inputs (pair with
    setup_df_problem_sharded_padded(trim=True) and pass the ||f||
    convention constant as ``init_norm`` — see cycles_padded)."""
    import sys

    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    if trim and init_norm is None:
        raise ValueError("trim layout needs the reference-convention "
                         "init_norm (||f|| before the boundary fold)")
    if mesh is None:
        raise ValueError("mesh is required")

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if plan is None:
        plan = plan_sharding(hier, n_dev, axis)
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    inner = _build_local_cycle(hier32, cfg, plan, jnp_level_max, block_i)
    level = hier.num_levels - 1
    n = hier.sizes[level]
    h = hier.spacing(level)
    L0 = plan.local_planes(0)
    _, sj, sk = (pk.padded_shape_trim(n) if trim else pk.padded_shape(n))

    def residual_norm(u_hi, u_lo, f_hi, f_lo):
        bi = px.ext_block_i(L0, sj, sk, 1, 4, requested=block_i)
        bi_h = _halo_bi(bi, L0, 1)
        if bi_h and n > jnp_level_max:
            parts = [_halo_parts(a, axis, n_dev, 1, 1, bi_h)
                     for a in (u_hi, u_lo, f_hi, f_lo)]
            r, part = px.residual_df_norm_halo(
                *parts, _gi0(axis, L0, 1), h, n, L0, block_i=bi_h
            )
        elif bi and n > jnp_level_max:
            exts = [_halo_ext(a, axis, n_dev, 1)
                    for a in (u_hi, u_lo, f_hi, f_lo)]
            r, part = px.residual_df_norm_ext(
                *exts, _gi0(axis, L0, 1), h, n, L0, block_i=bi
            )
        else:
            r, part = _residual_df_norm_local_jnp(
                u_hi, u_lo, f_hi, f_lo, h, n, axis, n_dev
            )
        return r, jnp.sqrt(jax.lax.psum(part, axis))

    def local_fn(u_hi, u_lo, f_hi, f_lo):
        if init_norm is not None:
            init = jnp.asarray(init_norm, f32)
        else:
            init = jnp.sqrt(jax.lax.psum(jnp.sum(f_hi * f_hi), axis))
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
        if use_fmg:
            e = inner.fmg(r0)
            u_hi, u_lo = pk.df_add(u_hi, u_lo, e)
            r0, n0 = residual_norm(u_hi, u_lo, f_hi, f_lo)
        out = jax.lax.while_loop(
            cond, body, (u_hi, u_lo, r0, n0, jnp.asarray(0), f_hi, f_lo)
        )
        return out[0], out[1], out[3], out[4]

    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis),) * 4,
        out_specs=(P(axis), P(axis), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped), plan


# ------------------------------------------------------------------ setup


def setup_df_problem_sharded_padded(problem, hier: Hierarchy, mesh: Mesh,
                                    plan: ShardPlan, trim: bool = False):
    """(u_hi, u_lo, f_hi, f_lo): double-float, lane-padded, i-padded to
    n_dev*L, placed with a NamedSharding over the mesh. ``trim`` uses
    the k-TRIM layout (boundary fold — see cycles_padded.
    setup_df_problem)."""
    from multigrid_parallel_tpu.cycles import setup_problem

    ipad = plan.padded_planes(0) - hier.finest_n
    sh = NamedSharding(mesh, P(plan.axis))

    if trim:
        u_hi, u_lo, f_hi, f_lo = cp.setup_df_problem(problem, hier,
                                                     trim=True)

        def place(x):
            return jax.device_put(
                jnp.pad(x, ((0, ipad), (0, 0), (0, 0))), sh)

        return place(u_hi), place(u_lo), place(f_hi), place(f_lo)

    u64, f64 = setup_problem(problem, hier)

    def prep(x64):
        hi, lo = pk.df_split(x64, pad=True)
        hi = jnp.pad(hi, ((0, ipad), (0, 0), (0, 0)))
        lo = jnp.pad(lo, ((0, ipad), (0, 0), (0, 0)))
        return jax.device_put(hi, sh), jax.device_put(lo, sh)

    u_hi, u_lo = prep(u64)
    f_hi, f_lo = prep(f64)
    return u_hi, u_lo, f_hi, f_lo


def unpad_solution(u_hi, u_lo, hier: Hierarchy):
    """Sharded padded df pair -> (n, n, n) f64 cube (full layout)."""
    n = hier.finest_n
    return pk.unpad3(pk.df_to_f64(u_hi, u_lo)[:n], n)


def untrim_solution_sharded(u_hi, u_lo, problem, hier: Hierarchy):
    """Sharded TRIM df pair -> (n, n, n) f64 cube with the k-face
    Dirichlet boundaries re-attached."""
    n = hier.finest_n
    return cp.untrim_solution(u_hi[:n], u_lo[:n], problem, hier)
