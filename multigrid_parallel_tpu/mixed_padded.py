"""Electrospray (mixed-BC) performance path: padded fused-Pallas cycle.

Brings the mg_3d_bkup.c physics problem onto the same performance tier
as the Dirichlet benchmark solver (round-2 verdict item #4): the f32
correction V-cycle runs in the lane-padded layout with the mixed-BC
fused kernels (ops.pallas_mixed — BC enforcement inside the streaming
smoother), the residual+restrict stage reuses the Dirichlet fused
kernel unchanged (the interior residual reads whatever boundary values
the smoother maintained), and the outer loop is the double-float EFT
defect iteration of cycles_padded.make_on_device_df_solver with
per-step BC re-enforcement on the df solution pair.

Convergence criterion matches MixedBCSolver.solve_on_device:
||r|| <= rel_tol * ||r0|| (the charge-free problem has f = 0, so the
reference's ||f|| convention is vacuous and the initial residual is the
norm anchor).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.hierarchy import Hierarchy
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_mixed as pm


def apply_bcs_padded(e, n, pin, vals=None):
    """Whole-face Neumann copies (x, y, z order — apply_neumann_copy
    semantics) + Dirichlet pin on a padded (n, SJ, SK) array. ``pin``:
    (2, SJ, SK) f32 patch masks; ``vals``: optional (2, SJ, SK) patch
    values (None = zero pin, the correction-equation case)."""
    e = e.at[0].set(e[1])
    e = e.at[n - 1].set(e[n - 2])
    e = e.at[:, 0].set(e[:, 1])
    e = e.at[:, n - 1].set(e[:, n - 2])
    e = e.at[:, :, 0].set(e[:, :, 1])
    e = e.at[:, :, n - 1].set(e[:, :, n - 2])
    v0 = jnp.zeros_like(e[0]) if vals is None else vals[0]
    v1 = jnp.zeros_like(e[0]) if vals is None else vals[1]
    e = e.at[0].set(jnp.where(pin[0] > 0.5, v0, e[0]))
    return e.at[n - 1].set(jnp.where(pin[1] > 0.5, v1, e[n - 1]))


def _mixed_smooth_padded_jnp(e, r, h, n_iter, n, pin, red_first=True):
    """Masked-roll mixed smoother on padded arrays (small levels)."""
    h2 = h * h
    sj, sk = e.shape[1], e.shape[2]
    from multigrid_parallel_tpu.ops import stencils_3d as ops3

    colors = (ops3.RED, ops3.BLACK) if red_first else (ops3.BLACK, ops3.RED)
    masks = {c: cp._padded_masks(n, sj, sk, c) for c in set(colors)}
    for _ in range(n_iter):
        for c in colors:
            nbr = (
                jnp.roll(e, 1, 0) + jnp.roll(e, -1, 0)
                + jnp.roll(e, 1, 1) + jnp.roll(e, -1, 1)
                + jnp.roll(e, 1, 2) + jnp.roll(e, -1, 2)
            )
            e = jnp.where(masks[c], (nbr - h2 * r) * (1.0 / 6.0), e)
            e = apply_bcs_padded(e, n, pin)
    return e


def _make_mixed_descend(
    solver: MixedBCSolver,
    hier32: Hierarchy,
    jnp_level_max: int,
    block_i: int,
):
    """descend(e_pad, r_pad, level, from_zero) for the mixed correction
    equation (zero Dirichlet pins, Neumann copies at every level)."""
    n_smooth = solver.n_smooth
    gamma = solver.gamma
    gamma_min_n = solver.gamma_min_n
    problem = solver.problem

    pins = []
    for lvl in range(hier32.num_levels):
        nl = hier32.sizes[lvl]
        _, sj, sk = pk.padded_shape(nl)
        pins.append(pm.dirichlet_pin_planes(problem, nl, sj, sk))

    lu32 = jnp.asarray(solver._lu_host, dtype=jnp.float32)
    piv32 = jnp.asarray(solver._piv_host, dtype=jnp.int32)
    n0 = hier32.sizes[0]
    mask0 = pins[0]

    def coarse32(fc_pad):
        fc = pk.unpad3(fc_pad, n0)
        x = jax.scipy.linalg.lu_solve((lu32, piv32), fc.reshape(-1))
        x = x.reshape(fc.shape)
        xp = pk.pad3(x)
        # correction pins Dirichlet patch nodes to exactly zero
        xp = xp.at[0].set(jnp.where(mask0[0] > 0.5, 0.0, xp[0]))
        return xp.at[n0 - 1].set(jnp.where(mask0[1] > 0.5, 0.0, xp[n0 - 1]))

    def descend(e, r, level, from_zero=False):
        n = hier32.sizes[level]
        if level == 0:
            return coarse32(r)
        h = hier32.spacing(level)
        pin = pins[level]
        if n <= jnp_level_max:
            if from_zero:
                e = jnp.zeros_like(r)
            e = _mixed_smooth_padded_jnp(e, r, h, n_smooth, n, pin, True)
            rc = cp.restrict_padded(cp._residual_padded_jnp(e, r, h, n), n)
            ec = _recurse(rc, level - 1)
            e = cp.prolong_correct_padded(ec, e, hier32.sizes[level - 1])
            e = apply_bcs_padded(e, n, pin)
            return _mixed_smooth_padded_jnp(e, r, h, n_smooth, n, pin, False)
        _, sj, sk = r.shape
        bi_s = pm.mixed_block_i(n, sj, sk, n_smooth, requested=block_i)
        if bi_s:
            if from_zero:
                e = pm.mixed_rb_smooth_from_zero_fused(
                    r, pin, h, n_smooth, n, red_first=True, block_i=bi_s)
            else:
                e = pm.mixed_rb_smooth_fused(
                    e, r, pin, h, n_smooth, n, red_first=True, block_i=bi_s)
        else:
            if from_zero:
                e = jnp.zeros_like(r)
            e = _mixed_smooth_padded_jnp(e, r, h, n_smooth, n, pin, True)
        # residual+restrict: the Dirichlet fused kernel applies verbatim
        # (interior residual over the smoother-maintained boundary)
        bi_rr = pk.rr_fused_block_i(n, sj, sk, e.dtype.itemsize)
        if bi_rr:
            rc = pk.residual_restrict_fused_padded(e, r, h, n, block_i=bi_rr)
        else:
            rc = cp.restrict_padded(cp._residual_padded_jnp(e, r, h, n), n)
        ec = _recurse(rc, level - 1)
        bi_p = pm.mixed_prolong_block_i(n, sj, sk, n_smooth,
                                        requested=block_i)
        if bi_p:
            e = pm.mixed_prolong_smooth_fused(
                ec, e, r, pin, h, n_smooth, n, block_i=bi_p)
        else:
            e = cp.prolong_correct_padded(ec, e, hier32.sizes[level - 1])
            e = apply_bcs_padded(e, n, pin)
            e = _mixed_smooth_padded_jnp(e, r, h, n_smooth, n, pin, False)
        return e

    def _recurse(rc, level):
        ec = descend(None, rc, level, from_zero=True)
        if level > 0 and hier32.sizes[level] >= gamma_min_n:
            for _ in range(gamma - 1):  # W-cycle revisits (depth-capped)
                ec = descend(ec, rc, level)
        return ec

    return descend


def make_mixed_padded_df_solver(
    solver: MixedBCSolver,
    rel_tol: float = 1e-8,
    max_cycles: int = 100,
    inner_cycles: int = 2,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 8,
):
    """run(u_hi, u_lo, f_hi, f_lo) -> (u_hi, u_lo, norm, n_outer): the
    whole electrospray solve as ONE jitted lax.while_loop on the padded
    fused-Pallas tier — the mixed-BC twin of
    cycles_padded.make_on_device_df_solver. Honors solver.gamma
    (W-cycle); solver.boundary_band_* applies only to the host paths.

    Pair with setup_mixed_df_problem; recover the solution with
    unpack_mixed_solution."""
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    if getattr(solver, "boundary_band_iters", 0):
        import warnings

        warnings.warn(
            "make_mixed_padded_df_solver honors gamma but NOT "
            "boundary_band_width/iters — a solver configured with the "
            "MIXED_BC.md band fix converges differently on this tier "
            "than on solve_on_device (use gamma=2 W-cycles here)",
            stacklevel=2,
        )

    hier = solver.hier
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    inner = _make_mixed_descend(solver, hier32, jnp_level_max, block_i)
    level = hier.num_levels - 1
    n = hier.sizes[level]
    h = hier.spacing(level)
    _, sj, sk = pk.padded_shape(n)
    pin_top = pm.dirichlet_pin_planes(solver.problem, n, sj, sk)

    _, vals64 = solver.problem.boundary_masks(n)
    v0_hi, v0_lo = pk.df_split(jnp.asarray(vals64[0]))
    v1_hi, v1_lo = pk.df_split(jnp.asarray(vals64[n - 1]))
    vals_hi = jnp.stack([jnp.pad(v0_hi, ((0, sj - n), (0, sk - n))),
                         jnp.pad(v1_hi, ((0, sj - n), (0, sk - n)))])
    vals_lo = jnp.stack([jnp.pad(v0_lo, ((0, sj - n), (0, sk - n))),
                         jnp.pad(v1_lo, ((0, sj - n), (0, sk - n)))])

    def enforce_outer_bcs(u_hi, u_lo):
        u_hi = apply_bcs_padded(u_hi, n, pin_top, vals_hi)
        u_lo = apply_bcs_padded(u_lo, n, pin_top, vals_lo)
        return u_hi, u_lo

    def residual_norm(u_hi, u_lo, f_hi, f_lo):
        r, nrm2 = pk.residual_df_norm_fused_padded(u_hi, u_lo, f_hi, f_lo,
                                                   h, n)
        return r, jnp.sqrt(nrm2)

    def body(state):
        u_hi, u_lo, r, nrm, it, f_hi, f_lo = state
        e = inner(None, r, level, from_zero=True)
        for _ in range(inner_cycles - 1):  # static unroll
            e = inner(e, r, level)
        u_hi, u_lo = pk.df_add(u_hi, u_lo, e)
        u_hi, u_lo = enforce_outer_bcs(u_hi, u_lo)
        r, nrm = residual_norm(u_hi, u_lo, f_hi, f_lo)
        return u_hi, u_lo, r, nrm, it + 1, f_hi, f_lo

    @jax.jit
    def run(u_hi, u_lo, f_hi, f_lo):
        r0, n0 = residual_norm(u_hi, u_lo, f_hi, f_lo)
        tol = jnp.asarray(rel_tol, f32) * n0

        def cond(state):
            nrm, it = state[3], state[4]
            return jnp.logical_and(nrm > tol, it < max_cycles)

        out = jax.lax.while_loop(
            cond, body, (u_hi, u_lo, r0, n0, jnp.asarray(0), f_hi, f_lo)
        )
        return out[0], out[1], out[3], out[4]

    return run


def setup_mixed_df_problem(solver: MixedBCSolver):
    """(u_hi, u_lo, f_hi, f_lo) padded df pair from the electrospray
    initial state (BC-enforced zeros; f = 0)."""
    u0, f = solver.initial_state()
    u_hi, u_lo = pk.df_split(jnp.asarray(u0, jnp.float64), pad=True)
    f_hi, f_lo = pk.df_split(jnp.asarray(f, jnp.float64), pad=True)
    return u_hi, u_lo, f_hi, f_lo


def unpack_mixed_solution(u_hi, u_lo, hier: Hierarchy):
    n = hier.finest_n
    return pk.unpad3(pk.df_to_f64(u_hi, u_lo), n)


# ------------------------------------------------ k-FOLD tier (round 4)
# The mixed twin of the Dirichlet k-trim layout: lanes store k = 1..n-2
# only (ops.pallas_mixed_fold) — 384->256 lanes at 257, 256->128 at 129.
# Levels whose fold kernels fit VMEM run entirely in fold coordinates;
# anything else (small levels, the coarse LU) delegates to the full-
# layout descend through exact fold<->full conversions.

from multigrid_parallel_tpu.ops import pallas_mixed_fold as pmf  # noqa: E402


def _make_mixed_descend_fold(
    solver: MixedBCSolver,
    hier32: Hierarchy,
    jnp_level_max: int,
    block_i: int,
):
    """descend(e_f, r_f, level, from_zero) on fold-layout arrays."""
    n_smooth = solver.n_smooth
    gamma = solver.gamma
    gamma_min_n = solver.gamma_min_n
    problem = solver.problem
    full = _make_mixed_descend(solver, hier32, jnp_level_max, block_i)

    pins_f = []
    sgns_f = []
    for lvl in range(hier32.num_levels):
        nl = hier32.sizes[lvl]
        _, sj, skf = pmf.fold_shape(nl)
        pins_f.append(pmf.fold_pin_planes(problem, nl, sj, skf))
        sgn = pmf.fold_edge_sign_planes(problem, nl, sj, skf)
        # static skip: the annulus reaches the k-edge-adjacent plane
        # only on coarse grids, so fine levels pay no delta matmuls
        sgns_f.append((sgn, bool(np.any(np.asarray(sgn)))))

    def descend(e, r, level, from_zero=False):
        n = hier32.sizes[level]
        _, sj, skf = pmf.fold_shape(n)
        bi_s = pmf.mixed_fold_block_i(n, sj, skf, n_smooth,
                                      requested=block_i)
        bi_rr = pmf.rr_fold_block_i(n, sj, skf)
        bi_p = pmf.mixed_fold_prolong_block_i(n, sj, skf, n_smooth,
                                              requested=block_i)
        # Split ladder (cycles_padded._make_descend / cycles_split):
        # when the full n_smooth fusion window only fits a tiny block
        # (the 513^3 fold level: smooth=2, ps does not fit at all), run
        # single-iteration passes at the bigger block the halved window
        # allows — identical half-sweep sequence (the folded BC pass is
        # per half-sweep, so it splits losslessly too).
        bi_s1 = pmf.mixed_fold_block_i(n, sj, skf, 1, requested=block_i) \
            if n_smooth > 1 else 0
        bi_p1 = pmf.mixed_fold_prolong_block_i(n, sj, skf, 1,
                                               requested=block_i) \
            if n_smooth > 1 else 0
        sm_split = bi_s < 8 and bi_s1 > bi_s and bi_s1 >= 4
        ps_split = bi_p < 8 and bi_p1 > bi_p and bi_p1 >= 4
        use_fold = (level > 0 and n > jnp_level_max
                    and (bi_s or sm_split) and bi_rr
                    and (bi_p or ps_split))
        if not use_fold:
            # delegate the whole subtree to the full-layout descend
            r_full = pmf.fold_to_full_rhs(r, n)
            e_full = None if e is None else pmf.unpack_fold(e, n)
            out = full(e_full, r_full, level, from_zero=from_zero)
            return pmf.full_to_fold(out, n)
        h = hier32.spacing(level)
        pin = pins_f[level]
        if sm_split:
            for it in range(n_smooth):
                if from_zero and it == 0:
                    e = pmf.mixed_rb_smooth_from_zero_fold(
                        r, pin, h, 1, n, red_first=True, block_i=bi_s1)
                else:
                    e = pmf.mixed_rb_smooth_fold(
                        e, r, pin, h, 1, n, red_first=True, block_i=bi_s1)
        elif from_zero:
            e = pmf.mixed_rb_smooth_from_zero_fold(
                r, pin, h, n_smooth, n, red_first=True, block_i=bi_s)
        else:
            e = pmf.mixed_rb_smooth_fold(
                e, r, pin, h, n_smooth, n, red_first=True, block_i=bi_s)
        rc = pmf.residual_restrict_fold(e, r, h, n, block_i=bi_rr)
        ec = descend(None, rc, level - 1, from_zero=True)
        if level - 1 > 0 and hier32.sizes[level - 1] >= gamma_min_n:
            for _ in range(gamma - 1):  # W-cycle revisits (depth-capped)
                ec = descend(ec, rc, level - 1)
        sgn_c, has_delta = sgns_f[level - 1]
        if not ps_split:
            return pmf.mixed_prolong_smooth_fold(ec, e, r, pin, sgn_c, h,
                                                 n_smooth, n, block_i=bi_p,
                                                 with_delta=has_delta)
        # ps ladder: interpolate+correct+ONE black-first iteration, then
        # n_smooth-1 single-iteration passes (ps_split implies
        # n_smooth > 1, so bi_s1 is live here).
        e = pmf.mixed_prolong_smooth_fold(ec, e, r, pin, sgn_c, h, 1, n,
                                          block_i=bi_p1,
                                          with_delta=has_delta)
        for _ in range(n_smooth - 1):
            e = pmf.mixed_rb_smooth_fold(
                e, r, pin, h, 1, n, red_first=False,
                block_i=bi_s1 if sm_split else bi_s)
        return e

    return descend


def apply_bcs_fold(e, n, pin, vals=None):
    """apply_bcs_padded on a fold-layout (n, sj, skf) array: x and y
    Neumann copies + the Dirichlet pin; the z faces are not stored."""
    e = e.at[0].set(e[1])
    e = e.at[n - 1].set(e[n - 2])
    e = e.at[:, 0].set(e[:, 1])
    e = e.at[:, n - 1].set(e[:, n - 2])
    v0 = jnp.zeros_like(e[0]) if vals is None else vals[0]
    v1 = jnp.zeros_like(e[0]) if vals is None else vals[1]
    e = e.at[0].set(jnp.where(pin[0] > 0.5, v0, e[0]))
    return e.at[n - 1].set(jnp.where(pin[1] > 0.5, v1, e[n - 1]))


def make_mixed_fold_df_solver(
    solver: MixedBCSolver,
    rel_tol: float = 1e-8,
    max_cycles: int = 100,
    inner_cycles: int = 2,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 8,
):
    """The k-fold twin of make_mixed_padded_df_solver: same solve, 2/3
    of the fine-level (1/2 of the 129-level) HBM traffic and lanes.
    Pair with setup_mixed_fold_df_problem / unpack_mixed_fold_solution.
    """
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    if getattr(solver, "boundary_band_iters", 0):
        import warnings

        warnings.warn(
            "make_mixed_fold_df_solver honors gamma but NOT "
            "boundary_band_width/iters (use gamma=2 W-cycles here)",
            stacklevel=2,
        )

    hier = solver.hier
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    inner = _make_mixed_descend_fold(solver, hier32, jnp_level_max, block_i)
    level = hier.num_levels - 1
    n = hier.sizes[level]
    h = hier.spacing(level)
    _, sj, skf = pmf.fold_shape(n)
    pin_top = pmf.fold_pin_planes(solver.problem, n, sj, skf)

    _, vals64 = solver.problem.boundary_masks(n)
    v0_hi, v0_lo = pk.df_split(jnp.asarray(vals64[0]))
    v1_hi, v1_lo = pk.df_split(jnp.asarray(vals64[n - 1]))

    def fold_plane_pair(v0, v1):
        out = jnp.stack([
            jnp.pad(v0, ((0, sj - n), (0, 0))),
            jnp.pad(v1, ((0, sj - n), (0, 0))),
        ])[:, :, 1 : n - 1]
        return jnp.pad(out, ((0, 0), (0, 0), (0, skf - (n - 2))))

    vals_hi = fold_plane_pair(v0_hi, v1_hi)
    vals_lo = fold_plane_pair(v0_lo, v1_lo)

    bi_r = pmf.fold_residual_block_i(n, sj, skf, requested=block_i)

    def enforce_outer_bcs(u_hi, u_lo):
        u_hi = apply_bcs_fold(u_hi, n, pin_top, vals_hi)
        u_lo = apply_bcs_fold(u_lo, n, pin_top, vals_lo)
        return u_hi, u_lo

    def residual_norm(u_hi, u_lo, f_hi, f_lo):
        if bi_r:
            r, nrm2 = pmf.residual_df_norm_fold(u_hi, u_lo, f_hi, f_lo,
                                                h, n, block_i=bi_r)
        else:  # tiny grids: full-layout kernel (or its jnp fallback)
            r_full, nrm2 = pk.residual_df_norm_fused_padded(
                pmf.unpack_fold(u_hi, n), pmf.unpack_fold(u_lo, n),
                pmf.fold_to_full_rhs(f_hi, n), pmf.fold_to_full_rhs(f_lo, n),
                h, n)
            r = pmf.pack_fold(r_full, n)
        return r, jnp.sqrt(nrm2)

    def body(state):
        u_hi, u_lo, r, nrm, it, f_hi, f_lo = state
        e = inner(None, r, level, from_zero=True)
        for _ in range(inner_cycles - 1):  # static unroll
            e = inner(e, r, level)
        u_hi, u_lo = pk.df_add(u_hi, u_lo, e)
        u_hi, u_lo = enforce_outer_bcs(u_hi, u_lo)
        r, nrm = residual_norm(u_hi, u_lo, f_hi, f_lo)
        return u_hi, u_lo, r, nrm, it + 1, f_hi, f_lo

    @jax.jit
    def run(u_hi, u_lo, f_hi, f_lo):
        r0, n0 = residual_norm(u_hi, u_lo, f_hi, f_lo)
        tol = jnp.asarray(rel_tol, f32) * n0

        def cond(state):
            nrm, it = state[3], state[4]
            return jnp.logical_and(nrm > tol, it < max_cycles)

        out = jax.lax.while_loop(
            cond, body, (u_hi, u_lo, r0, n0, jnp.asarray(0), f_hi, f_lo)
        )
        return out[0], out[1], out[3], out[4]

    return run


# --------------------------------------- SPLIT-COLOR tier (round 5)
# The mixed twin of cycles_split: the FINEST level runs in red/black
# k-compressed pairs (ops.pallas_mixed_split — each half-sweep computes
# only the active color, halving the most compute-bound stage in the
# repo), the fused rr/ps kernels emit/consume the coarse k-FOLD layout,
# and every coarser level stays on the fold descend above.

from multigrid_parallel_tpu.ops import pallas_mixed_split as pms  # noqa: E402
from multigrid_parallel_tpu.ops import pallas_split as psp  # noqa: E402


def mixed_split_plan(n, sj, skh, n_smooth, smooth_block_i=24,
                     ps_block_i=16):
    """Per-kernel block_i choices for the mixed split tier at level n;
    any 0 means that kernel does not fit VMEM at that window."""
    return dict(
        smooth=pms.msplit_smooth_block_i(n, sj, skh, n_smooth,
                                         requested=smooth_block_i),
        from_zero=pms.msplit_from_zero_block_i(n, sj, skh, n_smooth,
                                               requested=smooth_block_i),
        rr=pms.msplit_rr_block_i(n, sj, skh),
        ps=pms.msplit_ps_block_i(n, sj, skh, n_smooth,
                                 requested=ps_block_i),
        resid=pms.msplit_residual_block_i(n, sj, skh),
    )


def mixed_split_available(solver: MixedBCSolver) -> bool:
    """True when the finest level supports the mixed split tier
    (compression halves the lanes AND every stage fits VMEM, counting
    the single-iteration split-ladder windows)."""
    n = solver.hier.finest_n
    if not psp.split_supported(n) or not pms.msplit_widths_ok(n):
        return False
    ns = solver.n_smooth
    _, sj, skh = psp.split_shape(n)
    plan = mixed_split_plan(n, sj, skh, ns)
    plan1 = mixed_split_plan(n, sj, skh, 1) if ns > 1 else None
    sm_ok = plan["smooth"] or (plan1 and plan1["smooth"])
    ps_ok = plan["ps"] or (plan1 and plan1["ps"])
    return bool(sm_ok and ps_ok and plan["rr"] and plan["resid"])


def make_mixed_split_df_solver(
    solver: MixedBCSolver,
    rel_tol: float = 1e-8,
    max_cycles: int = 100,
    inner_cycles: int = 2,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 8,
    smooth_block_i: int = 24,
    ps_block_i: int = 16,
    force: bool = False,
):
    """The split-color twin of make_mixed_fold_df_solver: same solve,
    half the finest-level smoother compute. Pair with
    setup_mixed_split_df_problem / unpack_mixed_split_solution.
    ``block_i`` feeds the fold sub-hierarchy; ``smooth_block_i`` /
    ``ps_block_i`` tune the split fine-level kernels. ``force`` runs
    the tier at grids where compression does not pay (CPU tests)."""
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    if getattr(solver, "boundary_band_iters", 0):
        import warnings

        warnings.warn(
            "make_mixed_split_df_solver honors gamma but NOT "
            "boundary_band_width/iters (use gamma=2 W-cycles here)",
            stacklevel=2,
        )

    hier = solver.hier
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    level = hier.num_levels - 1
    n = hier.sizes[level]
    h = hier.spacing(level)
    ns = solver.n_smooth
    gamma = solver.gamma
    gamma_min_n = solver.gamma_min_n
    if not force and not psp.split_supported(n):
        raise ValueError(f"split layout does not compress at n={n} "
                         "(needs rup((n-1)//2,128) == rup(n-1,128)//2)")
    assert pms.msplit_widths_ok(n), n
    _, sj, skh = psp.split_shape(n)
    plan = mixed_split_plan(n, sj, skh, ns, smooth_block_i, ps_block_i)
    plan1 = mixed_split_plan(n, sj, skh, 1, smooth_block_i, ps_block_i) \
        if ns > 1 else None
    # Split ladder (cycles_split): when the full n_smooth window only
    # fits a tiny block, run single-iteration passes at the bigger
    # block the halved window allows — identical half-sweep sequence.
    sm_split = bool(plan1) and plan["smooth"] < 8 \
        and plan1["smooth"] > plan["smooth"] and plan1["smooth"] >= 4
    ps_split = bool(plan1) and plan["ps"] < 8 \
        and plan1["ps"] > plan["ps"] and plan1["ps"] >= 4
    ok = ((plan["smooth"] or sm_split) and (plan["ps"] or ps_split)
          and plan["rr"] and plan["resid"])
    if not ok:
        raise ValueError(
            f"mixed split kernels do not fit VMEM at n={n}: {plan}")

    fold_descend = _make_mixed_descend_fold(solver, hier32, jnp_level_max,
                                            block_i)

    problem = solver.problem
    pinp = pms.msplit_pin_packs(problem, n, sj, skh)
    nc = hier.sizes[level - 1]
    _, sjcf, skcf = pmf.fold_shape(nc)
    sgn_c = pmf.fold_edge_sign_planes(problem, nc, sjcf, skcf)
    has_delta = bool(np.any(np.asarray(sgn_c)))

    _, vals64 = problem.boundary_masks(n)
    v0_hi, v0_lo = pk.df_split(jnp.asarray(vals64[0]))
    v1_hi, v1_lo = pk.df_split(jnp.asarray(vals64[n - 1]))
    vals_hi_p = pms.msplit_plane_packs(jnp.stack([v0_hi, v1_hi]), n, sj, skh)
    vals_lo_p = pms.msplit_plane_packs(jnp.stack([v0_lo, v1_lo]), n, sj, skh)

    def smooth_passes(er, eb, rr_, rb_, red_first, first_from_zero=False,
                      n_it=ns):
        for it in range(n_it):
            if first_from_zero and it == 0:
                er, eb = pms.mixed_rb_smooth_from_zero_msplit(
                    rr_, rb_, pinp, h, 1, n, red_first=red_first,
                    block_i=plan1["from_zero"])
            else:
                er, eb = pms.mixed_rb_smooth_msplit(
                    er, eb, rr_, rb_, pinp, h, 1, n, red_first=red_first,
                    block_i=plan1["smooth"])
        return er, eb

    def cycle(e2, r2, from_zero=False):
        rr_, rb_ = r2
        if sm_split:
            e0 = (None, None) if from_zero else e2
            er, eb = smooth_passes(e0[0], e0[1], rr_, rb_, True,
                                   first_from_zero=from_zero)
        elif from_zero:
            er, eb = pms.mixed_rb_smooth_from_zero_msplit(
                rr_, rb_, pinp, h, ns, n, red_first=True,
                block_i=plan["from_zero"])
        else:
            er, eb = pms.mixed_rb_smooth_msplit(
                e2[0], e2[1], rr_, rb_, pinp, h, ns, n, red_first=True,
                block_i=plan["smooth"])
        rc = pms.residual_restrict_msplit(er, eb, rr_, rb_, h, n,
                                          block_i=plan["rr"])
        ec = fold_descend(None, rc, level - 1, from_zero=True)
        if level - 1 > 0 and nc >= gamma_min_n:
            for _ in range(gamma - 1):  # W-cycle revisits (depth-capped)
                ec = fold_descend(ec, rc, level - 1)
        if ps_split:
            er, eb = pms.mixed_prolong_smooth_msplit(
                ec, er, eb, rr_, rb_, pinp, sgn_c, h, 1, n,
                block_i=plan1["ps"], with_delta=has_delta)
            er, eb = smooth_passes(er, eb, rr_, rb_, False, n_it=ns - 1)
        else:
            er, eb = pms.mixed_prolong_smooth_msplit(
                ec, er, eb, rr_, rb_, pinp, sgn_c, h, ns, n,
                block_i=plan["ps"], with_delta=has_delta)
        return (er, eb)

    def residual_norm(u4, f4):
        r_r, r_b, nrm2 = pms.residual_df_norm_msplit(
            *u4, *f4, h, n, block_i=plan["resid"])
        return (r_r, r_b), jnp.sqrt(nrm2)

    def body(state):
        u4, r2, nrm, it, f4 = state
        e2 = cycle(None, r2, from_zero=True)
        for _ in range(inner_cycles - 1):  # static unroll
            e2 = cycle(e2, r2)
        hr, lr = pk.df_add(u4[0], u4[2], e2[0])
        hb, lb = pk.df_add(u4[1], u4[3], e2[1])
        hr, hb = pms.apply_bcs_split_pair(hr, hb, n, pinp, vals_hi_p)
        lr, lb = pms.apply_bcs_split_pair(lr, lb, n, pinp, vals_lo_p)
        r2, nrm = residual_norm((hr, hb, lr, lb), f4)
        return (hr, hb, lr, lb), r2, nrm, it + 1, f4

    @jax.jit
    def run(u_hr, u_hb, u_lr, u_lb, f_hr, f_hb, f_lr, f_lb):
        u4 = (u_hr, u_hb, u_lr, u_lb)
        f4 = (f_hr, f_hb, f_lr, f_lb)
        r0, n0 = residual_norm(u4, f4)
        tol = jnp.asarray(rel_tol, f32) * n0

        def cond(state):
            nrm, it = state[2], state[3]
            return jnp.logical_and(nrm > tol, it < max_cycles)

        out = jax.lax.while_loop(
            cond, body, (u4, r0, n0, jnp.asarray(0), f4)
        )
        hr, hb, lr, lb = out[0]
        return hr, hb, lr, lb, out[2], out[3]

    return run


def setup_mixed_split_df_problem(solver: MixedBCSolver):
    """setup_mixed_df_problem packed into split pairs:
    (u_hr, u_hb, u_lr, u_lb, f_hr, f_hb, f_lr, f_lb)."""
    u_hi, u_lo, f_hi, f_lo = setup_mixed_df_problem(solver)
    n = solver.hier.finest_n
    return (*psp.pack_split(u_hi, n), *psp.pack_split(u_lo, n),
            *psp.pack_split(f_hi, n), *psp.pack_split(f_lo, n))


def unpack_mixed_split_solution(u_hr, u_hb, u_lr, u_lb,
                                solver: MixedBCSolver):
    """Split df solution -> (n, n, n) f64 cube with one final host-side
    BC pass (restores the k faces, which the split layout does not
    store, and the Dirichlet patch values on their edge nodes)."""
    hier = solver.hier
    n = hier.finest_n
    u_hi = psp.unpack_split(u_hr, u_hb, n)
    u_lo = psp.unpack_split(u_lr, u_lb, n)
    if u_hi.shape[2] < n:  # trim width rup(n-1,128) may be n-1 (513)
        padk = ((0, 0), (0, 0), (0, n - u_hi.shape[2]))
        u_hi = jnp.pad(u_hi, padk)
        u_lo = jnp.pad(u_lo, padk)
    u = pk.unpad3(pk.df_to_f64(u_hi, u_lo), n)
    return solver._apply_bcs(u, hier.num_levels - 1, zero_dirichlet=False)


def setup_mixed_fold_df_problem(solver: MixedBCSolver):
    """setup_mixed_df_problem packed into the fold layout."""
    u_hi, u_lo, f_hi, f_lo = setup_mixed_df_problem(solver)
    n = solver.hier.finest_n
    return (pmf.pack_fold(u_hi, n), pmf.pack_fold(u_lo, n),
            pmf.pack_fold(f_hi, n), pmf.pack_fold(f_lo, n))


def unpack_mixed_fold_solution(u_hi, u_lo, solver: MixedBCSolver):
    """Fold df solution -> (n, n, n) f64 cube with one final host-side
    BC pass (restores Dirichlet patch values on k-face edge nodes of
    the x faces, which the fold reconstructs as Neumann copies)."""
    hier = solver.hier
    n = hier.finest_n
    u = pk.unpad3(pk.df_to_f64(pmf.unpack_fold(u_hi, n),
                               pmf.unpack_fold(u_lo, n)), n)
    return solver._apply_bcs(u, hier.num_levels - 1, zero_dirichlet=False)
