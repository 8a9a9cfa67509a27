"""Distributed electrospray performance tier: the padded fused-Pallas
mixed-BC cycle under shard_map (round-3 verdict item #4).

parallel/sharded_mixed.py shards the REFERENCE-SHAPED mixed cycle
(unpadded jnp ops — correct, equivalence-tested, slow); this module is
its performance twin, mirroring parallel/sharded_padded.py: the i axis
is sharded in the lane-padded layout, every hot stage runs the
sharded-local fused mixed kernels (ops.pallas_mixed *_ext — BC
enforcement inside the streaming smoother), the residual+restrict and
EFT-norm stages reuse the DIRICHLET ext kernels verbatim (the interior
residual reads whatever boundary values the smoother maintained — same
argument as the single-chip tier, mixed_padded.py), and the outer loop
is the double-float defect iteration with per-step BC re-enforcement,
all inside ONE jitted lax.while_loop. Coarse levels gather to
replicated and reuse the single-chip mixed padded descend
(mixed_padded._make_mixed_descend).

Reference: mg_3d_bkup.c:84-133 (the electrospray driver whose physics
this distributes).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu import mixed_padded as mp
from multigrid_parallel_tpu.hierarchy import Hierarchy
from multigrid_parallel_tpu.mixed_bc import MixedBCSolver
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_mixed as pmx
from multigrid_parallel_tpu.ops import pallas_sharded as px
from multigrid_parallel_tpu.ops import stencils_3d as ops3
from multigrid_parallel_tpu.parallel.sharded import (
    ShardPlan,
    _perm_bwd,
    _perm_fwd,
    plan_sharding,
)
from multigrid_parallel_tpu.parallel.sharded_padded import (
    _gi0,
    _halo_bi,
    _halo_ext,
    _halo_parts,
    _local_masks,
    _residual_df_norm_local_jnp,
    prolong_correct_local_padded,
    residual_local_padded,
    restrict_local_padded,
)


def apply_bcs_local_padded(u, n, axis, n_dev, pin, vals=None):
    """Mixed-BC enforcement on a local PADDED (L, SJ, SK) block: x-face
    copies via one-plane ppermute shifts (the source plane can live on
    the neighbor device), j/k face copies local, then the Dirichlet
    patch pin. ``pin``/(optional) ``vals``: (2, SJ, SK) planes."""
    L = u.shape[0]
    g0 = jax.lax.axis_index(axis) * L
    g = g0 + jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1), 0)
    dn = jnp.concatenate(
        [jax.lax.ppermute(u[-1:], axis, _perm_fwd(n_dev)), u[:-1]], axis=0
    )
    up = jnp.concatenate(
        [u[1:], jax.lax.ppermute(u[:1], axis, _perm_bwd(n_dev))], axis=0
    )
    u = jnp.where(g == 0, up, u)
    u = jnp.where(g == n - 1, dn, u)
    u = u.at[:, 0].set(u[:, 1])
    u = u.at[:, n - 1].set(u[:, n - 2])
    u = u.at[:, :, 0].set(u[:, :, 1])
    u = u.at[:, :, n - 1].set(u[:, :, n - 2])
    v0 = jnp.zeros_like(u[0]) if vals is None else vals[0]
    v1 = jnp.zeros_like(u[0]) if vals is None else vals[1]
    u = jnp.where(jnp.logical_and(g == 0, pin[0][None] > 0.5), v0[None], u)
    return jnp.where(jnp.logical_and(g == n - 1, pin[1][None] > 0.5),
                     v1[None], u)


def _mixed_smooth_local_padded(e, r, h, n_iter, n, axis, n_dev, pin,
                               red_first=True):
    """Masked-roll mixed smoother on padded local blocks (small levels /
    Pallas-ineligible fallback; BC pass per half-sweep as the single-
    chip jnp path)."""
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
            e = apply_bcs_local_padded(e, n, axis, n_dev, pin)
    return e


def _use_pallas_mixed(n, L, H, jnp_level_max):
    return n > jnp_level_max and L >= max(H + 2, 4)


def _build_local_mixed_cycle(
    solver: MixedBCSolver,
    hier32: Hierarchy,
    plan: ShardPlan,
    axis: str,
    n_dev: int,
    jnp_level_max: int,
    block_i: int = 8,
):
    """cycle_local(e, r, from_zero) -> e' on local padded blocks inside
    shard_map — the mixed twin of sharded_padded._build_local_cycle."""
    n_smooth = solver.n_smooth
    gamma = solver.gamma
    gamma_min_n = solver.gamma_min_n
    problem = solver.problem
    H = 2 * n_smooth
    rep_level = hier32.num_levels - 1 - plan.n_sharded
    sub = dataclasses.replace(hier32, num_levels=rep_level + 1)
    rep_descend = mp._make_mixed_descend(solver, sub, jnp_level_max, block_i)
    n_rep = hier32.sizes[rep_level]
    assert plan.padded_planes(plan.n_sharded) >= n_rep, (plan, n_rep)

    pins = []
    for lvl in range(hier32.num_levels):
        nl = hier32.sizes[lvl]
        _, sjl, skl = pk.padded_shape(nl)
        pins.append(pmx.dirichlet_pin_planes(problem, nl, sjl, skl))

    def descend(e, r, level, depth, from_zero=False):
        n = hier32.sizes[level]
        if depth == plan.n_sharded:
            r_rep = jax.lax.all_gather(r, axis, axis=0, tiled=True)[:n]
            if from_zero:
                e_rep = rep_descend(None, r_rep, level, from_zero=True)
            else:
                e_gath = jax.lax.all_gather(e, axis, axis=0, tiled=True)[:n]
                e_rep = rep_descend(e_gath, r_rep, level)
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
        pin = pins[level]
        pal = _use_pallas_mixed(n, L, H, jnp_level_max)
        nc = hier32.sizes[level - 1]

        # --- pre-smooth (red-first, folded copy-BCs)
        bi_s = pmx.mixed_block_i(n, sj, sk, n_smooth,
                                 requested=block_i) if pal else 0
        bi_s = bi_s if (bi_s and L >= bi_s) else 0
        bi_sh = _halo_bi(bi_s, L, H)
        if bi_sh:
            # halo-DMA tier (same scheme as sharded_padded)
            bi_s = bi_sh
            g = _gi0(axis, L, H)
            if from_zero:
                e = pmx.mixed_rb_smooth_from_zero_halo(
                    _halo_parts(r, axis, n_dev, H, H, bi_s), pin, g, h,
                    n_smooth, n, L, red_first=True, block_i=bi_s,
                )
            else:
                e = pmx.mixed_rb_smooth_halo(
                    _halo_parts(e, axis, n_dev, H, H, bi_s),
                    _halo_parts(r, axis, n_dev, H, H, bi_s),
                    pin, g, h, n_smooth, n, L, red_first=True, block_i=bi_s,
                )
        elif bi_s:
            g = _gi0(axis, L, H)
            if from_zero:
                e = pmx.mixed_rb_smooth_from_zero_ext(
                    _halo_ext(r, axis, n_dev, H), pin, g, h, n_smooth, n, L,
                    red_first=True, block_i=bi_s,
                )
            else:
                e = pmx.mixed_rb_smooth_ext(
                    _halo_ext(e, axis, n_dev, H), _halo_ext(r, axis, n_dev, H),
                    pin, g, h, n_smooth, n, L, red_first=True, block_i=bi_s,
                )
        else:
            if from_zero:
                e = jnp.zeros_like(r)
            e = _mixed_smooth_local_padded(e, r, h, n_smooth, n, axis, n_dev,
                                           pin, True)

        # --- residual + restrict: Dirichlet halo/ext kernels apply
        # verbatim (same halo-DMA tier as sharded_padded)
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
        if level - 1 > 0 and hier32.sizes[level - 1] >= gamma_min_n:
            for _ in range(gamma - 1):  # W-cycle revisits (depth-capped)
                ec = descend(ec, rc, level - 1, depth + 1)

        # --- prolong + correct + BCs + post-smooth (black-first)
        bi_p = pmx.mixed_prolong_block_i(n, sj, sk, n_smooth,
                                         requested=block_i) if pal else 0
        bi_p = bi_p if (bi_p and L >= bi_p) else 0
        bi_ph = _halo_bi(bi_p, L, H + 2)
        if bi_ph:
            e = pmx.mixed_prolong_smooth_halo(
                _halo_parts(ec, axis, n_dev, n_smooth, n_smooth + 1,
                            bi_ph // 2),
                _halo_parts(e, axis, n_dev, H, H, bi_ph),
                _halo_parts(r, axis, n_dev, H, H, bi_ph),
                pin, _gi0(axis, L, H), h, n_smooth, n, L, block_i=bi_ph,
            )
        elif bi_p:
            hc = n_smooth + 1
            e = pmx.mixed_prolong_smooth_ext(
                _halo_ext(ec, axis, n_dev, hc), _halo_ext(e, axis, n_dev, H),
                _halo_ext(r, axis, n_dev, H), pin, _gi0(axis, L, H),
                h, n_smooth, n, L, block_i=bi_p,
            )
        else:
            e = prolong_correct_local_padded(ec, e, nc, axis, n_dev)
            e = apply_bcs_local_padded(e, n, axis, n_dev, pin)
            e = _mixed_smooth_local_padded(e, r, h, n_smooth, n, axis, n_dev,
                                           pin, False)
        return e

    level = hier32.num_levels - 1

    def cycle(e, r, from_zero=False):
        return descend(e, r, level, 0, from_zero=from_zero)

    return cycle


def make_sharded_mixed_padded_df_solver(
    solver: MixedBCSolver,
    mesh: Mesh,
    plan: Optional[ShardPlan] = None,
    rel_tol: float = 1e-8,
    max_cycles: int = 100,
    inner_cycles: int = 2,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 8,
) -> Tuple[Callable, ShardPlan]:
    """run(u_hi, u_lo, f_hi, f_lo) -> (u_hi, u_lo, norm, n_outer): the
    distributed electrospray solve as ONE jitted lax.while_loop — the
    sharded twin of mixed_padded.make_mixed_padded_df_solver (honors
    solver.gamma; boundary_band_* stays a host-path feature, as there).
    Convergence: ||r|| <= rel_tol * ||r0|| (f = 0, mixed convention)."""
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    hier = solver.hier
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if plan is None:
        plan = plan_sharding(hier, n_dev, axis)
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    inner = _build_local_mixed_cycle(solver, hier32, plan, axis, n_dev,
                                     jnp_level_max, block_i)
    level = hier.num_levels - 1
    n = hier.sizes[level]
    h = hier.spacing(level)
    L0 = plan.local_planes(0)
    _, sj, sk = pk.padded_shape(n)
    pin_top = pmx.dirichlet_pin_planes(solver.problem, n, sj, sk)

    _, vals64 = solver.problem.boundary_masks(n)
    v0_hi, v0_lo = pk.df_split(jnp.asarray(vals64[0]))
    v1_hi, v1_lo = pk.df_split(jnp.asarray(vals64[n - 1]))
    vals_hi = jnp.stack([jnp.pad(v0_hi, ((0, sj - n), (0, sk - n))),
                         jnp.pad(v1_hi, ((0, sj - n), (0, sk - n)))])
    vals_lo = jnp.stack([jnp.pad(v0_lo, ((0, sj - n), (0, sk - n))),
                         jnp.pad(v1_lo, ((0, sj - n), (0, sk - n)))])

    def enforce_outer_bcs(u_hi, u_lo):
        u_hi = apply_bcs_local_padded(u_hi, n, axis, n_dev, pin_top, vals_hi)
        u_lo = apply_bcs_local_padded(u_lo, n, axis, n_dev, pin_top, vals_lo)
        return u_hi, u_lo

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
        r0, n0 = residual_norm(u_hi, u_lo, f_hi, f_lo)
        tol = jnp.asarray(rel_tol, f32) * n0

        def body(state):
            u_hi, u_lo, r, nrm, it, f_hi, f_lo = state
            e = inner(None, r, from_zero=True)
            for _ in range(inner_cycles - 1):  # static unroll
                e = inner(e, r)
            u_hi, u_lo = pk.df_add(u_hi, u_lo, e)
            u_hi, u_lo = enforce_outer_bcs(u_hi, u_lo)
            r, nrm = residual_norm(u_hi, u_lo, f_hi, f_lo)
            return u_hi, u_lo, r, nrm, it + 1, f_hi, f_lo

        def cond(state):
            nrm, it = state[3], state[4]
            return jnp.logical_and(nrm > tol, it < max_cycles)

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


def setup_mixed_df_problem_sharded(solver: MixedBCSolver, mesh: Mesh,
                                   plan: ShardPlan):
    """(u_hi, u_lo, f_hi, f_lo): padded double-float electrospray state,
    i-padded to the plan and placed over the mesh."""
    u_hi, u_lo, f_hi, f_lo = mp.setup_mixed_df_problem(solver)
    ipad = plan.padded_planes(0) - solver.hier.finest_n
    sh = NamedSharding(mesh, P(plan.axis))

    def place(x):
        return jax.device_put(jnp.pad(x, ((0, ipad), (0, 0), (0, 0))), sh)

    return place(u_hi), place(u_lo), place(f_hi), place(f_lo)


def unpack_mixed_solution_sharded(u_hi, u_lo, hier: Hierarchy):
    n = hier.finest_n
    return pk.unpad3(pk.df_to_f64(u_hi[:n], u_lo[:n]), n)
