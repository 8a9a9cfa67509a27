"""Split-color performance cycle: the finest level runs in red/black
k-compressed PAIRS (ops.pallas_split) while every coarser level stays on
the rectangular k-trim padded path (cycles_padded) — the round-3 verdict
item #1 wiring.

Why only the finest level: compression halves the k-trim lane count
exactly when rup((n-1)//2, 128) == rup(n-1, 128)//2, i.e. n >= 257
(ops.pallas_split.split_supported); below that the compressed slots pad
back up to a full 128-lane tile and the layout costs MORE traffic for
the same compute. At 257^3 the finest level carries ~7/8 of the cycle's
work, so the coarser levels' rectangular stages are already off the
critical path.

Layout boundary: the fused residual+restrict kernel EMITS the coarse
RHS in the rect k-trim layout (the compressed fine k-width equals the
trim coarse k-width, so it is one masked select away), and the fused
prolong+post-smooth kernel CONSUMES the rect coarse correction — the
cycle never packs or unpacks a whole field on the critical path.

The outer defect iteration (double-float solution + compensated EFT
residual, cycles_padded.make_on_device_df_solver semantics) also runs
on split pairs: df_add is per-color elementwise and the EFT residual
uses the same compressed neighbor addressing as the smoother, emitting
the V-cycle's RHS pair directly.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from multigrid_parallel_tpu import cycles_padded as cp
from multigrid_parallel_tpu.cycles import CycleConfig
from multigrid_parallel_tpu.hierarchy import Hierarchy
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import pallas_split as ps


def split_plan(n: int, sj: int, skh: int, n_smooth: int,
               smooth_block_i: int = 32, ps_block_i: int = 24) -> dict:
    """Per-kernel block_i choices for the split tier at level n; any 0
    means that kernel does not fit VMEM and the tier is unavailable."""
    return dict(
        smooth=ps.split_smooth_block_i(n, sj, skh, n_smooth,
                                       requested=smooth_block_i),
        from_zero=ps.split_from_zero_block_i(n, sj, skh, n_smooth,
                                             requested=smooth_block_i),
        rr=ps.split_rr_block_i(n, sj, skh),
        ps=ps.split_ps_block_i(n, sj, skh, n_smooth,
                               requested=ps_block_i),
        step=ps.split_df_step_block_i(n, sj, skh),
        resid=ps.split_residual_block_i(n, sj, skh),
    )


def split_available(hier: Hierarchy, n_smooth: int = 2) -> bool:
    """True when the finest level supports the split tier (compression
    actually halves the lanes AND every fused kernel fits VMEM)."""
    n = hier.finest_n
    if not ps.split_supported(n):
        return False
    _, sj, skh = ps.split_shape(n)
    return all(v > 0 for v in split_plan(n, sj, skh, n_smooth).values())


def make_split_df_solver(
    hier: Hierarchy,
    cfg: CycleConfig = CycleConfig(),
    rel_tol: float = 1e-8,
    max_cycles: int = 40,
    inner_cycles: int = 4,
    jnp_level_max: int = cp._JNP_LEVEL_MAX,
    block_i: int = 16,
    init_norm: float = None,
    smooth_block_i: int = 32,
    ps_block_i: int = 24,
    force: bool = False,
):
    """run(u_hr, u_hb, u_lr, u_lb, f_hr, f_hb, f_lr, f_lb) ->
    (u_hr', u_hb', u_lr', u_lb', norm, n_outer): the split-color twin of
    cycles_padded.make_on_device_df_solver(trim=True). Inputs from
    setup_split_df_problem; init_norm is REQUIRED (the reference ||f||
    convention, cycles_padded.ref_init_norm — the folded/split f̃ does
    not carry it).

    ``block_i`` feeds the rectangular sub-hierarchy cycle;
    ``smooth_block_i``/``ps_block_i`` tune the split fine-level kernels.
    """
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    levels = hier.num_levels
    n = hier.finest_n
    h = hier.spacing(levels - 1)
    if init_norm is None:
        raise ValueError("split tier needs the reference-convention "
                         "init_norm (ref_init_norm(problem, hier))")
    if not force and not ps.split_supported(n):
        # force=True runs the tier anyway (tests exercise the kernels at
        # CPU-sized grids where compression does not pay).
        raise ValueError(f"split layout does not compress at n={n} "
                         "(needs rup((n-1)//2,128) == rup(n-1,128)//2)")
    _, sj, skh = ps.split_shape(n)
    plan = split_plan(n, sj, skh, cfg.n_smooth, smooth_block_i, ps_block_i)
    if not all(v > 0 for v in plan.values()):
        raise ValueError(f"split kernels do not fit VMEM at n={n}: {plan}")

    sub = dataclasses.replace(hier32, num_levels=levels - 1)
    sub_cycle = cp.make_padded_correction_cycle(sub, cfg, jnp_level_max,
                                                block_i)
    ns = cfg.n_smooth

    # Split ladder (cycles_padded._make_descend / sharded_padded.
    # smooth_stage): when the full n_smooth fusion window only fits a
    # tiny block (the 513-split level: smooth=4, ps=2), run
    # single-iteration passes at the bigger block the halved window
    # allows — identical half-sweep sequence, less trapezoid recompute.
    plan1 = split_plan(n, sj, skh, 1, smooth_block_i, ps_block_i) \
        if ns > 1 else None
    # The stages are compute-bound (docs/ROOFLINE.md): splitting pays
    # whenever the single-iteration window lands on a bigger block than
    # the full window's (trapezoid recompute shrinks faster than the
    # extra HBM pass costs) — at 513-split: smooth 4 -> 6, ps 2 -> 4.
    sm_split = bool(plan1) and plan["smooth"] < 8 \
        and plan1["smooth"] > plan["smooth"] and plan1["smooth"] >= 4
    ps_split = bool(plan1) and plan["ps"] < 8 \
        and plan1["ps"] > plan["ps"] and plan1["ps"] >= 4

    def smooth_passes(er, eb, rr_, rb_, red_first, first_from_zero=False,
                      n_it=ns):
        for it in range(n_it):
            if first_from_zero and it == 0:
                er, eb = ps.rb_smooth_split_from_zero(
                    rr_, rb_, h, 1, n, red_first=red_first,
                    block_i=plan1["from_zero"],
                )
            else:
                er, eb = ps.rb_smooth_split(
                    er, eb, rr_, rb_, h, 1, n, red_first=red_first,
                    block_i=plan1["smooth"],
                )
        return er, eb

    def cycle(e2, r2, from_zero=False):
        rr_, rb_ = r2
        if sm_split:
            e0 = (None, None) if from_zero else e2
            er, eb = smooth_passes(e0[0], e0[1], rr_, rb_, True,
                                   first_from_zero=from_zero)
        elif from_zero:
            er, eb = ps.rb_smooth_split_from_zero(
                rr_, rb_, h, ns, n, red_first=True,
                block_i=plan["from_zero"],
            )
        else:
            er, eb = ps.rb_smooth_split(
                e2[0], e2[1], rr_, rb_, h, ns, n, red_first=True,
                block_i=plan["smooth"],
            )
        rc = ps.residual_restrict_split(er, eb, rr_, rb_, h, n,
                                        block_i=plan["rr"])
        # gamma visits of the (rect) coarse sub-tree, as cycles_padded
        # (sub-tree revisits below honor cfg.gamma_min_n via _recurse)
        ec = sub_cycle(None, rc, from_zero=True)
        if (n + 1) // 2 >= cfg.gamma_min_n:
            for _ in range(cfg.gamma - 1):
                ec = sub_cycle(ec, rc)
        if ps_split:
            er, eb = ps.prolong_smooth_split(ec, er, eb, rr_, rb_, h, 1,
                                             n, block_i=plan1["ps"])
            er, eb = smooth_passes(er, eb, rr_, rb_, False, n_it=ns - 1)
        else:
            er, eb = ps.prolong_smooth_split(ec, er, eb, rr_, rb_, h, ns,
                                             n, block_i=plan["ps"])
        return (er, eb)

    def body(state):
        u4, r2, nrm, it, f4 = state
        e2 = cycle(None, r2, from_zero=True)
        for _ in range(inner_cycles - 1):  # static unroll
            e2 = cycle(e2, r2)
        hr, hb, lr, lb, r_r, r_b, nrm2 = ps.df_step_split(
            *u4, *e2, *f4, h, n, block_i=plan["step"]
        )
        return ((hr, hb, lr, lb), (r_r, r_b), jnp.sqrt(nrm2), it + 1, f4)

    @jax.jit
    def run(u_hr, u_hb, u_lr, u_lb, f_hr, f_hb, f_lr, f_lb):
        init = jnp.asarray(init_norm, f32)
        tol = jnp.asarray(rel_tol, f32) * init
        r_r, r_b, nrm2 = ps.residual_df_norm_split(
            u_hr, u_hb, u_lr, u_lb, f_hr, f_hb, f_lr, f_lb, h, n,
            block_i=plan["resid"],
        )

        def cond(state):
            return jnp.logical_and(state[2] > tol, state[3] < max_cycles)

        out = jax.lax.while_loop(
            cond, body,
            ((u_hr, u_hb, u_lr, u_lb), (r_r, r_b), jnp.sqrt(nrm2),
             jnp.asarray(0), (f_hr, f_hb, f_lr, f_lb)),
        )
        hr, hb, lr, lb = out[0]
        return hr, hb, lr, lb, out[2], out[3]

    return run


def setup_split_df_problem(problem, hier: Hierarchy):
    """(u_hr, u_hb, u_lr, u_lb, f_hr, f_hb, f_lr, f_lb): the k-trim df
    setup (boundary-eliminated RHS, cycles_padded.setup_df_problem)
    packed into split pairs."""
    u_hi, u_lo, f_hi, f_lo = cp.setup_df_problem(problem, hier, trim=True)
    n = hier.finest_n
    return (*ps.pack_split(u_hi, n), *ps.pack_split(u_lo, n),
            *ps.pack_split(f_hi, n), *ps.pack_split(f_lo, n))


def unsplit_solution(u_hr, u_hb, u_lr, u_lb, problem, hier: Hierarchy):
    """Split df solution -> full (n, n, n) f64 cube with the k-face
    Dirichlet boundaries re-attached (cycles_padded.untrim_solution)."""
    n = hier.finest_n
    u_hi = ps.unpack_split(u_hr, u_hb, n)
    u_lo = ps.unpack_split(u_lr, u_lb, n)
    return cp.untrim_solution(u_hi, u_lo, problem, hier)
