"""Padded-layout f32 correction cycle built on the Pallas kernels.

The performance path for single-chip solves: the f64 outer defect
iteration (cycles.make_on_device_mixed_solver) keeps its XLA ops, while
the f32 error-correction V-cycle runs entirely in the lane-padded layout
of ops.pallas3d — fused-smoother and fused-residual Pallas kernels plus
separable-matmul transfer operators acting directly on padded arrays, so
no pad/unpad round-trips inside the cycle.

Everything here computes CORRECTIONS (zero-boundary fields): restriction
inputs are residuals (zero boundary) and all level boundaries are pinned
to zero, matching the reference semantics for those inputs
(injection faces of zero = zero, mg_3d.h:879-958; identity boundary rows
x zero RHS, mg_3d.h:185).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_parallel_tpu.cycles import CycleConfig
from multigrid_parallel_tpu.hierarchy import Hierarchy
from multigrid_parallel_tpu.ops import coarse as coarse_ops
from multigrid_parallel_tpu.ops import pallas3d as pk
from multigrid_parallel_tpu.ops import stencils_3d as ops3


def _coarse_k_width(nf: int, skf: int) -> int:
    """Coarse k width matching the fine layout (full vs k-trim) —
    delegates to the single sniff in pallas3d.coarse_k_width."""
    return pk.coarse_k_width(nf, skf)


@functools.lru_cache(maxsize=None)
def _restrict_matrices_np(nf: int, skf: int = 0, skc: int = 0):
    """Padded (SJc/SKc x SJf/SKf) 3-tap restriction matrices for the j and
    k axes; rows outside [1, nc-2] are zero (correction boundaries are
    zero by construction). skf/skc override the k widths (the k-trim
    layout); 0 = full padded widths."""
    nc = (nf + 1) // 2
    _, sjf, _skf = pk.padded_shape(nf)
    _, sjc, _skc = pk.padded_shape(nc)
    skf = skf or _skf
    skc = skc or _skc

    def build(rows, cols):
        s = np.zeros((rows, cols))
        for ic in range(1, nc - 1):
            s[ic, 2 * ic - 1 : 2 * ic + 2] = (0.25, 0.5, 0.25)
        return s

    return build(sjc, sjf), build(skc, skf)


@functools.lru_cache(maxsize=None)
def _prolong_matrices_np(nc: int, skc: int = 0, skf: int = 0):
    """Padded linear-interpolation matrices for the j and k axes. Trim
    layouts pass their k widths; taps into dropped boundary columns
    vanish automatically (the coarse boundary value is zero)."""
    nf = 2 * nc - 1
    _, sjf, _skf = pk.padded_shape(nf)
    _, sjc, _skc = pk.padded_shape(nc)
    skf = skf or _skf
    skc = skc or _skc

    def build(rows, cols):
        p = np.zeros((rows, cols))
        fine = 2 * np.arange(nc)
        ok = fine < rows
        p[fine[ok], np.arange(nc)[ok]] = 1.0
        fo = 2 * np.arange(nc - 1) + 1
        p[fo, np.arange(nc - 1)] = 0.5
        hi = np.arange(nc - 1) + 1
        ok = hi < cols
        p[fo[ok], hi[ok]] = 0.5
        return p

    return build(sjf, sjc), build(skf, skc)


@functools.lru_cache(maxsize=None)
def _restrict_i_matrix_np(nf: int):
    """(nc, nf) 3-tap i-axis restriction matrix (interior rows only)."""
    nc = (nf + 1) // 2
    si = np.zeros((nc, nf), np.float64)
    for ic in range(1, nc - 1):
        si[ic, 2 * ic - 1 : 2 * ic + 2] = (0.25, 0.5, 0.25)
    return si


@functools.lru_cache(maxsize=None)
def _prolong_i_matrix_np(nc: int):
    """(nf, nc) linear-interpolation i-axis matrix."""
    nf = 2 * nc - 1
    pi = np.zeros((nf, nc), np.float64)
    pi[2 * np.arange(nc), np.arange(nc)] = 1.0
    pi[2 * np.arange(nc - 1) + 1, np.arange(nc - 1)] = 0.5
    pi[2 * np.arange(nc - 1) + 1, np.arange(nc - 1) + 1] = 0.5
    return pi


def restrict_padded(r: jnp.ndarray, nf: int) -> jnp.ndarray:
    """(nf, SJf, SKf) residual -> (nc, SJc, SKc) coarse RHS, full
    weighting on the interior, zero boundary (correction semantics).
    The coarse k width follows the input's layout (full or k-trim).

    All three axes are separable 3-tap matmuls on the MXU (measured
    faster than strided plane taps along i, which relayout poorly)."""
    sj, sk = _restrict_matrices_np(nf, r.shape[2],
                                   _coarse_k_width(nf, r.shape[2]))
    sj = jnp.asarray(sj, r.dtype)
    sk = jnp.asarray(sk, r.dtype)
    si = jnp.asarray(_restrict_i_matrix_np(nf), r.dtype)
    t = jnp.einsum("bj,ijk->ibk", sj, r, precision=ops3._HIGHEST)
    t = jnp.einsum("dk,ibk->ibd", sk, t, precision=ops3._HIGHEST)
    return jnp.einsum("ci,ibd->cbd", si, t, precision=ops3._HIGHEST)


def prolong_correct_padded(ec: jnp.ndarray, ef: jnp.ndarray, nc: int) -> jnp.ndarray:
    """ef += trilinear interp of ec, both padded (correction fields).

    The i-axis interleave is also a matmul (measured faster than the
    stack/reshape interleave, which relayouts)."""
    pj, pkm = _prolong_matrices_np(nc, ec.shape[2], ef.shape[2])
    pj = jnp.asarray(pj, ec.dtype)
    pkm = jnp.asarray(pkm, ec.dtype)
    pi = jnp.asarray(_prolong_i_matrix_np(nc), ec.dtype)[: ef.shape[0], : ec.shape[0]]
    t = jnp.einsum("jb,ibc->ijc", pj, ec, precision=ops3._HIGHEST)
    t = jnp.einsum("kc,ijc->ijk", pkm, t, precision=ops3._HIGHEST)
    t = jnp.einsum("fi,ijk->fjk", pi, t, precision=ops3._HIGHEST)
    return ef + t


def _padded_masks(n: int, sj: int, sk: int, color=None):
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, sj, 1), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sk), 2)
    interior = (
        (ii >= 1) & (ii <= n - 2) & (jj >= 1) & (jj <= n - 2)
        & (kk >= 1) & (kk <= n - 2)
    )
    if color is None:
        return interior
    return interior & (((ii + jj + kk) % 2) == color)


def _rb_smooth_padded_jnp(e, r, h, n_iter, n, red_first=True):
    """Masked-roll RB smoother directly on the padded layout — used for
    small levels where Pallas launch overhead exceeds the compute (XLA
    fuses the whole small-level subtree into a few kernels)."""
    h2 = h * h
    sj, sk = e.shape[1], e.shape[2]
    colors = (ops3.RED, ops3.BLACK) if red_first else (ops3.BLACK, ops3.RED)
    masks = {c: _padded_masks(n, sj, sk, c) for c in set(colors)}
    for _ in range(n_iter):
        for c in colors:
            nbr = (
                jnp.roll(e, 1, 0) + jnp.roll(e, -1, 0)
                + jnp.roll(e, 1, 1) + jnp.roll(e, -1, 1)
                + jnp.roll(e, 1, 2) + jnp.roll(e, -1, 2)
            )
            e = jnp.where(masks[c], (nbr - h2 * r) * (1.0 / 6.0), e)
    return e


def _residual_padded_jnp(e, r, h, n):
    inv_h2 = 1.0 / (h * h)
    nbr = (
        jnp.roll(e, 1, 0) + jnp.roll(e, -1, 0)
        + jnp.roll(e, 1, 1) + jnp.roll(e, -1, 1)
        + jnp.roll(e, 1, 2) + jnp.roll(e, -1, 2)
    )
    res = r - inv_h2 * (nbr - 6.0 * e)
    mask = _padded_masks(n, e.shape[1], e.shape[2])
    return jnp.where(mask, res, jnp.zeros_like(res))


_JNP_LEVEL_MAX = 33  # levels at or below this size skip Pallas launches


def _make_descend(
    hier32: Hierarchy,
    cfg: CycleConfig,
    coarse_solve,
    jnp_level_max: int = _JNP_LEVEL_MAX,
    block_i: int = 16,
):
    """Build descend(e_pad, r_pad, level, from_zero) -> e_pad': one
    correction V-cycle from ``level`` down, padded layout end-to-end.
    Levels <= ``jnp_level_max`` use the masked-roll XLA path instead
    (their data fits on-core; Pallas launch overhead dominates there —
    see scripts/bench_suite.py's crossover sweep). Tests inject a small
    ``jnp_level_max`` to force the Pallas kernels at test-sized grids.

    ``cfg.gamma`` > 1 revisits each coarse correction (W-cycle), exactly
    as cycles._descend does — the static unroll grows as gamma^depth."""
    n_smooth = cfg.n_smooth

    def _recurse(descend, rc, level):
        # gamma visits of the coarse level (W-cycle); the coarsest level
        # is always visited once (a direct solve is exact), and the
        # gamma_min_n depth cap skips revisits of sub-levels below it.
        ec = descend(None, rc, level, from_zero=True)
        if level > 0 and hier32.sizes[level] >= cfg.gamma_min_n:
            for _ in range(cfg.gamma - 1):
                ec = descend(ec, rc, level)
        return ec

    def descend(e, r, level, from_zero=False):
        """One correction V-cycle level; e=None with from_zero=True means
        a zero initial guess (no zeros array is materialized)."""
        n = hier32.sizes[level]
        if level == 0:
            x = coarse_solve(pk.unpad3(r, n))
            return pk.pad3(ops3.zero_boundary(x))
        h = hier32.spacing(level)
        if n <= jnp_level_max:
            if from_zero:
                e = jnp.zeros_like(r)  # tiny level: XLA folds this
            e = _rb_smooth_padded_jnp(e, r, h, n_smooth, n, red_first=True)
            rc = restrict_padded(_residual_padded_jnp(e, r, h, n), n)
            ec = _recurse(descend, rc, level - 1)
            e = prolong_correct_padded(ec, e, hier32.sizes[level - 1])
            return _rb_smooth_padded_jnp(e, r, h, n_smooth, n, red_first=False)
        # NOTE: measured FASTER than the fused smooth+residual kernel
        # (rb_smooth_residual_fused_padded): the fusion's larger halo and
        # single-buffered DMA cost more than the saved HBM pass.
        # block_i=16 measured fastest at 257^3 (less trapezoidal-halo
        # redundancy); the planner downgrades it on smaller levels.
        if from_zero:
            e = pk.rb_smooth_from_zero_fused(
                r, h, n_smooth, n, red_first=True, block_i=block_i
            )
        else:
            e = pk.rb_smooth_fused_pipelined(
                e, r, h, n_smooth, n, red_first=True, block_i=block_i
            )
        _, sj, sk = e.shape
        bi_rr = pk.rr_fused_block_i(n, sj, sk, e.dtype.itemsize)
        if bi_rr:
            # one HBM pass: the fine residual never round-trips to HBM
            rc = pk.residual_restrict_fused_padded(e, r, h, n, block_i=bi_rr)
        else:
            res = pk.residual_fused_pipelined(e, r, h, n)
            rc = restrict_padded(res, n)
        nc = hier32.sizes[level - 1]
        ec = _recurse(descend, rc, level - 1)
        bi_ps = pk.ps_fused_block_i(n, sj, sk, n_smooth, e.dtype.itemsize)
        bi_ps1 = pk.ps_fused_block_i(n, sj, sk, 1, e.dtype.itemsize) \
            if (not bi_ps and n_smooth > 1) else 0
        if bi_ps:
            # one HBM pass: interpolate+correct+post-smooth fused
            e = pk.prolong_smooth_fused_padded(
                ec, e, r, h, n_smooth, n, block_i=bi_ps
            )
        elif bi_ps1 >= 4:
            # split post-smooth (the 513-trim level): fuse
            # interpolate+correct+ONE black-first iteration, then
            # n_smooth-1 single-iteration passes — identical half-sweep
            # sequence, bigger blocks than the full fusion window allows
            e = pk.prolong_smooth_fused_padded(ec, e, r, h, 1, n,
                                               block_i=bi_ps1)
            for _ in range(n_smooth - 1):
                e = pk.rb_smooth_fused_pipelined(
                    e, r, h, 1, n, red_first=False, block_i=block_i
                )
        else:
            e = prolong_correct_padded(ec, e, nc)
            e = pk.rb_smooth_fused_pipelined(
                e, r, h, n_smooth, n, red_first=False, block_i=block_i
            )
        return e

    return descend


def make_padded_correction_cycle(
    hier32: Hierarchy, cfg: CycleConfig, jnp_level_max: int = _JNP_LEVEL_MAX,
    block_i: int = 16,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build cycle(e_pad, r_pad) -> e_pad': one V-cycle on the correction
    equation A e = r at the finest level (both padded f32), Pallas
    smoother/residual + padded matmul transfers; coarse direct solve."""
    coarse_solve = coarse_ops.make_coarse_solver(
        hier32.coarse_n, hier32.spacing(0), 3, hier32.dtype, cfg.coarse_method
    )
    descend = _make_descend(hier32, cfg, coarse_solve, jnp_level_max, block_i)
    level = hier32.num_levels - 1

    def cycle(e, r, from_zero=False):
        return descend(e, r, level, from_zero=from_zero)

    return cycle


def make_padded_fmg_bootstrap(
    hier32: Hierarchy, cfg: CycleConfig, jnp_level_max: int = _JNP_LEVEL_MAX,
    block_i: int = 16,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build bootstrap(r_pad) -> e_pad: a full-multigrid pass on the
    CORRECTION equation A e = r, entirely in the padded f32 layout.

    TPU-first recast of SolverFMGInitialize (/root/reference/
    mg_dirichlet_analytic.c:771-806): the reference runs FMG on the full
    solution u (prolong up, re-impose BCs per level, one V-cycle). For a
    linear problem that is exactly u0 + FMG on the defect equation
    r = f - A u0, whose fields have ZERO boundaries — so the padded
    correction kernels apply unchanged and no per-level BC re-imposition
    pass is needed. Coarser RHS are full-weighting restrictions of r
    (the reference re-evaluates per level; see cycles.fmg_initialize for
    the documented deviation)."""
    coarse_solve = coarse_ops.make_coarse_solver(
        hier32.coarse_n, hier32.spacing(0), 3, hier32.dtype, cfg.coarse_method
    )
    descend = _make_descend(hier32, cfg, coarse_solve, jnp_level_max, block_i)
    top = hier32.num_levels - 1

    def bootstrap(r):
        rs = [r]  # finest first
        for level in range(top, 0, -1):
            rs.append(restrict_padded(rs[-1], hier32.sizes[level]))
        rs.reverse()  # coarsest first
        e = pk.pad3(
            ops3.zero_boundary(coarse_solve(pk.unpad3(rs[0], hier32.sizes[0])))
        )
        for level in range(1, hier32.num_levels):
            nc = hier32.sizes[level - 1]
            ef = prolong_correct_padded(e, jnp.zeros_like(rs[level]), nc)
            e = descend(ef, rs[level], level)
        return e

    return bootstrap


def make_on_device_df_solver(
    hier: Hierarchy,
    cfg: CycleConfig = CycleConfig(),
    rel_tol: float = 1e-8,
    max_cycles: int = 40,
    inner_cycles: int = 4,
    jnp_level_max: int = _JNP_LEVEL_MAX,
    use_fmg: bool = False,
    block_i: int = 16,
    trim: bool = False,
    init_norm: float = None,
):
    """run(u_hi, u_lo, f_hi, f_lo) -> (u_hi, u_lo, norm, n_outer):
    the all-f32 performance solver. The f64 state of the mixed solver is
    replaced by a DOUBLE-FLOAT (two-f32) solution, and the outer defect
    residual is the compensated EFT kernel (ops.pallas3d.
    residual_df_fused_padded) — no emulated-f64 ops anywhere, ~1e-14
    effective residual accuracy (exactness levers: h = 2^-k, 6u = 4u+2u).

    All arrays live in the padded layout for the whole solve; callers
    use setup_df_problem / pallas3d.unpad3+df_to_f64 to convert.

    ``use_fmg``: bootstrap with a full-multigrid pass on the initial
    defect (make_padded_fmg_bootstrap) before the while_loop — the
    performance-path analogue of the reference's FMG + V-cycles driver
    (mg_dirichlet_analytic.c:984-1001). The bootstrap is not counted in
    n_outer (the reference reports FMG separately).

    ``trim``: expect k-TRIM layout inputs (pk.padded_shape_trim — see
    setup_df_problem(trim=True)): 2/3 the lanes at 257³, 1/2 at 129³.
    ``init_norm``: the reference's ||f||-whole-cube convergence constant
    (test_mg_3d.c:40). REQUIRED with trim (the folded f̃ carries the
    k-face Dirichlet values / h², so ||f̃|| is not the convention);
    defaults to ||f_hi|| computed in-graph otherwise.
    """
    import sys

    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    inner = make_padded_correction_cycle(hier32, cfg, jnp_level_max, block_i)
    fmg = (
        make_padded_fmg_bootstrap(hier32, cfg, jnp_level_max, block_i)
        if use_fmg else None
    )
    level = hier.num_levels - 1
    n = hier.sizes[level]
    h = hier.spacing(level)

    if trim and init_norm is None:
        raise ValueError("trim layout needs the reference-convention "
                         "init_norm (||f|| before the boundary fold)")

    def residual(u_hi, u_lo, f_hi, f_lo):
        # fused EFT residual + ||r||^2 (one HBM pass)
        r, nrm2 = pk.residual_df_norm_fused_padded(u_hi, u_lo, f_hi, f_lo, h, n)
        return r, jnp.sqrt(nrm2)

    shape_fn = pk.padded_shape_trim if trim else pk.padded_shape
    _, sj_f, sk_f = shape_fn(n)
    bi_step = pk.df_step_block_i(n, sj_f, sk_f)

    def body(state):
        u_hi, u_lo, r, nrm, it, f_hi, f_lo = state
        # The V-cycle is linear in r, and f32 relative precision is
        # scale-invariant, so no normalize/scale-back passes are needed
        # (unlike the f64-outer mixed solver, this range cannot overflow).
        e = inner(None, r, from_zero=True)
        for _ in range(inner_cycles - 1):  # static unroll
            e = inner(e, r)
        if bi_step:
            # fused df_add + EFT residual + norm (one pass)
            u_hi, u_lo, r, nrm2 = pk.df_step_residual_norm_fused(
                u_hi, u_lo, e, f_hi, f_lo, h, n, block_i=bi_step
            )
            nrm = jnp.sqrt(nrm2)
        else:
            u_hi, u_lo = pk.df_add(u_hi, u_lo, e)
            r, nrm = residual(u_hi, u_lo, f_hi, f_lo)
        return u_hi, u_lo, r, nrm, it + 1, f_hi, f_lo

    @jax.jit
    def run(u_hi, u_lo, f_hi, f_lo):
        if init_norm is not None:
            init = jnp.asarray(init_norm, jnp.float32)
        else:
            init = jnp.sqrt(jnp.sum(f_hi * f_hi))
        tol = jnp.asarray(rel_tol, jnp.float32) * init

        def cond(state):
            nrm, it = state[3], state[4]
            return jnp.logical_and(nrm > tol, it < max_cycles)

        r0, n0 = residual(u_hi, u_lo, f_hi, f_lo)
        if fmg is not None:
            e = fmg(r0)
            u_hi, u_lo = pk.df_add(u_hi, u_lo, e)
            r0, n0 = residual(u_hi, u_lo, f_hi, f_lo)
        out = jax.lax.while_loop(
            cond, body, (u_hi, u_lo, r0, n0, jnp.asarray(0), f_hi, f_lo)
        )
        return out[0], out[1], out[3], out[4]

    return run


def setup_df_problem(problem, hier: Hierarchy, trim: bool = False):
    """(u_hi, u_lo, f_hi, f_lo) padded double-float setup (reference
    semantics, see cycles.setup_problem).

    ``trim=True`` produces the k-TRIM layout (pk.padded_shape_trim):
    the k-face Dirichlet values are FOLDED into the RHS (the standard
    boundary elimination: f̃[..., 1] -= u_bc[..., 0]/h², f̃[..., n-2] -=
    u_bc[..., n-1]/h²), the stored k=0 column is zeroed (so lane rolls
    wrap onto exact zeros) and lane k = n-1 is dropped. Residuals and
    the converged interior are IDENTICAL to the full layout; recover
    the full solution with untrim_solution. Pair with
    make_on_device_df_solver(trim=True, init_norm=ref_init_norm(...))."""
    from multigrid_parallel_tpu.cycles import setup_problem

    u64, f64 = setup_problem(problem, hier)
    if not trim:
        u_hi, u_lo = pk.df_split(u64, pad=True)
        f_hi, f_lo = pk.df_split(f64, pad=True)
        return u_hi, u_lo, f_hi, f_lo

    n = hier.finest_n
    h = hier.spacing(hier.num_levels - 1)
    inv_h2 = 1.0 / (h * h)
    f64 = f64.at[1:-1, 1:-1, 1].add(-inv_h2 * u64[1:-1, 1:-1, 0])
    f64 = f64.at[1:-1, 1:-1, n - 2].add(-inv_h2 * u64[1:-1, 1:-1, n - 1])
    u64 = u64.at[:, :, 0].set(0.0)

    _, sj, skt = pk.padded_shape_trim(n)

    def prep(x64):
        x = x64[:, :, : n - 1]
        x = jnp.pad(x, ((0, 0), (0, sj - n), (0, skt - (n - 1))))
        return pk.df_split(x)

    u_hi, u_lo = prep(u64)
    f_hi, f_lo = prep(f64)
    return u_hi, u_lo, f_hi, f_lo


def ref_init_norm(problem, hier: Hierarchy) -> float:
    """||f||_2 over the WHOLE finest cube, boundary Dirichlet values
    included — the reference's initial-residual convention
    (mg_3d.h:1430-1433), computed BEFORE any trim fold."""
    from multigrid_parallel_tpu.cycles import setup_problem

    _, f64 = setup_problem(problem, hier)
    return float(jnp.sqrt(jnp.sum(f64 * f64)))


def untrim_solution(u_hi, u_lo, problem, hier: Hierarchy):
    """Trim-layout df solution -> full (n, n, n) f64 cube with the
    k-face Dirichlet boundaries re-attached."""
    from multigrid_parallel_tpu.cycles import setup_problem
    from multigrid_parallel_tpu.hierarchy import evaluate_on_grid

    n = hier.finest_n
    u64 = pk.df_to_f64(u_hi, u_lo)[:, :n, : n - 1]
    bc = evaluate_on_grid(problem.bc, hier, hier.num_levels - 1)
    u = jnp.concatenate([u64, bc[:, :, n - 1 :]], axis=2)
    return u.at[:, :, 0].set(bc[:, :, 0])


def make_on_device_mixed_solver_pallas(
    hier: Hierarchy,
    cfg: CycleConfig = CycleConfig(),
    rel_tol: float = 1e-8,
    max_cycles: int = 40,
    inner_cycles: int = 2,
):
    """run(u0, f) -> (u, norm, n_outer): mixed-precision solve where each
    f64 defect-correction step runs ``inner_cycles`` consecutive f32
    V-cycles on the (rescaled) defect system before the f64 update —
    amortizing the expensive emulated-f64 residual pass over several
    cheap Pallas f32 cycles. Convergence criterion matches
    test_mg_3d.c:40 (interior residual vs ||f||_2 whole-cube).
    """
    import sys

    # Deep hierarchies trace a long op chain (unrolled levels x unrolled
    # sweeps x Pallas kernels) — the default Python recursion limit is
    # too small for the tracer at 7 levels.
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    inner = make_padded_correction_cycle(hier32, cfg)
    level = hier.num_levels - 1
    n = hier.sizes[level]
    h = hier.spacing(level)

    def body(state):
        u, r, nrm, it, f = state
        safe = jnp.maximum(nrm, jnp.asarray(1e-300, dtype=u.dtype))
        r32 = pk.pad3((r / safe).astype(f32))
        e = inner(None, r32, from_zero=True)
        for _ in range(inner_cycles - 1):  # static unroll
            e = inner(e, r32)
        u = u + safe * pk.unpad3(e, n).astype(u.dtype)
        r = ops3.residual(u, f, h)
        nrm = jnp.sqrt(jnp.sum(r * r))
        return u, r, nrm, it + 1, f

    @jax.jit
    def run(u0, f):
        init = jnp.sqrt(jnp.sum(f * f))
        tol = rel_tol * init

        def cond(state):
            _, _, nrm, it, _ = state
            return jnp.logical_and(nrm > tol, it < max_cycles)

        r0 = ops3.residual(u0, f, h)
        n0 = jnp.sqrt(jnp.sum(r0 * r0))
        u, _, nrm, it, _ = jax.lax.while_loop(
            cond, body, (u0, r0, n0, jnp.asarray(0), f)
        )
        return u, nrm, it

    return run
