"""Per-level, per-stage timing instrumentation.

TPU-native equivalent of timing_info.h: the same 7-stage-per-level
call-count/wall-time table (stage names from mg_3d.h:136-140), with two
gathering modes:

  * ``TimingInfo`` + ``profile_cycle`` — runs each V-cycle stage as its own
    jitted call with ``block_until_ready`` timing. Accurate per-stage wall
    times, at the cost of un-fusing the cycle (a jitted V-cycle fuses
    stages, so in-line host timers are meaningless there — SURVEY.md §5).
  * ``jax.named_scope`` annotations (in profile_cycle's staged fns) so
    ``jax.profiler.trace`` captures the same structure on-device.
  * ``profile_padded_stages(method="slope")`` — the chain-slope mode
    that resolves the sub-latency production stages through the axon
    tunnel (each stage jit-chained at two repetition counts; the
    per-call cost is the slope, so dispatch latency cancels exactly).
"""

from __future__ import annotations

import time
from typing import Callable, List

import jax
import jax.numpy as jnp

# The reference's stage names, verbatim (mg_3d.h:136-137).
STAGE_NAMES = (
    "Smoother1",
    "CalcResidual1",
    "Restrict Residual",
    "Recurse, Direct Solve",
    "Prolongate&Correct",
    "Smoother2",
    "CalcResidual2",
)


class TimingInfo:
    """Call counts and cumulative wall time per stage (timing_info.h:6-12)."""

    def __init__(self, stage_names=STAGE_NAMES):
        self.stage_names = tuple(stage_names)
        self.num_calls = [0] * len(self.stage_names)
        self.time_taken = [0.0] * len(self.stage_names)

    def reset(self):
        # resetTimingInfo (timing_info.h:34-38)
        self.num_calls = [0] * len(self.stage_names)
        self.time_taken = [0.0] * len(self.stage_names)

    def record(self, stage: int, seconds: float):
        self.num_calls[stage] += 1
        self.time_taken[stage] += seconds

    def table(self) -> str:
        # printTimingInfo layout (timing_info.h:40-47)
        lines = [f"{'Stage':<24}{'numCalls':>10}{'timeTaken(s)':>16}"]
        for name, calls, t in zip(self.stage_names, self.num_calls, self.time_taken):
            lines.append(f"{name:<24}{calls:>10}{t:>16.6f}")
        return "\n".join(lines)

    def __repr__(self):
        return f"TimingInfo({dict(zip(self.stage_names, self.time_taken))})"


def timed_call(info: TimingInfo, stage: int, fn: Callable, *args):
    """Run fn, block on the result, and record wall time for `stage`."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    info.record(stage, time.perf_counter() - t0)
    return out


def profile_padded_stages(hier, cfg, block_i: int = 16, reps: int = 20,
                          jnp_level_max: int | None = None,
                          trim: bool = False, method: str = "call",
                          chains: tuple = (3, 8)):
    """Per-stage wall times for the PADDED Pallas cycle — the path the
    single-chip performance solver actually runs (cycles_padded).

    ``trim=True`` times the k-TRIM layout (the round-3+ headline lane
    widths, pk.padded_shape_trim) — every kernel is shape-driven, so
    this is the same code on 2/3 (257³) / 1/2 (129³) of the lanes.

    ``method``:
      * ``"call"`` — each stage as one jitted call, best-of-``reps``,
        with the measured dispatch+readback latency subtracted. Through
        the axon tunnel that latency is ~24 ms — LARGER than every
        sub-5 ms stage — so call-mode rows at >=129³ read as 0.00.
      * ``"slope"`` — the roofline chain-slope method (round-4 verdict
        item #6): each stage is timed at two jit-chained repetition
        counts ``chains=(c1, c2)`` (both <= ~10 pallas calls per jit,
        the tunnel-compiler limit) and the per-call cost is the slope
        (t(c2) - t(c1)) / (c2 - c1) — dispatch latency cancels exactly,
        so this resolves the production stages the way timing_info.h's
        tables resolve the C stages. Feedback-shaped stages chain by
        feeding their output back; residual+restrict (whose output is
        coarse) uses ``c2`` DISTINCT pre-built fine inputs so no link
        is CSE-collapsed and no extra elementwise pass rides the slope.

    Returns (rows, latency_s): rows of (label, seconds-per-call) for
    each fused stage at each Pallas level plus the whole jnp-path coarse
    subtree and the outer double-float stages.
    """
    import dataclasses

    import jax.numpy as jnp

    from multigrid_parallel_tpu import cycles_padded as cp
    from multigrid_parallel_tpu.ops import pallas3d as pk

    assert method in ("call", "slope"), method
    f32 = jnp.float32
    hier32 = dataclasses.replace(hier, dtype=f32)
    n_top = hier32.sizes[hier32.num_levels - 1]
    lvl_max = cp._JNP_LEVEL_MAX if jnp_level_max is None else jnp_level_max
    shape_of = pk.padded_shape_trim if trim else pk.padded_shape
    c1, c2 = chains
    assert 1 <= c1 < c2, chains

    tiny = jnp.zeros((8, 128), f32)
    lat_fn = jax.jit(lambda t: jnp.sum(t))

    def best(fn):
        float(fn())  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    latency = best(lambda: lat_fn(tiny))

    rows = []

    def add(label, make_chain):
        """make_chain(c) -> zero-arg jitted callable running c chained
        stage repetitions and returning a scalar."""
        if method == "call":
            rows.append((label, max(best(make_chain(1)) - latency, 0.0)))
        else:
            t1 = best(make_chain(c1))
            t2 = best(make_chain(c2))
            rows.append((label, max((t2 - t1) / (c2 - c1), 0.0)))

    key = jax.random.PRNGKey(0)
    for level in range(hier32.num_levels - 1, -1, -1):
        n = hier32.sizes[level]
        if n <= lvl_max:
            # whole remaining subtree runs on the fused-XLA jnp path
            sub = dataclasses.replace(
                hier32, num_levels=level + 1, dtype=f32
            )
            cyc = cp.make_padded_correction_cycle(sub, cfg, lvl_max)
            r = jax.random.normal(key, shape_of(n), f32)

            def mk_sub(c, cyc=cyc, r=r):
                @jax.jit
                def run(x):
                    out = x
                    for _ in range(c):
                        out = cyc(None, out, from_zero=True)
                    return jnp.sum(out[:1])

                return lambda: run(r)

            add(f"L{level} ({n}³) jnp subtree (whole V to coarse)", mk_sub)
            break
        h = hier32.spacing(level)
        shape = shape_of(n)
        e = jax.random.normal(key, shape, f32)
        r = jax.random.normal(jax.random.PRNGKey(1), shape, f32)
        _, sj, sk = shape

        def mk_fz(c, h=h, n=n, r=r):
            @jax.jit
            def run(x):
                out = x
                for _ in range(c):
                    out = pk.rb_smooth_from_zero_fused(
                        out, h, cfg.n_smooth, n, red_first=True,
                        block_i=block_i)
                return jnp.sum(out[:1])

            return lambda: run(r)

        add(f"L{level} ({n}³) smoother (from-zero, {2 * cfg.n_smooth} half)",
            mk_fz)

        def mk_sm(c, h=h, n=n, e=e, r=r):
            @jax.jit
            def run(x, y):
                out = x
                for _ in range(c):
                    out = pk.rb_smooth_fused_pipelined(
                        out, y, h, cfg.n_smooth, n, red_first=False,
                        block_i=block_i)
                return jnp.sum(out[:1])

            return lambda: run(e, r)

        add(f"L{level} ({n}³) smoother (pipelined, {2 * cfg.n_smooth} half)",
            mk_sm)

        bi_rr = pk.rr_fused_block_i(n, sj, sk, 4)
        if bi_rr:
            # coarse output cannot feed back: give every link its own
            # (pre-built, outside the timed region) fine input instead
            es = [e * (1.0 + 0.001 * k) for k in range(c2)]
            jax.block_until_ready(es)

            def mk_rr(c, h=h, n=n, bi_rr=bi_rr, es=es, r=r):
                @jax.jit
                def run(y, *xs):
                    acc = jnp.zeros((), f32)
                    for x in xs:
                        rc = pk.residual_restrict_fused_padded(
                            x, y, h, n, block_i=bi_rr)
                        acc = acc + jnp.sum(rc[:1])
                    return acc

                return lambda: run(r, *es[:c])

            add(f"L{level} ({n}³) residual+restrict fused", mk_rr)

        bi_ps = pk.ps_fused_block_i(n, sj, sk, cfg.n_smooth, 4)
        if bi_ps:
            nc = hier32.sizes[level - 1]
            ec = jax.random.normal(key, shape_of(nc), f32)

            def mk_ps(c, h=h, n=n, bi_ps=bi_ps, ec=ec, e=e, r=r):
                @jax.jit
                def run(z, x, y):
                    out = x
                    for _ in range(c):
                        out = pk.prolong_smooth_fused_padded(
                            z, out, y, h, cfg.n_smooth, n, block_i=bi_ps)
                    return jnp.sum(out[:1])

                return lambda: run(ec, e, r)

            add(f"L{level} ({n}³) prolong+correct+post-smooth fused", mk_ps)

    # outer double-float stages at the finest level (chained links feed
    # the residual back as u_hi — values overflow to inf/nan after a few
    # links, which TPUs process at full speed; only timing matters here)
    h_top = hier32.spacing(hier32.num_levels - 1)
    shape = shape_of(n_top)
    uh = jax.random.normal(key, shape, f32)
    ul = jax.random.normal(jax.random.PRNGKey(2), shape, f32) * 1e-8
    fh = jax.random.normal(jax.random.PRNGKey(3), shape, f32)
    fl = jnp.zeros(shape, f32)

    def mk_dfn(c):
        @jax.jit
        def run(a, b, y, z):
            out = a
            for _ in range(c):
                out = pk.residual_df_norm_fused_padded(
                    out, b, y, z, h_top, n_top)[0]
            return jnp.sum(out[:1])

        return lambda: run(uh, ul, fh, fl)

    add(f"outer ({n_top}³) EFT residual+norm fused", mk_dfn)
    bi_step = pk.df_step_block_i(n_top, shape[1], shape[2])
    if bi_step:
        e = jax.random.normal(jax.random.PRNGKey(4), shape, f32)

        def mk_st(c):
            @jax.jit
            def run(a, b, d, y, z):
                ah, al, ee = a, b, d
                for _ in range(c):
                    ah, al, rr_, _ = pk.df_step_residual_norm_fused(
                        ah, al, ee, y, z, h_top, n_top, block_i=bi_step)
                    ee = rr_
                return jnp.sum(ah[:1])

            return lambda: run(uh, ul, e, fh, fl)

        add(f"outer ({n_top}³) df-add+EFT residual+norm fused", mk_st)

    return rows, latency


def profile_cycle(hier, coarse_solve, cfg, u, f, infos: List[TimingInfo]):
    """One V-cycle with per-level per-stage timing into ``infos`` (one
    TimingInfo per level, coarsest first, like tInfo in mg_3d.h:26).

    The staged functions are jitted separately (cached across calls), so
    this mode measures true per-stage device time at the cost of fusion.
    """
    from multigrid_parallel_tpu.cycles import _ops, _smooth

    ops = _ops(hier.ndim)

    def smooth_fn(level, red_first):
        h = hier.spacing(level)

        @jax.jit
        def fn(u, f):
            with jax.named_scope(f"L{level}/smooth"):
                return _smooth(ops, cfg, u, f, h, red_first)

        return fn

    def resid_fn(level):
        h = hier.spacing(level)
        return jax.jit(lambda u, f: ops.residual(u, f, h))

    def _go(u, f, level):
        info = infos[level]
        if level == 0:
            return timed_call(info, 3, jax.jit(coarse_solve), f)
        u = timed_call(info, 0, smooth_fn(level, True), u, f)
        r = timed_call(info, 1, resid_fn(level), u, f)
        fc = timed_call(info, 2, jax.jit(ops.restrict_full_weighting), r)
        t0 = time.perf_counter()
        ec0 = jnp.zeros((hier.sizes[level - 1],) * hier.ndim, dtype=u.dtype)
        ec = _go(ec0, fc, level - 1)
        infos[level].record(3, time.perf_counter() - t0)
        u = timed_call(info, 4, jax.jit(ops.prolong_correct), ec, u)
        u = timed_call(info, 5, smooth_fn(level, False), u, f)
        h = hier.spacing(level)
        norm = timed_call(info, 6, jax.jit(lambda u, f: ops.residual_norm(u, f, h)), u, f)
        return u if level < hier.num_levels - 1 else (u, norm)

    return _go(u, f, hier.num_levels - 1)
