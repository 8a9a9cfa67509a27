"""Poisson problem definitions.

Sign convention (matches the reference throughout): we solve

    lap(u) = f      on the interior,
    u = g           on the boundary (Dirichlet),

with the 2nd-order central 7-point (3D) / 3-point (1D) stencil. The
reference smoother update ``v[p] = (sum of neighbors - h^2 f[p]) / 6``
(mg_3d.h:438-443) and residual ``f - (1/h^2)(sum - 6 v)`` (mg_3d.h:819-821)
are both written for this convention.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Problem:
    """A PDE problem on [0, length]^ndim with uniform grids.

    Attributes:
      ndim: 1 or 3.
      length: physical domain side (the reference's compile-time
        ``GRID_LENGTH``, test_mg_3d.c:4).
      bc: boundary-value function, called with ``ndim`` coordinate arrays
        (broadcastable), returns boundary values g.
      rhs: forcing function f (same calling convention).
      analytic: exact solution if known (the validation oracle used by
        every reference driver, e.g. test_mg_3d.c:79-97); None otherwise.
      name: short identifier.
    """

    ndim: int
    length: float
    bc: Callable[..., jnp.ndarray]
    rhs: Callable[..., jnp.ndarray]
    analytic: Optional[Callable[..., jnp.ndarray]] = None
    name: str = "problem"


def _quadratic(x, y, z):
    # Reference BCFunc: u(x,y,z) = x^2 - 2 y^2 + z^2 (mg_3d.h:89-90).
    # Harmonic (lap u = 0) and quadratic, so the 7-point stencil is exact:
    # the discrete solution equals the analytic one to solver tolerance.
    return x * x - 2.0 * y * y + z * z


def poisson_3d_quadratic(length: float = 1.0) -> Problem:
    """The reference's main 3D test problem (mg_3d.h:89-94, f == 0)."""
    return Problem(
        ndim=3,
        length=length,
        bc=_quadratic,
        rhs=lambda x, y, z: jnp.zeros(jnp.broadcast_shapes(x.shape, y.shape, z.shape)),
        analytic=_quadratic,
        name="poisson3d_quadratic",
    )


def poisson_3d_trig(length: float = 1.0) -> Problem:
    """A non-trivial-RHS 3D problem for O(h^2) convergence studies.

    u = sin(pi x) sin(pi y) sin(pi z), f = lap u = -3 pi^2 u. Unlike the
    quadratic problem this has genuine discretization error, exercising
    the f != 0 path (one of the commented-out reference variants,
    mg_3d.h:91-101, used rhsFunc this way).
    """

    def u(x, y, z):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.sin(jnp.pi * z)

    def f(x, y, z):
        return -3.0 * (math.pi**2) * u(x, y, z)

    return Problem(ndim=3, length=length, bc=u, rhs=f, analytic=u, name="poisson3d_trig")


def poisson_1d_cos(length: float = 1.0) -> Problem:
    """The 1D reference problem: u'' = cos(x) on [0, 1] (mg_1d.c:151-152).

    Analytic solution -cos(x) + x (cos(1) - 1) + 1, which is 0 at both
    endpoints (homogeneous Dirichlet, mg_1d.c:186-192).
    """

    def analytic(x):
        return -jnp.cos(x) + x * (math.cos(1.0) - 1.0) + 1.0

    return Problem(
        ndim=1,
        length=length,
        bc=analytic,
        rhs=jnp.cos,
        analytic=analytic,
        name="poisson1d_cos",
    )
