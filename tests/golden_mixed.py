"""Loop-level numpy transliteration of mg_3d_bkup.c.

The C-parity oracle for the mixed-BC (electrospray) program: the
sequential lexicographic Gauss-Seidel smoother with IN-SWEEP Neumann
copies (mg_3d_bkup.c:84-133), the h^2-scaled residual (141-174), the
injection-faces + 27-point restriction (176-323), trilinear
prolongation (325-467), the unscaled coarse matrix + LU (470-512), the
recursive ``multigrid_method`` (515-589) and the ``main`` convergence
loop (831-883). Same role golden3d.py plays for the Dirichlet kernels.

Two reference quirks are reproduced under ``faithful=True``:

  * **The h^2-scaling bug**: ``calculateResidual`` returns the
    h^2-SCALED defect (diff = h^2 d - (sum_nbr - 6v), line 160), which
    is restricted directly into the coarse RHS, and the coarse smoother
    multiplies it by ANOTHER h_c^2 (line 74 of GaussSeidelSmoother). The
    coarse correction therefore comes out a factor h^2 ~ 1e-10 too
    small — effectively ZERO at this problem's physical scale
    (GRID_LENGTH = 3e-4 m) — and the program converges at the pure
    lexicographic-smoothing rate, not the multigrid rate. (The cleaned-
    up Dirichlet solver mg_3d.h:794-842 divides by h^2 and does not
    have the bug; this is presumably why mg_3d_bkup.c is the "bkup".)
  * **Warm-started corrections**: ``multigrid_method`` never zeroes
    u[q-1] (unlike mg_3d.h:1254-1260), so each cycle's coarse solve
    starts from the previous cycle's correction values.

``faithful=False`` fixes the scaling (restricted RHS divided by the
fine h^2, coarsest LU right-hand side multiplied by h_0^2), turning the
scheme into a standard correction multigrid; tests use it to show the
quirk is the difference between smoothing-rate and multigrid-rate
convergence.
"""

import numpy as np

# mg_3d_bkup.c:12-18
GRID_LENGTH = 3e-4
CAPILLARY_RADIUS = 1.326e-5
EXTRACTOR_INNER_RADIUS = 1e-4
EXTRACTOR_OUTER_RADIUS = 1.4e-4
CAPILLARY_VOLTAGE = 0.0
EXTRACTOR_VOLTAGE = -1350.0


def gauss_seidel_smoother(v, d, h, smoother_iter):
    """mg_3d_bkup.c:51-139. Mutates and returns ``v`` (numpy, (n,n,n))."""
    n = v.shape[0]
    hsq = h * h
    inv = 1.0 / 6.0
    cy = cz = GRID_LENGTH / 2.0
    for _s in range(smoother_iter):
        for i in range(1, n - 1):
            for j in range(1, n - 1):
                for k in range(1, n - 1):
                    v[i, j, k] = inv * (
                        v[i - 1, j, k] + v[i + 1, j, k]
                        + v[i, j - 1, k] + v[i, j + 1, k]
                        + v[i, j, k - 1] + v[i, j, k + 1]
                        - hsq * d[i, j, k]
                    )
                    # in-sweep Neumann copies (mg_3d_bkup.c:84-133)
                    if i == 1 or i == n - 2:
                        ty = j * h - cy
                        tz = k * h - cz
                        rr = ty * ty + tz * tz
                        if i == 1:
                            if rr > CAPILLARY_RADIUS**2:
                                v[0, j, k] = v[1, j, k]
                        else:
                            if (
                                rr <= EXTRACTOR_INNER_RADIUS**2
                                or rr >= EXTRACTOR_OUTER_RADIUS**2
                            ):
                                v[n - 1, j, k] = v[i, j, k]
                    if j == 1:
                        v[i, 0, k] = v[i, j, k]
                    elif j == n - 2:
                        v[i, n - 1, k] = v[i, j, k]
                    if k == 1:
                        v[i, j, 0] = v[i, j, k]
                    elif k == n - 2:
                        v[i, j, n - 1] = v[i, j, k]
    return v


def calculate_residual(v, d, h):
    """mg_3d_bkup.c:141-174: h^2-scaled residual over the interior.

    Returns (sum_of_squares, res) with res zero on the boundary.
    """
    n = v.shape[0]
    hsq = h * h
    res = np.zeros_like(v)
    ret = 0.0
    for i in range(1, n - 1):
        for j in range(1, n - 1):
            for k in range(1, n - 1):
                diff = hsq * d[i, j, k] - (
                    v[i - 1, j, k] + v[i + 1, j, k]
                    + v[i, j - 1, k] + v[i, j + 1, k]
                    + v[i, j, k - 1] + v[i, j, k + 1]
                    - 6.0 * v[i, j, k]
                )
                res[i, j, k] = diff
                ret += diff * diff
    return ret, res


def restrict_residual_bkup(r, nc):
    """mg_3d_bkup.c:176-323: boundary faces by injection (coincident
    fine point), interior by the 27-point full-weighting stencil.
    Later faces overwrite earlier ones (X, then Y, then Z)."""
    nf = r.shape[0]
    d = np.zeros((nc, nc, nc), dtype=r.dtype)
    # X faces (212-231)
    d[0, :, :] = r[0, ::2, ::2]
    d[nc - 1, :, :] = r[2 * (nc - 1), ::2, ::2]
    # Y faces (234-253)
    d[:, 0, :] = r[::2, 0, ::2]
    d[:, nc - 1, :] = r[::2, 2 * (nc - 1), ::2]
    # Z faces (256-281)
    d[:, :, 0] = r[::2, ::2, 0]
    d[:, :, nc - 1] = r[::2, ::2, 2 * (nc - 1)]
    # interior 27-point (284-321)
    # separable [1/4, 1/2, 1/4]^3: center 1/8, faces 1/16, edges 1/32,
    # corners 1/64 — exactly the C table (mg_3d_bkup.c:183-204)
    w1d = np.array([0.25, 0.5, 0.25])
    w = w1d[:, None, None] * w1d[None, :, None] * w1d[None, None, :]
    for i in range(1, nc - 1):
        for j in range(1, nc - 1):
            for k in range(1, nc - 1):
                cube = r[2 * i - 1 : 2 * i + 2,
                         2 * j - 1 : 2 * j + 2,
                         2 * k - 1 : 2 * k + 2]
                d[i, j, k] = np.sum(cube * w)
    return d


def prolongate_and_correct_bkup(ec, ef):
    """mg_3d_bkup.c:325-467: trilinear interpolation-add over the WHOLE
    fine grid (boundary included)."""
    nf = ef.shape[0]
    for i in range(nf):
        for j in range(nf):
            for k in range(nf):
                oi, oj, ok = i % 2, j % 2, k % 2
                val = 0.0
                cnt = 0
                for di in range(oi + 1):
                    for dj in range(oj + 1):
                        for dk in range(ok + 1):
                            val += ec[(i - oi) // 2 + di,
                                      (j - oj) // 2 + dj,
                                      (k - ok) // 2 + dk]
                            cnt += 1
                ef[i, j, k] += val / cnt
    return ef


def construct_coarse_matrix_bkup(n):
    """mg_3d_bkup.c:470-512: identity boundary rows; interior rows the
    UNSCALED stencil (+1 neighbors, -6 diagonal — no 1/h^2)."""
    nn = n * n
    total = n**3
    a = np.zeros((total, total))
    for i in range(n):
        for j in range(n):
            for k in range(n):
                p = nn * i + n * j + k
                if i in (0, n - 1) or j in (0, n - 1) or k in (0, n - 1):
                    a[p, p] = 1.0
                else:
                    a[p, p] = -6.0
                    for off in (nn, -nn, n, -n, 1, -1):
                        a[p, p + off] = 1.0
    return a


def setup_boundary_conditions_bkup(v, h):
    """mg_3d_bkup.c:739-828: capillary disk on X=0, extractor annulus on
    X=END; Y/Z faces zeroed (the smoother's Neumann copies take over
    from the first sweep)."""
    n = v.shape[0]
    cy = cz = GRID_LENGTH / 2.0
    ax = np.arange(n) * h
    ty = (ax - cy)[:, None]
    tz = (ax - cz)[None, :]
    rr = ty * ty + tz * tz
    v[0][rr <= CAPILLARY_RADIUS**2] = CAPILLARY_VOLTAGE
    v[n - 1][(rr > EXTRACTOR_INNER_RADIUS**2)
             & (rr < EXTRACTOR_OUTER_RADIUS**2)] = EXTRACTOR_VOLTAGE
    v[:, 0, :] = 0.0
    v[:, n - 1, :] = 0.0
    v[:, :, 0] = 0.0
    v[:, :, n - 1] = 0.0
    return v


def multigrid_method_bkup(u, f, q, smoother_iter, n, lu_pieces, h_levels,
                          faithful=True):
    """mg_3d_bkup.c:515-589. Returns the squared residual norm after the
    post-smoother. ``u[q-1]`` is NOT zeroed (warm-started corrections —
    the reference has no memset, unlike mg_3d.h:1254-1260)."""
    import scipy.linalg

    h = h_levels[q]
    if q == 0:
        rhs = f[0].reshape(-1).copy()
        if not faithful:
            # standard correction scheme: the unscaled matrix is h^2 L,
            # so the RHS must carry h_0^2
            rhs = rhs * (h * h)
        u[0][...] = scipy.linalg.lu_solve(lu_pieces, rhs).reshape(u[0].shape)
        return 0.0

    v, d = u[q], f[q]
    gauss_seidel_smoother(v, d, h, smoother_iter)
    _, r = calculate_residual(v, d, h)
    nc = (n + 1) // 2
    fc = restrict_residual_bkup(r, nc)
    if not faithful:
        fc = fc / (h * h)  # undo the h^2 scaling of the restricted defect
    f[q - 1][...] = fc
    multigrid_method_bkup(u, f, q - 1, smoother_iter, nc, lu_pieces,
                          h_levels, faithful)
    prolongate_and_correct_bkup(u[q - 1], v)
    gauss_seidel_smoother(v, d, h, smoother_iter)
    ret, _ = calculate_residual(v, d, h)
    return ret


def solve_bkup(coarse_n, num_levels, gs_iters, tolerance=1e-6,
               max_cycles=30, faithful=True):
    """mg_3d_bkup.c:831-883 main(): full convergence loop. Returns
    (u_finest, [squared norms per cycle], init_squared_norm).

    The reference's criterion is ``norm >= initResidual * tolerance^2``
    on SQUARED norms — i.e. relative residual <= tolerance. max_cycles
    bounds the loop (the reference has no bound; in faithful mode the
    null coarse correction makes 1e-6 unreachable in test-sized time).
    """
    import scipy.linalg

    nf = (coarse_n - 1) * (1 << (num_levels - 1)) + 1
    h_levels = [GRID_LENGTH / ((coarse_n - 1) * (1 << lvl))
                for lvl in range(num_levels)]
    u = [np.zeros((((coarse_n - 1) << lvl) + 1,) * 3) for lvl in range(num_levels)]
    f = [np.zeros_like(x) for x in u]
    a = construct_coarse_matrix_bkup(coarse_n)
    lu_pieces = scipy.linalg.lu_factor(a)

    h = h_levels[num_levels - 1]
    setup_boundary_conditions_bkup(u[num_levels - 1], h)
    init, _ = calculate_residual(u[num_levels - 1], f[num_levels - 1], h)
    cmp_norm = init * tolerance * tolerance
    norms = []
    norm = 1e300
    while norm >= cmp_norm and len(norms) < max_cycles:
        norm = multigrid_method_bkup(u, f, num_levels - 1, gs_iters, nf,
                                     lu_pieces, h_levels, faithful)
        norms.append(norm)
    return u[num_levels - 1], norms, init
