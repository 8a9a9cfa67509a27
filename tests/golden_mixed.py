"""Loop-level numpy transliteration of mg_3d_bkup.c:51-174.

The C-parity oracle for the mixed-BC (electrospray) smoother: sequential
lexicographic Gauss-Seidel with the Neumann copies applied IN-SWEEP,
immediately after each interior point update (mg_3d_bkup.c:84-133), and
the h^2-scaled residual (mg_3d_bkup.c:141-174). Same role golden3d.py
plays for the Dirichlet kernels.
"""

import numpy as np

# mg_3d_bkup.c:12-18
GRID_LENGTH = 3e-4
CAPILLARY_RADIUS = 1.326e-5
EXTRACTOR_INNER_RADIUS = 1e-4
EXTRACTOR_OUTER_RADIUS = 1.4e-4


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
