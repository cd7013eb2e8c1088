"""AEAM tabulated-spline machinery.

Reproduces PairAEAM::interpolate (pair_aeam.cpp:915-942) exactly in float64:
a 7-coefficient cubic-Hermite representation per knot where

  spline[m][6] = f(m)                       (table value)
  spline[m][5] = 4th-order finite-difference derivative (interior),
                 one-sided at the ends
  spline[m][4], spline[m][3] = Hermite cubic coefficients
  spline[m][0..2] = derivative-polynomial coefficients / delta

Lookup (pair_aeam.cpp:196-203): p = r/dr + 1; m = int(p) clamped; p -= m;
value  = ((c3*p + c4)*p + c5)*p + c6
deriv  =  (c0*p + c1)*p + c2
The derivative rows are exactly d(value)/dr of the cubic, so JAX autodiff of
the value lookup reproduces the reference's derivative path to rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_spline(f: np.ndarray, n: int, delta: float) -> np.ndarray:
    """Build [n+1, 7] coefficients from a 1-indexed table f[1..n].

    Mirrors pair_aeam.cpp:915-942 line-for-line in semantics (not code):
    row 0 is unused padding to keep LAMMPS's 1-based index arithmetic.
    """
    s = np.zeros((n + 1, 7), dtype=np.float64)
    s[1:, 6] = f[1:n + 1]

    s[1, 5] = s[2, 6] - s[1, 6]
    s[2, 5] = 0.5 * (s[3, 6] - s[1, 6])
    s[n - 1, 5] = 0.5 * (s[n, 6] - s[n - 2, 6])
    s[n, 5] = s[n, 6] - s[n - 1, 6]

    m = np.arange(3, n - 1)
    s[m, 5] = ((s[m - 2, 6] - s[m + 2, 6])
               + 8.0 * (s[m + 1, 6] - s[m - 1, 6])) / 12.0

    m = np.arange(1, n)
    s[m, 4] = 3.0 * (s[m + 1, 6] - s[m, 6]) - 2.0 * s[m, 5] - s[m + 1, 5]
    s[m, 3] = s[m, 5] + s[m + 1, 5] - 2.0 * (s[m + 1, 6] - s[m, 6])
    s[n, 4] = 0.0
    s[n, 3] = 0.0

    s[1:, 2] = s[1:, 5] / delta
    s[1:, 1] = 2.0 * s[1:, 4] / delta
    s[1:, 0] = 3.0 * s[1:, 3] / delta
    return s


def spline_lookup(splines: jnp.ndarray, table_idx: jnp.ndarray,
                  p_raw: jnp.ndarray, nknots: jnp.ndarray,
                  lower_clamp: bool = False):
    """Vectorized tabulated-cubic evaluation.

    Args:
      splines: [T, nmax+1, 7] stacked coefficient tables.
      table_idx: integer array selecting the table per evaluation point.
      p_raw: r/dr + 1 (or rho^n/drho + 1) per point.
      nknots: per-table knot count n (int array [T]).
      lower_clamp: also clamp m >= 1 (frho path, pair_aeam.cpp:286).

    Returns the interpolated value; autodiff gives the reference derivative.
    """
    n = nknots[table_idx]
    m = jnp.floor(p_raw).astype(jnp.int32)
    m = jnp.minimum(m, n - 1)
    if lower_clamp:
        m = jnp.maximum(m, 1)
    p = p_raw - m.astype(p_raw.dtype)
    # Straight-through clamp: value uses min(p, 1) like the reference, but
    # the gradient stays d(cubic)/dp evaluated at the clamped point — which
    # is exactly the derivative the reference computes from coeff[0..2] at
    # p = 1 (pair_aeam.cpp:201,290).
    p = p + jax.lax.stop_gradient(jnp.minimum(p, 1.0) - p)
    c = splines[table_idx, m]             # [..., 7]
    return ((c[..., 3] * p + c[..., 4]) * p + c[..., 5]) * p + c[..., 6]
