"""Polynomial smoother coefficients.

Reference parity: pyamg/relaxation/chebyshev.py
(``chebyshev_polynomial_coefficients`` :12, ``mls_polynomial_coefficients``
:59).  Same contract: coefficients in descending order of the polynomial
C(t) with C(0)=1 minimizing max|C| on [a,b].
"""

from __future__ import annotations

import numpy as np

__all__ = ["chebyshev_polynomial_coefficients", "mls_polynomial_coefficients"]


def chebyshev_polynomial_coefficients(a, b, degree):
    """Coefficients (descending) of the degree-``degree`` Chebyshev
    polynomial on [a, b] normalized so C(0) = 1.

    Examples
    --------
    >>> np.round(chebyshev_polynomial_coefficients(1.0, 2.0, 3), 8)
    array([-0.32323232,  1.45454545, -2.12121212,  1.        ])
    """
    if a >= b or a <= 0:
        raise ValueError(f"invalid interval [{a},{b}]")
    # roots of T_degree mapped from [-1,1] to [a,b]
    std_roots = np.cos(np.pi * (np.arange(degree) + 0.5) / degree)
    roots = 0.5 * (b - a) * (1 + std_roots) + a
    poly = np.poly(roots)
    poly /= np.polyval(poly, 0)
    return poly


def mls_polynomial_coefficients(rho, degree):
    """MLS (multilevel smoother) polynomial coefficients after Adams,
    Brezina, Hu & Tuminaro (J. Comp. Phys. 188, 2003).

    Returns (coeffs descending for the smoother, roots of the prolongation
    smoother polynomial).
    """
    roots = rho / 2.0 * (
        1.0 - np.cos(2 * np.pi * (np.arange(degree, dtype=float) + 1)
                     / (2.0 * degree + 1.0)))
    roots = 1.0 / roots
    S = np.poly(roots)[::-1]                   # error propagator S
    SSA_max = rho / ((2.0 * degree + 1.0) ** 2)
    S_hat = np.polymul(S, S)
    S_hat = np.hstack(((-1.0 / SSA_max) * S_hat, [1]))
    coeffs = np.polymul(S_hat, S)
    coeffs = -coeffs[:-1]
    return coeffs, roots
