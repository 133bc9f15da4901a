"""Minimal L-BFGS (two-loop recursion + backtracking Armijo line
search), pure numpy — used by the L-BFGS t-SNE driver since scipy is
not guaranteed in the runtime.

Standard textbook algorithm (Nocedal & Wright, Numerical
Optimization, Alg. 7.4/7.5). The reference depends on breeze's
``LBFGS`` for the same role (``LBFGSTSNE.scala:58-95``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def lbfgs_minimize(
    fg: Callable[[np.ndarray], tuple[float, np.ndarray]],
    x0: np.ndarray,
    max_iter: int = 100,
    m: int = 10,
    tol: float = 1e-4,
    callback: Callable[[int, np.ndarray, float], None] | None = None,
) -> tuple[np.ndarray, float]:
    """Minimize f via L-BFGS. ``fg(x) -> (f, grad)``.

    Returns (x, f). Convergence: relative improvement < tol (matching
    breeze's default functional-decrease criterion in spirit).
    """
    x = x0.copy()
    f, g = fg(x)
    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    rho_hist: list[float] = []
    for it in range(1, max_iter + 1):
        # two-loop recursion
        q = g.copy()
        alphas = []
        for s, y, rho in zip(reversed(s_hist), reversed(y_hist), reversed(rho_hist)):
            a = rho * s.dot(q)
            alphas.append(a)
            q -= a * y
        if y_hist:
            gamma = s_hist[-1].dot(y_hist[-1]) / y_hist[-1].dot(y_hist[-1])
            q *= gamma
        for s, y, rho, a in zip(s_hist, y_hist, rho_hist, reversed(alphas)):
            b = rho * y.dot(q)
            q += (a - b) * s
        d = -q
        # backtracking Armijo
        step = 1.0 if y_hist else min(1.0, 1.0 / (np.abs(g).sum() + 1e-12))
        gd = g.dot(d)
        if gd >= 0:  # not a descent direction — reset memory
            d = -g
            gd = -g.dot(g)
            s_hist.clear(); y_hist.clear(); rho_hist.clear()
        f_new, g_new, x_new = f, g, x
        for _ in range(20):
            x_try = x + step * d
            f_try, g_try = fg(x_try)
            if np.isfinite(f_try) and f_try <= f + 1e-4 * step * gd:
                f_new, g_new, x_new = f_try, g_try, x_try
                break
            step *= 0.5
        else:
            break  # line search failed — converged as far as we can
        s = x_new - x
        yv = g_new - g
        sy = s.dot(yv)
        if sy > 1e-10:
            s_hist.append(s)
            y_hist.append(yv)
            rho_hist.append(1.0 / sy)
            if len(s_hist) > m:
                s_hist.pop(0); y_hist.pop(0); rho_hist.pop(0)
        rel = abs(f - f_new) / max(abs(f), abs(f_new), 1.0)
        x, f, g = x_new, f_new, g_new
        if callback is not None:
            callback(it, x, f)
        if rel < tol:
            break
    return x, f
