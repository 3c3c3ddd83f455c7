"""On-device root finding along a grid axis.

Rebuild of the reference's ``find_closest3`` (``isochrones/interp.py:404-485``):
bisection seeding a Newton-secant iteration, used by the "accurate" mass->EEP
inversion on isochrone grids. Here both loops are ``lax.while_loop``s with
static iteration caps so the whole solve stays on device and vectorizes under
``vmap`` (the reference solves one scalar at a time in Python).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .interp import GridData, interp_nd

__all__ = ["find_closest_grid", "find_closest_grid_batch"]


def _find_closest_fn(f, a, b, bisect_tol=0.5, newton_tol=0.01, max_iter=100, max_bisect=60):
    """Find x in [a, b] with f(x) ~= 0 via bisection + secant (interp.py:404-485)."""
    ya = f(jnp.asarray(a, jnp.result_type(a, jnp.float32)))
    # carry dtype follows the residual (grid) dtype, not the (possibly weak
    # Python float) bracket endpoints — while_loop requires a stable carry
    dtype = ya.dtype
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    ya = ya.astype(dtype)
    yb = f(b)

    # precedence matches the reference exactly (interp.py:424-434, pinned by
    # tests/reference_oracle.py::ref_find_closest3): a NaN bracket endpoint
    # -> NaN FIRST, then the |y| < tol shortcuts, then same-sign -> NaN
    nan_bracket = jnp.isnan(ya) | jnp.isnan(yb)
    same_sign = jnp.sign(ya) == jnp.sign(yb)
    hit_a = jnp.abs(ya) < newton_tol
    hit_b = jnp.abs(yb) < newton_tol

    def bisect_cond(state):
        a, b, ya, yb, c, yc, i = state
        return ((b - a) / 2 >= bisect_tol) & (yc != 0) & (i < max_bisect)

    def bisect_body(state):
        a, b, ya, yb, _, _, i = state
        c = (a + b) / 2
        yc = f(c)
        same = jnp.sign(yc) == jnp.sign(ya)
        a2 = jnp.where(same, c, a)
        ya2 = jnp.where(same, yc, ya)
        b2 = jnp.where(same, b, c)
        yb2 = jnp.where(same, yb, yc)
        return a2, b2, ya2, yb2, c, yc, i + 1

    # first bisection applied before the loop (the reference's do-while):
    # the loop body would otherwise recompute the same midpoint residual —
    # one redundant grid interpolation (the dominant cost) per solve
    c0 = (a + b) / 2
    yc0 = f(c0)
    same0 = jnp.sign(yc0) == jnp.sign(ya)
    init = (
        jnp.where(same0, c0, a), jnp.where(same0, b, c0),
        jnp.where(same0, yc0, ya), jnp.where(same0, yb, yc0),
        c0, yc0, 1,
    )
    a1, b1, ya1, yb1, c, yc = jax.lax.while_loop(bisect_cond, bisect_body, init)[:6]

    # Newton-secant seeded at bisection midpoint (interp.py:454-485)
    x0, y0 = c, yc
    x1 = x0 + jnp.asarray(0.1, dtype)
    y1 = f(x1)

    def secant_cond(state):
        x0, y0, x1, y1, i = state
        return (jnp.abs(y1) > newton_tol) & (i < max_iter) & ~jnp.isnan(y1)

    def secant_body(state):
        x0, y0, x1, y1, i = state
        # plain division, as the reference (interp.py:470): a stalled secant
        # (y1 == y0) produces inf -> f(inf) = NaN -> NaN result, rather than
        # silently returning an unconverged point
        newx = (x0 * y1 - x1 * y0) / (y1 - y0)
        return x1, y1, newx, f(newx), i + 1

    _, _, xf, yf, _ = jax.lax.while_loop(secant_cond, secant_body, (x0, y0, x1, y1, 0))
    xf = jnp.where(jnp.isnan(yf), jnp.nan, xf)

    out = jnp.where(hit_a, a, jnp.where(hit_b, b, jnp.where(same_sign, jnp.nan, xf)))
    return jnp.where(nan_bracket, jnp.nan, out)


@partial(jax.jit, static_argnames=("icol", "bisect_tol", "newton_tol", "max_iter"))
def find_closest_grid(
    grid: GridData, val, lo, hi, v1, v2, icol, bisect_tol=0.5, newton_tol=0.01, max_iter=100
):
    """Solve ``interp(v1, v2, x)[icol] == val`` for x on a 3-d grid."""

    def f(x):
        pt = jnp.stack([jnp.asarray(v1, x.dtype), jnp.asarray(v2, x.dtype), x])[None]
        return interp_nd(
            grid.values, grid.knots, pt, icols=(icol,), axis_maps=grid.axis_maps
        )[0, 0] - val

    return _find_closest_fn(f, lo, hi, bisect_tol=bisect_tol, newton_tol=newton_tol, max_iter=max_iter)


@partial(jax.jit, static_argnames=("icol", "bisect_tol", "newton_tol", "max_iter"))
def find_closest_grid_batch(
    grid: GridData, vals, los, his, v1s, v2s, icol, bisect_tol=0.5, newton_tol=0.01, max_iter=100
):
    """vmapped batch version of :func:`find_closest_grid`."""

    def solve(val, lo, hi, v1, v2):
        def f(x):
            pt = jnp.stack([jnp.asarray(v1, x.dtype), jnp.asarray(v2, x.dtype), x])[None]
            return interp_nd(
                grid.values, grid.knots, pt, icols=(icol,), axis_maps=grid.axis_maps
            )[0, 0] - val

        return _find_closest_fn(f, lo, hi, bisect_tol=bisect_tol, newton_tol=newton_tol, max_iter=max_iter)

    return jax.vmap(solve)(vals, los, his, v1s, v2s)
