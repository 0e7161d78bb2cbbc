"""Numerically-safe trigonometric coefficient functions for Lie-group maps.

Each coefficient is a smooth function of the rotation angle theta that appears in
Rodrigues-type formulas (closed forms in /root/reference/st21-lie/lie-group.tex and
st23-lie-group-v2/doc.tex:304-997). Near theta=0 the closed forms are 0/0; we switch
to Taylor expansions with `jnp.where` so that values AND derivatives (jacfwd/jacrev
through the switch) stay finite — required because solvers differentiate through
`exp`/`retract` at delta=0 exactly.

All functions take `theta_sq` (theta^2) so callers never need a sqrt for the
small-angle branch, and gradients at theta_sq=0 are well-defined.
"""

import jax.numpy as jnp

# Switch point for the 0/0-only guards (sinc, cosc — their closed forms are
# cancellation-free): below this theta^2 the Taylor series is more accurate
# in both f32 and f64 (relative error < 1e-12 at the boundary).
_SMALL = 1e-8


def _cancel_thr(dtype):
    """Switch point for coefficients whose closed form CANCELS (sincc,
    jl_inv_coeff: theta - sin(theta) ~ theta^3/6 loses ~6*eps/theta^2
    relative digits). The f64-tuned 1e-8 is catastrophic in f32: at
    theta ~ 2e-4, 1 - cos(theta) rounds to exactly 0 and Jl^-1 returns inf
    (round-5 pose-graph finding — every trial cost NaN'd). At the f32
    boundary theta^2 = 0.04 the 3-term Taylor is accurate to ~1e-9 and the
    closed form to ~2e-5."""
    return 1e-8 if dtype == jnp.float64 else 4e-2


def _safe(theta_sq, thr=_SMALL):
    """theta and theta_sq guarded against 0 for use in the closed-form branch."""
    safe_sq = jnp.where(theta_sq < thr, 1.0, theta_sq)
    return jnp.sqrt(safe_sq), safe_sq


def sinc(theta_sq):
    """A(theta) = sin(theta)/theta."""
    th, sq = _safe(theta_sq)
    closed = jnp.sin(th) / th
    taylor = 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0
    return jnp.where(theta_sq < _SMALL, taylor, closed)


def cosc(theta_sq):
    """B(theta) = (1 - cos(theta))/theta^2 = 2 sin^2(theta/2)/theta^2.

    The half-angle form is cancellation-free (1 - cos rounds to 0 in f32
    already at theta ~ 2e-4), so the tiny 0/0 guard suffices in both
    precisions."""
    th, sq = _safe(theta_sq)
    s = jnp.sin(0.5 * th)
    closed = 2.0 * (s * s) / sq
    taylor = 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0
    return jnp.where(theta_sq < _SMALL, taylor, closed)


def sincc(theta_sq):
    """C(theta) = (theta - sin(theta))/theta^3 — the left-Jacobian K^2
    coefficient. The numerator cancels (~theta^3/6), so the Taylor branch
    extends to the dtype-dependent threshold."""
    thr = _cancel_thr(jnp.asarray(theta_sq).dtype)
    th, sq = _safe(theta_sq, thr)
    closed = (th - jnp.sin(th)) / (sq * th)
    taylor = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    return jnp.where(theta_sq < thr, taylor, closed)


def jl_inv_coeff(theta_sq):
    """E(theta) = 1/theta^2 - (1 + cos(theta)) / (2 theta sin(theta)).

    K^2 coefficient of the inverse left Jacobian. The closed form is singular at
    theta = k*pi; near theta=pi `sin(theta)->0` but the function itself stays
    finite only up to theta<pi (Jl is singular at 2*pi; at pi it is fine:
    E(pi) = 1/pi^2). Rewrite as (1 - A/(2B)) / theta^2 with A=sinc, B=cosc which
    is regular on (0, 2*pi); the outer subtraction still cancels
    (1 - A/2B ~ theta^2/12), so the Taylor branch extends to the
    dtype-dependent threshold."""
    thr = _cancel_thr(jnp.asarray(theta_sq).dtype)
    _, sq = _safe(theta_sq, thr)
    a = sinc(theta_sq)
    b = cosc(theta_sq)
    closed = (1.0 - 0.5 * a / b) / sq
    taylor = 1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0
    return jnp.where(theta_sq < thr, taylor, closed)
