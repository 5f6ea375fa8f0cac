"""Spatial (6-D) vector algebra in JAX.

TPU-native counterpart of the reference's emitted device-side spatial library
(``/root/reference/helpers/_spatial_algebra_helpers.py:35-257``: strided
``dot_prod``, the ``mx0..mx5`` motion-cross column variants, ``fx`` /
``fx_times_v``) and of the golden NumPy operators
(``/root/reference/_test.py:522-681``).

Conventions: motion vectors are ``[ω; v]`` (angular first); the motion
cross-product matrix is ``crm(m) = [[ω̂, 0], [v̂, ω̂]]`` and the force one is
``crf(m) = −crm(m)ᵀ = [[ω̂, v̂], [0, ω̂]]``.

Instead of emitting one specialized function per joint-axis column (the
reference's ``mx<S>``/``mxX`` dispatch, ``_spatial_algebra_helpers.py:1-33``),
we express the cross products component-wise on ``(..., 6)`` arrays: XLA
fuses these into the surrounding elementwise graph, and arbitrary (non
one-hot) axes come for free. All functions broadcast over leading batch
dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross3(a, b):
    """3-D cross product on the last axis (broadcasting)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1)


def crm_apply(m, x):
    """Motion cross product ``m × x`` (reference ``mx``/``mxv``):
    ``[ω_m × x_ω ; ω_m × x_v + v_m × x_ω]``."""
    w, u = m[..., :3], m[..., 3:]
    xw, xv = x[..., :3], x[..., 3:]
    return jnp.concatenate(
        [cross3(w, xw), cross3(w, xv) + cross3(u, xw)], axis=-1)


def crf_apply(m, x):
    """Force cross product ``m ×* x`` (reference ``fx_times_v`` /
    ``fxv``, ``_test.py:649-664``): ``[ω_m × x_ω + v_m × x_v ; ω_m × x_v]``."""
    w, u = m[..., :3], m[..., 3:]
    xw, xv = x[..., :3], x[..., 3:]
    return jnp.concatenate(
        [cross3(w, xw) + cross3(u, xv), cross3(w, xv)], axis=-1)


def crm(m):
    """Dense 6×6 motion cross matrix (for matrix-valued uses)."""
    w, u = m[..., :3], m[..., 3:]
    zero = jnp.zeros(m.shape[:-1] + (3, 3), m.dtype)
    return jnp.concatenate([
        jnp.concatenate([skew(w), zero], axis=-1),
        jnp.concatenate([skew(u), skew(w)], axis=-1),
    ], axis=-2)


def crf(m):
    return -jnp.swapaxes(crm(m), -1, -2)


def crf_swap(w):
    """The matrix ``G(w)`` with ``G(w) @ x == crf_apply(x, w)`` — the force
    cross product linearized in its *motion* argument (the reference's
    ``fx_times_v`` with the roles swapped; needed by analytic gradient
    recursions where the motion vector is the differential). For
    ``w = (n, l)``: ``[[−n̂, −l̂], [−l̂, 0]]``."""
    n, l = w[..., :3], w[..., 3:]
    zero = jnp.zeros(w.shape[:-1] + (3, 3), w.dtype)
    return jnp.concatenate([
        jnp.concatenate([-skew(n), -skew(l)], axis=-1),
        jnp.concatenate([-skew(l), zero], axis=-1),
    ], axis=-2)


def skew(v):
    """(..., 3) → (..., 3, 3) skew-symmetric matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    rows = jnp.stack([
        jnp.stack([o, -z, y], axis=-1),
        jnp.stack([z, o, -x], axis=-1),
        jnp.stack([-y, x, o], axis=-1),
    ], axis=-2)
    return rows


def xform_apply(X, v):
    """Apply motion transform(s): ``(..., 6, 6) @ (..., 6)``."""
    return jnp.einsum("...ij,...j->...i", X, v)


def xform_T_apply(X, f):
    """Apply the transpose (force transform): ``Xᵀ f``."""
    return jnp.einsum("...ji,...j->...i", X, f)
