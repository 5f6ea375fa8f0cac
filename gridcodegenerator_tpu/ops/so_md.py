"""Second-order dynamics derivatives on the configuration manifold:
tangent-space Hessians for the multi-dof / floating-base stack.

Beyond the reference (GRiDCodeGenerator stops at first-order analytic
derivatives of single-dof fixed-base robots —
``/root/reference/algorithms/_forward_dynamics_gradient.py``): this module
extends the framework's second-order layer (:mod:`.so`, forward-over-
analytic) to robots with quaternion-parametrized joints — spherical and
floating (the free-flyer humanoid/quadruped case). It is what full-Newton
DDP / trajectory optimization consumes on a floating-base robot where iLQR
consumes only :func:`..multidof.md_forward_dynamics_gradient`.

Geometry — the Hessian of the pullback
--------------------------------------
Configurations live on a product manifold Q (unit quaternions × ℝᵏ); all
derivatives are taken in the tangent chart of :func:`..multidof.
md_tangent_apply`: ``q ⊕ δ`` advances quaternion joints by
``quat ⊗ exp(½ δφ)`` (body-frame rotation vector) and floating positions by
``p + R·δρ``. The object computed here is the true Hessian of the pullback

    h(δ, q̇, u) = λᵀ · q̈(q ⊕ δ, q̇, u)        at δ = 0,

which is what a retraction-based optimizer's second-order model needs (and
is symmetric by construction). Naively applying ``jacfwd`` to the analytic
tangent-space gradient evaluated at the retracted point computes a
*different*, asymmetric object: the analytic gradient at ``q ⊕ δ`` is
expressed in the chart centered at ``q ⊕ δ``, not at ``q``, and the two
charts compose nonlinearly. Writing ``q ⊕ (δ + ε) = (q ⊕ δ) ⊕ r(δ, ε)``,
the pullback gradient at δ is

    ∂h/∂δ (δ) = G(q ⊕ δ) · D(δ),      D(δ) = ∂r/∂ε |_{ε=0},

where G is the analytic tangent-space gradient (:func:`..multidof.
md_id_grad` engine) and D(δ) is the block-diagonal **chart-composition
correction**:

* 1-dof (revolute/prismatic) coordinates: 1 (the chart is linear),
* spherical: the SO(3) right Jacobian ``Jr(δφ)`` — from
  ``exp(φ + ε) = exp(φ)·exp(Jr(φ)·ε) + O(ε²)``,
* floating twist chart (δφ, δρ): ``blockdiag(Jr(δφ), exp(−δφ̂))`` — the
  position leg rides the *rotated* frame, so its ε must be pre-rotated
  back (δρ and δφ couple; δρ columns alone stay linear).

``jacfwd`` of the corrected gradient at δ = 0 then yields the exact
pullback Hessian (the series below carry the O(δ) terms exactly, which is
all a derivative at zero reads). Validated against nested forward-mode AD
of the pullback itself and against the fixed-base :mod:`.so` path on
all-1-dof robots (tests/test_so_md.py).

Cost: 3·nv JVP passes through the analytic first-order gradient (the
:mod:`.so` formulation one rung up), not the (3·nv)² passes of nested AD
over the primal. Single-state functions; batch via ``jax.vmap`` (the
batched adapters chunk through ``lax.map`` in :mod:`..api` style).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .multidof import (MultiDofModel, md_crba, md_forward_dynamics,
                       md_id_grad, md_tangent_apply)
from .spatial import skew as skew3


def _jr_so3(phi):
    """SO(3) right Jacobian, series form: Jr(φ) = I − ½φ̂ + (1/6)φ̂² + O(φ³).

    Exact through O(φ) — sufficient for any derivative at φ = 0 of an
    expression linear in Jr (the Hessian-at-zero use here); the series
    avoids the 0/0 of the closed form at the evaluation point itself."""
    ph = skew3(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - 0.5 * ph + (ph @ ph) / 6.0


def _expm_neg_so3(phi):
    """exp(−φ̂) series to the same order: I − φ̂ + ½φ̂² + O(φ³)."""
    ph = skew3(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - ph + 0.5 * (ph @ ph)


def chart_correction(model: MultiDofModel, delta):
    """D(δ) = ∂r/∂ε|₀ as a dense (nv, nv) block-diagonal matrix (see module
    docstring). D(0) = I; only quaternion-joint blocks are non-identity."""
    nv = model.nv
    D = jnp.eye(nv, dtype=delta.dtype)
    for i in range(model.n_joints):
        sv, wv = model.v_slices[i]
        t = model.joint_types[i]
        if t == "spherical":
            D = D.at[sv:sv + 3, sv:sv + 3].set(_jr_so3(delta[sv:sv + 3]))
        elif t == "floating":
            phi = delta[sv:sv + 3]
            D = D.at[sv:sv + 3, sv:sv + 3].set(_jr_so3(phi))
            D = D.at[sv + 3:sv + 6, sv + 3:sv + 6].set(_expm_neg_so3(phi))
    return D


def md_fd_grad_full(model: MultiDofModel, q, qd, u, gravity=-9.81):
    """[∂q̈/∂δq | ∂q̈/∂q̇ | ∂q̈/∂u] as one (nv, 3nv) tangent-space matrix
    from one shared pipeline (the multi-dof counterpart of
    :func:`.so.fd_grad_full`: X, v, M⁻¹ computed once; ∂q̈/∂u = M⁻¹)."""
    qdd = md_forward_dynamics(model, q, qd, u, gravity)
    Dq, Dqd = md_id_grad(model, q, qd, qdd, gravity)
    M = md_crba(model, q)
    L = jnp.linalg.cholesky(M)
    sol = jax.scipy.linalg.cho_solve(
        (L, True), jnp.concatenate(
            [Dq, Dqd, -jnp.eye(model.nv, dtype=q.dtype)], axis=1))
    return -sol


def md_forward_dynamics_hessian_vp(model: MultiDofModel, q, qd, u, lam,
                                   gravity=-9.81):
    """λᵀ·∂²q̈/∂x∂x as a symmetric (3nv, 3nv) matrix, x = (δq, q̇, u) in
    the tangent chart at q — the DDP backward-pass curvature term for
    floating-base / multi-dof robots (Σᵢ V_x[i]·f_zz[i] without the rank-3
    tensor). ``lam`` is (nv,)."""
    nv = model.nv
    lam = jnp.asarray(lam)

    def g(z):
        delta = z[:nv]
        qz = md_tangent_apply(model, q, delta)
        J = lam @ md_fd_grad_full(model, qz, qd + z[nv:2 * nv],
                                  u + z[2 * nv:], gravity)
        # chart-composition correction on the configuration columns
        Jq = J[:nv] @ chart_correction(model, delta)
        return jnp.concatenate([Jq, J[nv:]])

    return jax.jacfwd(g)(jnp.zeros(3 * nv, q.dtype))


def md_forward_dynamics_hessian(model: MultiDofModel, q, qd, u,
                                gravity=-9.81):
    """Full rank-3 tangent-space Hessian ∂²q̈/∂x∂x: (nv, 3nv, 3nv),
    symmetric in the trailing pair. Computed as nv λ-contractions with the
    coordinate vectors (each an independent forward-over-analytic sweep) —
    prefer :func:`md_forward_dynamics_hessian_vp` when a contraction is
    what the optimizer consumes."""
    eye = jnp.eye(model.nv, dtype=q.dtype)
    return jax.vmap(lambda e: md_forward_dynamics_hessian_vp(
        model, q, qd, u, e, gravity))(eye)


def md_inverse_dynamics_hessian_vp(model: MultiDofModel, q, qd, lam,
                                   qdd=None, gravity=-9.81):
    """λᵀ·∂²τ/∂x∂x as (2nv, 2nv), x = (δq, q̇) with q̈ held fixed (the ∂ID
    family's differentiation variables, tangent chart at q)."""
    nv = model.nv
    lam = jnp.asarray(lam)

    def g(z):
        delta = z[:nv]
        qz = md_tangent_apply(model, q, delta)
        Dq, Dqd = md_id_grad(model, qz, qd + z[nv:], qdd, gravity)
        J = lam @ jnp.concatenate([Dq, Dqd], axis=1)
        Jq = J[:nv] @ chart_correction(model, delta)
        return jnp.concatenate([Jq, J[nv:]])

    return jax.jacfwd(g)(jnp.zeros(2 * nv, q.dtype))
