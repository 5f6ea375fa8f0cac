"""Second-order dynamics derivatives (Hessians of ID and FD).

Beyond the reference: GRiDCodeGenerator stops at first-order analytic
derivatives (``/root/reference/algorithms/_inverse_dynamics_gradient.py``,
``_forward_dynamics_gradient.py``) — second order is the natural next rung
of the same ladder (it is what full Newton DDP consumes where iLQR consumes
only the first-order terms).

Formulation — **forward-over-analytic**: the framework's first-order
gradients are closed-form jnp programs (``ops/rnea_grad.py``,
``ops/fd_grad.py``), so the Hessian is one ``jax.jacfwd`` over them:

    H[i, j, k] = ∂/∂x_k ( J[i, j] ),   J = the analytic Jacobian.

This costs |x| JVP passes through the analytic gradient — O(n) RNEA-grade
sweeps each — instead of the |x|² passes that ``jacfwd(jacfwd(fd))`` over
the primal would take, and it inherits the analytic path's conventions
(damping on the ∂c/∂q̇ diagonal, the crf backward correction) exactly.

Layout: x = (q, q̇, u) concatenated. ``forward_dynamics_hessian`` returns
(n, 3n, 3n) with H[i] symmetric; the ∂²q̈/∂u∂u block is identically zero
(q̈ is affine in u) and the ∂²q̈/∂u∂q block is ∂M⁻¹/∂q. For DDP the
contracted form ``forward_dynamics_hessian_vp`` (λᵀ·H, a (3n, 3n) matrix —
the f_zz·V_x term of the backward pass) avoids materializing the rank-3
tensor.

Single-state functions; batching via ``vmap`` in :mod:`..api`. These run on
the differentiable vmap path only (the fused Pallas kernels are
primal-only); on TPU the batch axis still vectorizes the whole nest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel
from .minv import densify, minv_inner
from .rnea import rnea_bwd, rnea_fwd
from .rnea_grad import inverse_dynamics_gradient, rnea_grad_inner


def fd_grad_full(model: RobotModel, q, qd, u, gravity=-9.81):
    """[∂q̈/∂q | ∂q̈/∂q̇ | ∂q̈/∂u] as one (n, 3n) matrix from one shared
    pipeline (X, v, M⁻¹ computed once; ∂q̈/∂u = M⁻¹ is the mass-matrix
    inverse the pipeline already holds — the reference's two-input-mode host
    split, ``_forward_dynamics_gradient.py:74-81``, collapses into a column
    concat here)."""
    X = model.joint_transforms(q)
    v, _, f0 = rnea_fwd(model, X, qd, None, gravity)
    c, _ = rnea_bwd(model, X, f0, qd)
    Minv = densify(minv_inner(model, X))
    qdd = Minv @ (u - c)
    _, a, f = rnea_fwd(model, X, qd, qdd, gravity, v_known=v)
    _, f = rnea_bwd(model, X, f, None)
    dc_dq, dc_dqd = rnea_grad_inner(model, X, qd, v, a, f, gravity)
    return jnp.concatenate([-Minv @ dc_dq, -Minv @ dc_dqd, Minv], axis=1)


def forward_dynamics_hessian(model: RobotModel, q, qd, u, gravity=-9.81):
    """∂²q̈/∂x∂x, x = (q, q̇, u): the (n, 3n, 3n) tensor H with
    H[i, j, k] = ∂²q̈_i/∂x_j∂x_k (symmetric in j, k)."""
    n = model.topology.n

    def G(x):
        return fd_grad_full(model, x[:n], x[n:2 * n], x[2 * n:], gravity)

    return jax.jacfwd(G)(jnp.concatenate([q, qd, u]))


def forward_dynamics_hessian_vp(model: RobotModel, q, qd, u, lam,
                                gravity=-9.81):
    """λᵀ·∂²q̈/∂x∂x as a (3n, 3n) symmetric matrix — the DDP backward-pass
    curvature term Σ_i V_x[i]·f_zz[i] without materializing the rank-3
    tensor (|x| JVPs of the λ-contracted analytic gradient)."""
    n = model.topology.n
    lam = jnp.asarray(lam)

    def g(x):
        return lam @ fd_grad_full(model, x[:n], x[n:2 * n], x[2 * n:],
                                  gravity)

    return jax.jacfwd(g)(jnp.concatenate([q, qd, u]))


def inverse_dynamics_hessian(model: RobotModel, q, qd, qdd=None,
                             gravity=-9.81):
    """∂²c/∂x∂x, x = (q, q̇) with q̈ held fixed (the ∂ID family's
    differentiation variables): (n, 2n, 2n), symmetric in the trailing
    pair."""
    n = model.topology.n

    def G(x):
        return inverse_dynamics_gradient(model, x[:n], x[n:], qdd, gravity)

    return jax.jacfwd(G)(jnp.concatenate([q, qd]))


def inverse_dynamics_hessian_vp(model: RobotModel, q, qd, lam, qdd=None,
                                gravity=-9.81):
    """λᵀ·∂²c/∂x∂x as a (2n, 2n) matrix (x = (q, q̇), q̈ fixed)."""
    n = model.topology.n
    lam = jnp.asarray(lam)

    def g(x):
        return lam @ inverse_dynamics_gradient(model, x[:n], x[n:], qdd,
                                               gravity)

    return jax.jacfwd(g)(jnp.concatenate([q, qd]))
