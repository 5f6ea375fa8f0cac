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


# ----------------------------------------------------------- batch-last
# The vmap nest above is correct everywhere but lays out per-state (6,6)
# temporaries batch-FIRST — on TPU that puts structure dims on the (8,128)
# register tile (measured: 3.2e4 evals/s at 16k and OOM at 65k from a 28×
# padding expansion on f32[B,6,6,1] remat copies). These batch-LAST forms
# differentiate ``ops/blops.py`` instead: one ``jax.linearize`` of the
# batch-last analytic gradient, then the 3n coordinate tangents — each
# broadcast over the batch — pushed through the linearized program with the
# batch on the vector lanes throughout (same redesign that took the contact
# layer 36×, ops/kinematics.py note).


def fd_grad_full_bl(model: RobotModel, q, qd, u, gravity=-9.81):
    """Batch-last [∂q̈/∂q | ∂q̈/∂q̇ | M⁻¹]: q/qd/u (n, *b) → (n, 3n, *b)."""
    from .blops import (densify_rows, joint_transforms_bl, matmatN, matvecN,
                        minv_bl, rnea_bwd_bl, rnea_fwd_bl,
                        rnea_grad_inner_bl)

    X = joint_transforms_bl(model, q)
    v, _, f0 = rnea_fwd_bl(model, X, qd, None, gravity)
    c, _ = rnea_bwd_bl(model, X, f0, qd)
    rows, _, _ = minv_bl(model, X)
    Minv = densify_rows(rows)
    qdd = matvecN(Minv, u - c)
    _, a, f = rnea_fwd_bl(model, X, qd, qdd, gravity, v_known=v)
    _, f = rnea_bwd_bl(model, X, f, None)
    dq = rnea_grad_inner_bl(model, X, qd, v, a, f, gravity,
                            sides=("q",))["q"]
    ddq = matmatN(Minv, dq, negate=True)
    dqd = rnea_grad_inner_bl(model, X, qd, v, a, f, gravity,
                             sides=("qd",))["qd"]
    ddqd = matmatN(Minv, dqd, negate=True)
    return jnp.concatenate([ddq, ddqd, Minv], axis=1)


def _coord_tangents(n3, batch_shape, dtype):
    """(n3, n3, *b): tangent k is the coordinate direction e_k broadcast
    over the batch (every state perturbed the same way)."""
    eye = jnp.eye(n3, dtype=dtype)
    return eye.reshape((n3, n3) + (1,) * len(batch_shape))


def forward_dynamics_hessian_bl(model: RobotModel, q, qd, u, gravity=-9.81,
                                lam=None):
    """Batch-last Hessian: (n, 3n, 3n, *b) — or, with ``lam`` (n, *b)
    given, the contracted λᵀ·H of shape (3n, 3n, *b).

    Tangents are pushed through THREE per-argument linearizations instead of
    one over the concatenated x: a closed-over argument is a trace-time
    constant, so its tangent is a *symbolic* zero and JAX prunes its entire
    tangent program. The big win is the linearized M⁻¹ recursion: M⁻¹
    depends on q only, so its tangent sweep runs for the n q-directions
    instead of all 3n (and the X/v/c tangents drop from the u-block too).
    Measured on the v5e (iiwa-14, 16k states): 3.20e5 → 8.17e5 full
    Hessians/s (2.56×), λᵀ·H 3.24e5 → 8.57e5 (2.65×)."""
    n = model.topology.n
    batch_shape = q.shape[1:]

    def G(q_, qd_, u_):
        J = fd_grad_full_bl(model, q_, qd_, u_, gravity)
        if lam is not None:
            J = jnp.einsum("i...,ij...->j...", lam, J)
        return J

    tangents = jnp.broadcast_to(_coord_tangents(n, batch_shape, q.dtype),
                                (n, n) + batch_shape)
    args = (q, qd, u)
    blocks = []
    for idx in range(3):
        def g_one(z, _i=idx):
            return G(*(z if j == _i else args[j] for j in range(3)))

        _, fjvp = jax.linearize(g_one, args[idx])
        blocks.append(jax.vmap(fjvp)(tangents))
    H = jnp.concatenate(blocks, axis=0)    # (3n_dirs, [n,] 3n, *b)
    # tangent axis k belongs after the Jacobian indices: (…, 3n, k, *b)
    return jnp.moveaxis(H, 0, 2 if lam is None else 1)


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
