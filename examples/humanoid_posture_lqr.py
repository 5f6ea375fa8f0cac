#!/usr/bin/env python
"""Free-floating humanoid posture control from the analytic md gradients.

An Atlas-class humanoid with a TRUE quaternion floating base (n=29
joints, nv=34, nq=35 — past the single-tile VMEM gate, so on TPU the
gradient calls route through the column-blocked staged md pipeline,
``ops/kernels/multidof_staged.py``) floats in zero-g like an orbital
servicing robot. The demo

1. linearizes the tangent-space dynamics at a reference posture with ONE
   call to the analytic gradient entry
   (``md_forward_dynamics_gradient_batched`` → ∂q̈/∂δq, ∂q̈/∂q̇, ∂q̈/∂u),
2. synthesizes a discrete LQR gain over the 28 actuated joints (the
   free base is unactuated — u_base ≡ 0),
3. simulates the closed loop from a large posture perturbation with the
   manifold integrator (``md_step``, one `lax.scan` dispatch), and
4. checks physics: the posture error must contract ≥100×, and internal
   torques cannot change the total momentum of a free-floating system
   (centroidal momentum conservation — the same invariant the free-flyer
   test suite pins).

Run:  python examples/humanoid_posture_lqr.py --cpu --steps 2000
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="pin JAX to CPU (skip the TPU tunnel)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--dt", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import multidof as md

    model = md.multidof_model_from_description(
        g.parse_urdf(zoo.with_free_joint(zoo.atlas(damping=0.2))),
        dtype=jnp.float64)
    nv, nq = model.nv, model.nq
    na = nv - 6                       # actuated joints (base unactuated)
    print(f"free-Atlas: n={model.n_joints} nq={nq} nv={nv} actuated={na}")

    q_ref = jnp.asarray(md.neutral_q(model))

    # --- 1. analytic tangent-space linearization at (q_ref, 0) ----------
    t0 = time.time()
    Dq, Dqd, Du = (np.asarray(x[0]) for x in
                   md.md_forward_dynamics_gradient_batched(
                       model, q_ref[None], jnp.zeros((1, nv)),
                       jnp.zeros((1, nv)), gravity=0.0))
    print(f"analytic linearization (∂q̈/∂δq, ∂q̈/∂q̇, ∂q̈/∂u): "
          f"{time.time() - t0:.2f}s")

    dt = args.dt
    # tangent state x = (δq (nv), q̇ (nv)); semi-implicit Euler discretize
    A = np.block([[np.eye(nv), dt * np.eye(nv)],
                  [dt * Dq, np.eye(nv) + dt * Dqd]])
    B = np.vstack([np.zeros((nv, na)), dt * Du[:, 6:]])

    # --- 2. discrete LQR over the actuated joints -----------------------
    Qc = np.diag(np.r_[np.zeros(6), 50.0 * np.ones(na),       # posture
                       1.0 * np.ones(6), 1.0 * np.ones(na)])  # velocities
    Rc = 1e-3 * np.eye(na)
    P = Qc.copy()
    for _ in range(600):                       # Riccati iteration
        BtP = B.T @ P
        K = np.linalg.solve(Rc + BtP @ B, BtP @ A)
        P_next = Qc + A.T @ P @ (A - B @ K)
        if np.abs(P_next - P).max() < 1e-9 * np.abs(P).max():
            P = P_next
            break
        P = P_next
    K = jnp.asarray(K)
    print(f"LQR gain: {K.shape}, spectral radius(A-BK) = "
          f"{np.abs(np.linalg.eigvals(A - B @ np.asarray(K))).max():.4f}")

    # --- 3. closed-loop rollout from a perturbed posture ----------------
    rng = np.random.default_rng(7)
    dq0 = np.zeros(nv)
    dq0[6:] = rng.uniform(-0.25, 0.25, na)     # joint posture error
    q0 = md.md_tangent_apply(model, q_ref, jnp.asarray(dq0))
    qd0 = jnp.asarray(np.r_[np.zeros(6), rng.uniform(-0.3, 0.3, na)])

    jref = q_ref[7:]                           # 1-dof joint coords

    def ctrl(q, qd):
        # tangent posture error: joints only (coordinates past the base's
        # quat+pos block are plain angles); base stays unactuated
        dx = jnp.concatenate([jnp.zeros(6), q[7:] - jref, qd])
        ua = -K @ dx
        return jnp.concatenate([jnp.zeros(6), ua])

    from gridcodegenerator_tpu.ops.freeflyer import quat_to_rot

    def world_momentum(q, qd):
        # spatial momentum about the WORLD origin in world axes: momentum
        # transforms force-like, so h_O = [R h_ω + p×(R h_v); R h_v] with
        # (R, p) the base pose from the free joint's quat+pos block
        h = (md.md_crba(model, q) @ qd)[:6]
        R, p = quat_to_rot(q[:4]), q[4:7]
        lin = R @ h[3:]
        return jnp.concatenate([R @ h[:3] + jnp.cross(p, lin), lin])

    def step(carry, _):
        q, qd = carry
        u = ctrl(q, qd)
        q2, qd2 = md.md_step(model, q, qd, u, dt, gravity=0.0)
        return (q2, qd2), (jnp.abs(q2[7:] - jref).max(),
                           jnp.abs(qd2).max(), world_momentum(q2, qd2))

    t0 = time.time()
    (qT, qdT), (perr, vmax, hist_h) = jax.lax.scan(
        step, (q0, qd0), None, length=args.steps)
    perr, vmax = np.asarray(perr), np.asarray(vmax)
    print(f"rollout: {args.steps} steps in {time.time() - t0:.2f}s "
          f"(one lax.scan dispatch)")

    e0, eT = float(jnp.abs(q0[7:] - jref).max()), float(perr[-1])
    print(f"posture error: {e0:.3f} rad → {eT:.2e} rad "
          f"({e0 / max(eT, 1e-300):.0f}× contraction)")
    assert np.isfinite(perr).all() and np.isfinite(vmax).all()
    assert eT < e0 / 100.0, "LQR failed to contract the posture error 100×"

    # --- 4. physics: momentum of a free-floating system -----------------
    # Joint torques and joint damping are INTERNAL forces: with
    # u_base = 0 and g = 0 the world-frame spatial momentum is exactly
    # conserved in continuous time. The drift here is semi-implicit-Euler
    # integration error from the aggressive LQR transient and converges
    # at first order (measured 5.6e-3 relative at dt=2e-3 → 3.0e-3 at
    # dt=1e-3; the passive rollout shows 2e-4).
    h = np.asarray(hist_h)
    scale = max(1.0, np.abs(h[0]).max())
    drift = float(np.abs(h - h[0]).max())
    print(f"world-momentum drift over rollout: {drift:.3e} "
          f"(scale {scale:.3e}, {drift / scale:.1e} relative)")
    assert drift < 5e-3 * scale, "world momentum not conserved"
    print("OK: posture stabilized, momentum conserved — analytic staged "
          "md gradients drive a working whole-body controller")


if __name__ == "__main__":
    main()
