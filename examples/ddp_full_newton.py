#!/usr/bin/env python
"""Example: full-Newton DDP vs Gauss-Newton iLQR on a double-pendulum
swing-up — the workload the second-order derivative family
(``forward_dynamics_hessian`` / ``_vp``, ``ops/so.py``) exists for.

iLQR keeps only the first-order dynamics terms in the backward pass; DDP
adds the curvature term Σᵢ V_x[i]·f_zz[i], which here is one batched
``forward_dynamics_hessian`` evaluation over the whole trajectory (the
trajectory axis is the engine's batch axis, exactly like the first-order
``linearize_trajectory`` path). The demo shows the textbook tradeoff: far
from the solution the indefinite curvature makes DDP need more
regularization (Gauss-Newton's PSD model is the safer global strategy),
but inside the Newton basin DDP contracts quadratically to machine
precision while iLQR's gap decays at a fixed linear rate.

Run:  python examples/ddp_full_newton.py --cpu [--steps 80] [--iters 30]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dt", type=float, default=0.025)
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (this box's sitecustomize "
                        "forces jax_platforms='axon,cpu' at interpreter "
                        "start, so the env var alone cannot opt out)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # Newton-tail comparison needs f64
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    model = g.load_robot(zoo.double_pendulum(), dtype=jnp.float64)
    n = model.n
    T, dt = args.steps, args.dt
    q_goal = jnp.asarray([np.pi, 0.0])
    wq, wqd, wu, wqT, wqdT = 1.0, 0.05, 2e-3, 400.0, 2.0

    def step_dyn(q, qd, u):
        qdd = g.forward_dynamics(model, q, qd, u, impl="vmap")
        qd2 = qd + dt * qdd
        return q + dt * qd2, qd2

    @jax.jit
    def rollout(u_traj):
        def f(carry, u):
            q, qd = carry
            q2, qd2 = step_dyn(q, qd, u)
            return (q2, qd2), (q2, qd2)
        x0 = (jnp.zeros(n), jnp.zeros(n))
        _, (q_traj, qd_traj) = jax.lax.scan(f, x0, u_traj)
        return (jnp.concatenate([x0[0][None], q_traj[:-1]]),
                jnp.concatenate([x0[1][None], qd_traj[:-1]]),
                q_traj[-1], qd_traj[-1])

    def cost(q_traj, qd_traj, qT, qdT, u_traj):
        return (wq * jnp.sum((q_traj - q_goal) ** 2) * dt
                + wqd * jnp.sum(qd_traj ** 2) * dt
                + wu * jnp.sum(u_traj ** 2) * dt
                + wqT * jnp.sum((qT - q_goal) ** 2)
                + wqdT * jnp.sum(qdT ** 2))

    @jax.jit
    def total_cost(u_traj):
        q_traj, qd_traj, qT, qdT = rollout(u_traj)
        return cost(q_traj, qd_traj, qT, qdT, u_traj)

    @jax.jit
    def backward(u_traj, use_hessian: bool, reg: float):
        """One DDP/iLQR backward pass. ``use_hessian`` switches the
        second-order dynamics term on (DDP) or off (iLQR)."""
        q_traj, qd_traj, qT, qdT = rollout(u_traj)
        # batched analytic first-order: (T, n, 3n)
        Jfull = g.forward_dynamics_gradient_full(model, q_traj, qd_traj,
                                                 u_traj)
        # batched second-order: (T, n, 3n, 3n)
        H = jnp.where(use_hessian, 1.0, 0.0) * g.forward_dynamics_hessian(
            model, q_traj, qd_traj, u_traj)

        Vx = jnp.concatenate([2 * wqT * (qT - q_goal), 2 * wqdT * qdT])
        Vxx = jnp.diag(jnp.concatenate([jnp.full(n, 2 * wqT),
                                        jnp.full(n, 2 * wqdT)]))
        eye_u = jnp.eye(n)

        def bstep(carry, inp):
            Vx, Vxx, dV = carry
            J, Ht, qt, qdt, ut = inp
            # discrete semi-implicit map x' = [q + dt qd'; qd + dt q̈]:
            #   f_z = [[I + dt² J_q, dt I + dt² J_qd, dt² J_u],
            #          [dt J_q,      I + dt J_qd,     dt J_u ]]
            Jq, Jqd, Ju = J[:, :n], J[:, n:2 * n], J[:, 2 * n:]
            A = jnp.block([[jnp.eye(n) + dt * dt * Jq,
                            dt * jnp.eye(n) + dt * dt * Jqd],
                           [dt * Jq, jnp.eye(n) + dt * Jqd]])
            B = jnp.concatenate([dt * dt * Ju, dt * Ju])
            lx = jnp.concatenate([2 * wq * (qt - q_goal),
                                  2 * wqd * qdt]) * dt
            lu = 2 * wu * ut * dt
            lxx = jnp.diag(jnp.concatenate([jnp.full(n, 2 * wq),
                                            jnp.full(n, 2 * wqd)])) * dt
            luu = 2 * wu * dt * eye_u
            Qx = lx + A.T @ Vx
            Qu = lu + B.T @ Vx
            # second-order dynamics term (the DDP difference): λᵀ·f_zz with
            # λ = dt²·Vx_q + dt·Vx_qd contracted against the FD Hessian
            lam = dt * dt * Vx[:n] + dt * Vx[n:]
            C = jnp.einsum("i,ijk->jk", lam, Ht)     # (3n, 3n)
            Qxx = lxx + A.T @ Vxx @ A + C[:2 * n, :2 * n]
            Quu = luu + B.T @ Vxx @ B + C[2 * n:, 2 * n:]
            Qux = B.T @ Vxx @ A + C[2 * n:, :2 * n]
            Quu_r = Quu + reg * eye_u
            k = -jnp.linalg.solve(Quu_r, Qu)
            K = -jnp.linalg.solve(Quu_r, Qux)
            Vx2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
            dV2 = dV + k @ Qu + 0.5 * k @ Quu @ k
            return (Vx2, Vxx2, dV2), (k, K)

        (_, _, dV), (ks, Ks) = jax.lax.scan(
            bstep, (Vx, Vxx, 0.0),
            (Jfull, H, q_traj, qd_traj, u_traj), reverse=True)
        return ks, Ks, q_traj, qd_traj, dV

    @jax.jit
    def forward(u_traj, ks, Ks, q_ref, qd_ref, alpha):
        def f(carry, inp):
            q, qd = carry
            u, k, K, qr, qdr = inp
            dx = jnp.concatenate([q - qr, qd - qdr])
            u2 = u + alpha * k + K @ dx
            q2, qd2 = step_dyn(q, qd, u2)
            return (q2, qd2), u2
        _, u_new = jax.lax.scan(f, (jnp.zeros(n), jnp.zeros(n)),
                                (u_traj, ks, Ks, q_ref, qd_ref))
        return u_new

    def solve(use_hessian, label, u0=None, iters=None):
        u = jnp.zeros((T, n)) if u0 is None else u0
        c = float(total_cost(u))
        hist = [c]
        reg = 1e-6
        fails = 0
        t0 = time.time()
        for it in range(args.iters if iters is None else iters):
            ks, Ks, q_ref, qd_ref, dV = backward(u, use_hessian, reg)
            improved = False
            for alpha in (1.0, 0.5, 0.25, 0.1, 0.03):
                u_try = forward(u, ks, Ks, q_ref, qd_ref, alpha)
                c_try = float(total_cost(u_try))
                if np.isfinite(c_try) and c_try < c:
                    gain = c - c_try
                    u, c = u_try, c_try
                    improved = True
                    break
            hist.append(c)
            if improved:
                reg = max(reg * 0.5, 1e-9)
                fails = 0
                if gain < 1e-10 * max(1.0, c):
                    break  # converged
            else:
                # failed line search: raise the Levenberg regularization and
                # retry the backward pass (the DDP Hessian term can make Quu
                # indefinite far from the solution)
                reg = min(reg * 10.0, 1e6)
                fails += 1
                if fails >= 10:
                    break
        dtime = time.time() - t0
        print(f"{label}: {len(hist) - 1} iters, cost {c:.10f} "
              f"({dtime:.1f}s)")
        return np.asarray(hist), u

    print(f"double-pendulum swing-up, T={T}, dt={dt}")
    h_ilqr, u_star = solve(False, "iLQR (first-order dynamics)")
    h_ddp, _ = solve(True, "DDP  (+ analytic FD Hessian)")
    c_star = min(h_ilqr[-1], h_ddp[-1])

    # ---- local convergence: where the Newton term earns its keep ----------
    # Perturb the solution and watch the cost-gap tail: DDP's second-order
    # model contracts quadratically, Gauss-Newton linearly (the dropped
    # λᵀ·f_zz term is O(residual) here, so iLQR's fixed-point differs at
    # that order).
    rng = np.random.default_rng(0)
    u_pert = u_star + 0.25 * jnp.asarray(rng.standard_normal(u_star.shape))
    print("\nlocal phase from a perturbed optimum (cost gap to best):")
    gaps = {}
    for label, use_h in (("iLQR", False), ("DDP ", True)):
        h, u_fin = solve(use_h, f"  {label}", u0=u_pert, iters=12)
        c_star = min(c_star, h[-1])
        gaps[label] = h
    for label, h in gaps.items():
        tail = " ".join(f"{max(c - c_star, 0):.2e}" for c in h)
        print(f"  {label} gap: {tail}")
    print("\nexpected shape: the iLQR gap contracts at a fixed linear rate; "
          "the DDP gap\ndoubles its correct digits per iteration once inside "
          "the Newton basin\n(machine-precision tail) — the λᵀ·f_zz term "
          "iLQR drops is what restores it.")


if __name__ == "__main__":
    main()
