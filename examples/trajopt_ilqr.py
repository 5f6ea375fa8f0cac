#!/usr/bin/env python
"""Example: iLQR swing-up style trajectory optimization on the iiwa-14.

Demonstrates the serving pattern the engine is built for (the reference's
trajectory batch, ``NUM_TIMESTEPS`` states per call): every iLQR iteration
consumes one batched analytic ∇FD evaluation over the whole trajectory —
`linearize_trajectory` — plus one `simulate` rollout.

Run:  python examples/trajopt_ilqr.py [--steps 60] [--iters 12]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--dt", type=float, default=0.02)
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (this box's sitecustomize "
                        "forces jax_platforms='axon,cpu' at interpreter "
                        "start, so the env var alone cannot opt out)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    model = g.load_robot(zoo.iiwa14(damping=0.2), dtype=jnp.float32)
    n = model.n
    T, dt = args.steps, args.dt

    q_goal = jnp.asarray(np.linspace(0.4, -0.6, n), jnp.float32)
    q0 = jnp.zeros(n, jnp.float32)
    qd0 = jnp.zeros(n, jnp.float32)
    wq, wqd, wu = 20.0, 0.5, 1e-3

    @jax.jit
    def rollout_cost(u_traj):
        q_traj, qd_traj = g.simulate(model, q0, qd0, u_traj, dt=dt,
                                     method="semi_implicit")
        c = (wq * jnp.sum((q_traj[-1] - q_goal) ** 2)
             + wqd * jnp.sum(qd_traj[-1] ** 2)
             + wu * jnp.sum(u_traj ** 2)
             + 0.1 * wq * jnp.sum((q_traj - q_goal) ** 2) / T)
        return c, (q_traj, qd_traj)

    @jax.jit
    def ilqr_backward(q_traj, qd_traj, u_traj):
        """One Gauss-Newton/iLQR backward pass using the ANALYTIC dynamics
        linearization (A, B) from the engine."""
        A, B = g.linearize_trajectory(model, q_traj, qd_traj, u_traj, dt=dt)
        Vx = jnp.concatenate([2 * wq * (1.1) * (q_traj[-1] - q_goal),
                              2 * wqd * qd_traj[-1]])
        Vxx = jnp.diag(jnp.concatenate([jnp.full(n, 2 * wq * 1.1),
                                        jnp.full(n, 2 * wqd)]))

        def step(carry, inp):
            Vx, Vxx = carry
            At, Bt, qt, ut = inp
            lx = jnp.concatenate([0.2 * wq * (qt - q_goal) / T, jnp.zeros(n)])
            lu = 2 * wu * ut
            Qx = lx + At.T @ Vx
            Qu = lu + Bt.T @ Vx
            Qxx = 0.2 * wq / T * jnp.eye(2 * n) + At.T @ Vxx @ At
            Quu = 2 * wu * jnp.eye(n) + Bt.T @ Vxx @ Bt
            Qux = Bt.T @ Vxx @ At
            Quu_inv = jnp.linalg.inv(Quu + 1e-6 * jnp.eye(n))
            k = -Quu_inv @ Qu
            K = -Quu_inv @ Qux
            Vx2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            return (Vx2, 0.5 * (Vxx2 + Vxx2.T)), (k, K)

        (_, _), (ks, Ks) = jax.lax.scan(
            step, (Vx, Vxx), (A[::-1], B[::-1], q_traj[::-1], u_traj[::-1]))
        return ks[::-1], Ks[::-1]

    @jax.jit
    def forward_pass(u_traj, q_ref, qd_ref, ks, Ks, alpha):
        def step(carry, inp):
            q, qd = carry
            u_t, q_r, qd_r, k, K = inp
            dx = jnp.concatenate([q - q_r, qd - qd_r])
            u_new = u_t + alpha * k + K @ dx
            qdd = g.forward_dynamics(model, q, qd, u_new, impl="vmap")
            qd2 = qd + dt * qdd
            return (q + dt * qd2, qd2), u_new

        (_, _), u_new = jax.lax.scan(step, (q0, qd0),
                                     (u_traj, q_ref, qd_ref, ks, Ks))
        return u_new

    u = jnp.zeros((T, n), jnp.float32)
    cost, (q_traj, qd_traj) = rollout_cost(u)
    print(f"iter  0: cost={float(cost):10.3f}")
    t0 = time.perf_counter()
    for it in range(args.iters):
        ks, Ks = ilqr_backward(q_traj, qd_traj, u)
        for alpha in (1.0, 0.5, 0.25, 0.1):
            u_try = forward_pass(u, q_traj, qd_traj, ks, Ks, alpha)
            c_try, (qt, qdt) = rollout_cost(u_try)
            if float(c_try) < float(cost):
                u, cost, q_traj, qd_traj = u_try, c_try, qt, qdt
                break
        print(f"iter {it+1:2d}: cost={float(cost):10.3f} (alpha={alpha})")
    print(f"optimized in {time.perf_counter()-t0:.2f}s; "
          f"final joint error: {float(jnp.abs(q_traj[-1]-q_goal).max()):.4f}")


if __name__ == "__main__":
    main()
