#!/usr/bin/env python
"""Operational-space reaching: IK for the goal, OSC to track it dynamically.

A batch of iiwa-14 arms starts from random configurations; each must bring
its end-effector point to a (shared) Cartesian goal. The controller is the
Khatib operational-space law from ``ops/task.py``:

    a*  = kp (x* − x) + kd (ẋ* − ẋ)              task-space PD
    τ   = Jᵀ Λ (a* − J̇q̇) + Nᵀ τ_posture + c     exact task closure

with the posture torque pulling toward an IK solution of the same goal
(``ops/ik.py``) through the dynamically consistent nullspace — so the arm
settles at a *named* configuration instead of drifting in the task
nullspace. Everything (IK solve, OSC torque, semi-implicit integration)
is one jitted, vmapped program on the engine's primitives.

The reference engine family exists to accelerate exactly these control
stacks (its ∇FD kernels feed the planners above this layer); this demo
shows the TPU framework covering the control side end-to-end.

Run:  python examples/osc_reaching.py --cpu --envs 8 --steps 1200
(~40 s on one CPU core; prints mean/max final EE error — sub-millimeter)
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--dt", type=float, default=2e-3)
    ap.add_argument("--kp", type=float, default=120.0)
    ap.add_argument("--kd", type=float, default=22.0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.models.urdf import parse_urdf
    from gridcodegenerator_tpu.ops import kinematics as kin
    from gridcodegenerator_tpu.ops import task as tk

    desc = parse_urdf(zoo.iiwa14(damping=0.1))
    model = g.load_robot(zoo.iiwa14(damping=0.1), dtype=jnp.float32)
    limits = (jnp.asarray(desc.q_lower, jnp.float32),
              jnp.asarray(desc.q_upper, jnp.float32))
    n, link = model.n, model.n - 1
    off = jnp.asarray([0.0, 0.0, 0.1], jnp.float32)
    goal = jnp.asarray([0.45, 0.25, 0.55], jnp.float32)

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(0.4 * rng.uniform(-1, 1, (args.envs, n)), jnp.float32)
    qd0 = jnp.zeros_like(q0)

    # IK: one solve per env (vmapped) for the posture target of the same goal
    t0 = time.time()
    q_ik, ik_err = g.ik_point_batched(
        model, q0, jnp.broadcast_to(goal, (args.envs, 3)), link, off,
        iters=96, damping=1e-4, limits=limits)
    jax.block_until_ready(q_ik)
    print(f"ik: max residual {float(jnp.max(ik_err)):.2e} "
          f"({time.time() - t0:.1f}s incl. compile)")

    kp, kd = args.kp, args.kd
    k_post = 8.0     # posture PD gains (filtered through the nullspace)

    def controller(q, qd, q_post):
        x = kin.point_position(model, q, link, off)
        xd = kin.point_velocity(model, q, qd, link, off)
        a_des = tk.task_pd_acceleration(x, xd, goal, jnp.zeros(3), kp, kd)
        u_post = k_post * (q_post - q) - 2.0 * qd
        return tk.osc_torque(model, q, qd, u_post, a_des, link, off,
                             rows="pos", reg=1e-8)

    def step(carry, _):
        q, qd = carry
        tau = jax.vmap(controller)(q, qd, q_ik)
        qdd = g.forward_dynamics(model, q, qd, tau, impl="vmap")
        qd = qd + args.dt * qdd
        q = q + args.dt * qd
        return (q, qd), None

    @jax.jit
    def rollout(q, qd):
        (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=args.steps)
        return q, qd

    t0 = time.time()
    qf, qdf = rollout(q0, qd0)
    jax.block_until_ready(qf)
    dt_wall = time.time() - t0

    xf = jax.vmap(lambda q_: kin.point_position(model, q_, link, off))(qf)
    err = jnp.linalg.norm(xf - goal, axis=-1)
    post = jnp.linalg.norm(qf - q_ik, axis=-1)
    print(f"rollout: {args.steps} steps x {args.envs} envs in "
          f"{dt_wall:.1f}s (incl. compile)")
    print(f"final EE error:   mean {float(jnp.mean(err)) * 1e3:.3f} mm   "
          f"max {float(jnp.max(err)) * 1e3:.3f} mm")
    print(f"posture distance: mean {float(jnp.mean(post)):.3f} rad "
          f"(nullspace pull toward the IK solution)")
    assert float(jnp.max(err)) < 5e-3, "OSC failed to converge"


if __name__ == "__main__":
    main()
