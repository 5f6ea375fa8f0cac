#!/usr/bin/env python
"""Quadruped stance-and-squat: floating-base contact dynamics end-to-end.

HyQ stands on four pinned feet (the stance-phase contact model,
``ops/contact.py::fb_constrained_forward_dynamics``). The demo
1. solves the static stance equilibrium (min-norm ground-reaction forces
   carrying the base gravity wrench, gravity-compensating joint torques),
2. runs a squat maneuver — a PD joint-space tracking controller around a
   crouch-depth trajectory, one `lax.scan` dispatch for the whole rollout —
   and reports foot drift, base height excursion, and the vertical
   ground-reaction budget vs the robot's weight.

Run:  python examples/quadruped_stance.py --cpu --steps 2000
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
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    ffm = g.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                             dtype=jnp.float64)
    n = ffm.n
    feet = (2, 5, 8, 11)
    offs = jnp.asarray(np.tile([0.35, 0.0, 0.0], (4, 1)))

    quat0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    pos0 = jnp.array([0.0, 0.0, 0.6])
    q_stand = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4))
    vb0, qd0 = jnp.zeros(6), jnp.zeros(n)

    R0 = ff.quat_to_rot(quat0)
    anchors = jnp.concatenate([
        pos0 + R0 @ ct._fb_point_base(ffm, q_stand, l, offs[i])[0]
        for i, l in enumerate(feet)])

    # static equilibrium torque at the stand pose
    X = ffm.arm.joint_transforms(q_stand)
    p_b, c_j = ff.fb_bias(ffm, X, R0, vb0, qd0)
    J = ct.fb_contact_jacobian(ffm, quat0, q_stand, feet, offs)
    lam_star = jnp.linalg.pinv(J[:, :6].T) @ p_b
    tau_g = c_j - (J.T @ lam_star)[6:]
    m_tot = 60.96 + 4 * (2.93 + 2.638 + 0.881)
    print(f"static stance: Σf_z = {float(jnp.sum(lam_star.reshape(4,3)[:,2])):.1f} N "
          f"(weight {m_tot * 9.81:.1f} N)")

    # squat trajectory: knees flex by 0.25·sin(2πt/T) around the stand pose
    T = args.steps
    phase = jnp.sin(2 * jnp.pi * jnp.arange(T) / T)
    dq_sq = jnp.asarray(np.tile([0.0, 0.35, -0.5], 4))
    q_ref = q_stand[None, :] + phase[:, None] * 0.25 * dq_sq[None, :]

    kp, kd = 400.0, 30.0

    @jax.jit
    def rollout(state):
        def step(s, qr):
            quat, pos, q, vb, qd = s
            tau = tau_g + kp * (qr - q) - kd * qd
            dvb, qdd, lam = ct.fb_constrained_forward_dynamics(
                ffm, quat, pos, q, vb, qd, tau, feet, offs,
                anchors=anchors, baumgarte=(30.0, 30.0))
            vb = vb + args.dt * dvb
            qd = qd + args.dt * qdd
            quat = ff.quat_mul(quat, ff.quat_exp_body(vb[:3] * args.dt))
            quat = quat / jnp.linalg.norm(quat)
            pos = pos + args.dt * (ff.quat_to_rot(quat) @ vb[3:])
            q = q + args.dt * qd
            return (quat, pos, q, vb, qd), (pos[2], lam)

        return jax.lax.scan(step, state, q_ref)

    t0 = time.time()
    (quatT, posT, qT, vbT, qdT), (heights, lams) = jax.block_until_ready(
        rollout((quat0, pos0, q_stand, vb0, qd0)))
    dt_wall = time.time() - t0

    RT = ff.quat_to_rot(quatT)
    feetT = jnp.concatenate([
        posT + RT @ ct._fb_point_base(ffm, qT, l, offs[i])[0]
        for i, l in enumerate(feet)])
    drift = float(jnp.abs(feetT - anchors).max())
    fz = np.asarray(lams).reshape(T, 4, 3)[:, :, 2].sum(axis=1)
    print(f"squat rollout: {T} steps in {dt_wall:.2f}s "
          f"({T / dt_wall:.0f} steps/s, one dispatch)")
    print(f"base height: {float(jnp.min(heights)):.3f} → "
          f"{float(jnp.max(heights)):.3f} m")
    print(f"foot drift: {drift * 1e3:.3f} mm   "
          f"Σf_z range: {fz.min():.0f}–{fz.max():.0f} N (weight {m_tot*9.81:.0f} N)")
    ok = drift < 2e-3 and np.isfinite(fz).all()
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
