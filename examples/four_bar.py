#!/usr/bin/env python
"""Example: closed kinematic chains — a four-bar linkage (``ops/loops.py``).

The reference engine (and URDF itself) supports kinematic TREES only; real
mechanisms close loops. This example drives the ``zoo.four_bar()``
parallelogram linkage, whose loop is restored as a bilateral relative point
constraint between the coupler tip and the rocker tip (MuJoCo-``connect``
style), solved by the same Delassus elimination as the contact layer.

Part 1 — physics: an undamped swing under gravity conserves energy (the cut
force is workless) while the loop gap stays at solver precision, and the
mechanism moves in its single parallelogram DOF.

Part 2 — differentiable mechanism design: recover the crank torque schedule
that swings the linkage to a target crank angle by gradient descent THROUGH
the closed-chain rollout (``jax.grad`` of a ``lax.scan`` over the
KKT-constrained step).

Run:  python examples/four_bar.py --cpu [--iters 40]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (this box's sitecustomize "
                        "forces the TPU-tunnel platform at interpreter "
                        "start; the env var alone cannot opt out)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import loops

    desc = g.parse_urdf(zoo.four_bar())
    model = g.robot_model_from_description(desc, dtype=jnp.float64)
    gold = g.GoldenDynamics(desc)
    names = desc.topology.link_names
    pairs = ((names.index("coupler"), names.index("rocker")),)
    oa = np.array([[0.8, 0.0, 0.0]])
    ob = np.array([[0.0, 0.0, -0.5]])

    # ---- Part 1: free swing, energy + loop integrity + single DOF
    q = jnp.zeros(3)
    qd = loops.loop_project_velocity(model, q, jnp.asarray([1.5, 0.0, 0.0]),
                                     pairs, oa, ob, reg=1e-10)
    print("four_bar: parallelogram mode q̇ =", np.round(np.asarray(qd), 6),
          "(crank = rocker, coupler compensates)")
    dt, T = 1e-3, 600
    u0 = jnp.zeros(3)

    @jax.jit
    def rk4(q, qd):
        def deriv(s):
            qdd, _ = loops.loop_forward_dynamics(model, s[0], s[1], u0,
                                                 pairs, oa, ob, reg=1e-10)
            return s[1], qdd
        k1 = deriv((q, qd))
        k2 = deriv((q + 0.5 * dt * k1[0], qd + 0.5 * dt * k1[1]))
        k3 = deriv((q + 0.5 * dt * k2[0], qd + 0.5 * dt * k2[1]))
        k4 = deriv((q + dt * k3[0], qd + dt * k3[1]))
        return (q + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
                qd + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))

    e0 = gold.energy(np.asarray(q), np.asarray(qd))
    for _ in range(T):
        q, qd = rk4(q, qd)
    e1 = gold.energy(np.asarray(q), np.asarray(qd))
    gap = np.abs(np.asarray(loops.loop_gap(model, q, pairs, oa, ob))).max()
    print(f"free swing {T * dt:.1f}s: |ΔE|/|E| = "
          f"{abs(e1 - e0) / max(1, abs(e0)):.2e}, max loop gap = {gap:.2e}")
    assert abs(e1 - e0) < 1e-6 * max(1.0, abs(e0)) and gap < 1e-4

    # ---- Part 2: crank-torque recovery through the closed-chain rollout —
    # Newton on the scalar shooting residual r(τ) = q_crank(T; τ) − target,
    # both r and r' obtained by AD straight through the lax.scan over the
    # KKT-constrained steps
    Topt, dto = 150, 2e-3
    target = 0.9  # crank angle at the horizon

    def terminal_angle(tau_c):
        taus = jnp.zeros((Topt, 3)).at[:, 0].set(tau_c)
        (_qT, _qdT), (qs, _, _) = loops.simulate_loops(
            model, jnp.zeros(3), jnp.zeros(3), taus, dto, pairs, oa, ob,
            reg=1e-10)
        return qs[-1, 0]

    resid = jax.jit(lambda t: terminal_angle(t) - target)
    dresid = jax.jit(jax.grad(lambda t: terminal_angle(t)))
    tau_c = jnp.asarray(0.0)
    for it in range(args.iters):
        r = resid(tau_c)
        if it % 2 == 0:
            print(f"  iter {it:2d}  τ = {float(tau_c):+.4f}  "
                  f"residual {float(r):+.3e}")
        if abs(float(r)) < 1e-10:
            break
        tau_c = tau_c - r / dresid(tau_c)
    r = float(resid(tau_c))
    assert abs(r) < 1e-9, "Newton through the loop KKT failed"
    print(f"recovered constant crank torque τ = {float(tau_c):.5f} reaching "
          f"q_crank = {target} (residual {r:.1e}) — closed-chain dynamics "
          "are end-to-end differentiable, first AND second order")


if __name__ == "__main__":
    main()
