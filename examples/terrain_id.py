#!/usr/bin/env python
"""Terrain identification by gradient descent THROUGH contact AND the
heightfield.

A HyQ quadruped is shoved across an inclined heightfield of unknown
grade g* and we observe only the base trajectory. The ground stepper is
differentiable end-to-end — implicit-function-theorem gradients through
the PGS cone solve (``diff_mode="implicit"``), closed-form bilinear
terrain with gradients through the NODE HEIGHTS (``ops/terrain.py``) —
so the trajectory-mismatch loss has an exact gradient w.r.t. the grade
via the chain ``∂L/∂g = <∂L/∂heights, X>`` (heights = g·X), and a few
backtracking gradient steps recover g* to high precision.

The same machinery identifies arbitrary per-node heights (the test
``tests/test_terrain.py::test_terrain_identification_gradient`` pins
d(step)/d(heights) against finite differences node by node); one scalar
keeps this demo fast.

Run:  python examples/terrain_id.py          (~60 s on one core; pins
CPU — the f64 IFT backsolve has no TPU LU)
"""

import argparse
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

FEET = (2, 5, 8, 11)
FOOT_OFF = np.tile(np.array([0.35, 0.0, 0.0]), (4, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--grade-true", type=float, default=0.18)
    ap.add_argument("--grade-init", type=float, default=0.0)
    ap.add_argument("--gd-iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="accepted for CLI consistency; this example "
                         "always pins the CPU backend")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff
    from gridcodegenerator_tpu.ops import terrain as tr

    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float64)
    n = ffm.n

    # the slope family: heights(g) = g * X on a fixed grid
    base = tr.slope_terrain(1.0, 0.0, extent=4.0, cell=0.5,
                            dtype=jnp.float64)
    X_nodes = base.heights                       # heights at grade 1.0
    terr_of = lambda grade: base._replace(heights=grade * X_nodes)

    # Placement is a DIFFERENTIABLE function of the candidate grade: the
    # robot is pitched onto the candidate incline with feet 2 mm clear,
    # then shoved downhill. Each candidate therefore rolls out a clean
    # impact-free slide on its own terrain, and the trajectory-mismatch
    # landscape is smooth and convex in the grade. (Fixing the initial
    # state instead buries/floats the feet for wrong candidates — the
    # ERP penetration wall and discrete impact timing turn the landscape
    # into a forest of spikes; measured: the basin around g* collapses
    # to ±0.001 and gradients just outside point AWAY from it.)
    q0 = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4), jnp.float64)
    kp, kd, dt = 400.0, 25.0, 2e-3

    def state_of(grade):
        th = jnp.arctan(grade)
        zero = jnp.zeros_like(th)
        quat = jnp.stack([jnp.cos(th / 2), zero, -jnp.sin(th / 2), zero])
        R = ff.quat_to_rot(quat)
        terr = terr_of(grade)
        clear = []
        for i, l in enumerate(FEET):
            f = R @ ct._fb_point_base(ffm, q0, l,
                                      jnp.asarray(FOOT_OFF[i],
                                                  jnp.float64))[0]
            h, _ = tr.terrain_surface(terr, f[0], f[1])
            clear.append(h - f[2])
        z = jnp.max(jnp.stack(clear)) + 0.002
        pos = jnp.stack([zero, zero, z])
        vb = jnp.zeros(6, jnp.float64).at[3].set(-0.8)   # downhill shove
        return (quat, pos, q0, vb, jnp.zeros(n, jnp.float64))

    def rollout(grade):
        terr = terr_of(grade)

        def step(s, _):
            tau = kp * (q0 - s[2]) - kd * s[4]
            nxt, _ = ct.fb_step_ground(ffm, s, tau, dt, FEET, FOOT_OFF,
                                       mu=0.45, terrain=terr, iters=60,
                                       diff_mode="implicit", relax=0.7)
            return nxt, (nxt[1], nxt[3])
        _, (pos, vb) = jax.lax.scan(step, state_of(grade), None,
                                    length=args.steps)
        return pos, vb

    pos_true, vb_true = jax.jit(rollout)(jnp.float64(args.grade_true))
    pos0 = state_of(jnp.float64(args.grade_true))[1]
    drop_mm = float(pos0[2] - pos_true[-1, 2]) * 1e3
    slide_mm = float(pos_true[-1, 0] - pos0[0]) * 1e3
    print(f"observed: base dropped {drop_mm:.1f} mm, slid {slide_mm:.1f} mm"
          f" on grade g*={args.grade_true}")

    @jax.jit
    def loss_and_grad(grade):
        def L(g_):
            pos, vb = rollout(g_)
            return (jnp.sum((pos - pos_true) ** 2)
                    + 0.1 * jnp.sum((vb - vb_true) ** 2))
        return jax.value_and_grad(L)(grade)

    grade, lr = float(args.grade_init), 1.0
    L, dL = (float(x) for x in loss_and_grad(jnp.float64(grade)))
    t0 = time.time()
    for i in range(args.gd_iters):
        while True:
            cand = float(np.clip(grade - np.clip(lr * dL, -0.08, 0.08),
                                 -0.5, 0.5))
            Lc, dLc = (float(x) for x in loss_and_grad(jnp.float64(cand)))
            if Lc <= L or abs(cand - grade) < 1e-14:
                grade, L, dL, lr = cand, Lc, dLc, lr * 1.3
                break
            lr *= 0.5
        if i % 5 == 0 or i == args.gd_iters - 1:
            print(f"  it {i:3d}  loss {L:.3e}  grade {grade:.5f}")
    err = abs(grade - args.grade_true)
    print(f"identified grade = {grade:.5f} (true {args.grade_true}, "
          f"|err| {err:.1e}) in {time.time() - t0:.1f}s")
    assert err < 1e-3, "terrain identification failed"


if __name__ == "__main__":
    main()
