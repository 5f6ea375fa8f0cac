#!/usr/bin/env python
"""Friction identification by gradient descent THROUGH the contact solver.

A HyQ quadruped is shoved sideways on ground with unknown friction
μ* and slides to a stop; we observe only the resulting base trajectory.
Because :func:`fb_step_ground` with ``diff_mode="implicit"`` is
end-to-end reverse-differentiable — implicit-function-theorem gradients
through the PGS Coulomb-cone solve (``ops/contact.py::_pgs_implicit``),
smooth ops everywhere else — the mismatch loss

    L(μ) = Σ_t ‖pos_t(μ) − pos_t(μ*)‖² + ‖vb_t(μ) − vb_t(μ*)‖²

has an exact gradient, and a few Newton-ish gradient steps recover μ*
to three digits. The same machinery trains policies by BPTT through
contact (see ``tests/test_diffcontact.py::test_bptt_rollout_*``).

Run:  python examples/friction_id.py          (~60 s on one core)

The demo identifies in float64 for a clean convergence tail, so it pins
itself to CPU (TPU has no f64 LU for the IFT backsolve); the same
``diff_mode="implicit"`` path runs in f32 on TPU.
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
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--mu-true", type=float, default=0.45)
    ap.add_argument("--mu-init", type=float, default=1.0)
    ap.add_argument("--gd-iters", type=int, default=25)
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

    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float64)
    n = ffm.n

    # standing pose, feet on the plane, a 0.8 m/s sideways shove
    quat0 = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float64)
    q0 = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4), jnp.float64)
    foot_z = min(
        float(ct._fb_point_base(ffm, q0, l, jnp.asarray(FOOT_OFF[i]))[0][2])
        for i, l in enumerate(FEET))
    pos0 = jnp.array([0.0, 0.0, -foot_z], jnp.float64)
    vb0 = jnp.zeros(6, jnp.float64).at[3].set(0.8)
    state0 = (quat0, pos0, q0, vb0, jnp.zeros(n, jnp.float64))
    kp, kd, dt = 300.0, 20.0, 2e-3

    def rollout(mu):
        def step(s, _):
            tau = kp * (q0 - s[2]) - kd * s[4]
            # relax<1: the identification sweeps μ through the strongly
            # coupled high-μ regime where plain PGS limit-cycles and the
            # IFT gradient is invalid (see ops/contact.py::_pgs_sweep)
            nxt, _ = ct.fb_step_ground(ffm, s, tau, dt, FEET, FOOT_OFF,
                                       mu=mu, iters=80,
                                       diff_mode="implicit", relax=0.7)
            return nxt, (nxt[1], nxt[3])
        _, (pos, vb) = jax.lax.scan(step, state0, None, length=args.steps)
        return pos, vb

    pos_true, vb_true = jax.jit(rollout)(jnp.float64(args.mu_true))
    slide = float(pos_true[-1, 0] - pos_true[0, 0])
    print(f"observed: slid {slide * 1e3:.1f} mm at mu*={args.mu_true}")

    @jax.jit
    def loss_and_grad(mu):
        def L(m):
            pos, vb = rollout(m)
            return (jnp.sum((pos - pos_true) ** 2)
                    + jnp.sum((vb - vb_true) ** 2))
        return jax.value_and_grad(L)(mu)

    # gradient descent with clipped steps + Armijo backtracking: the
    # landscape is steep below μ* (sliding regime, |dL|~5) and nearly
    # flat above it (stuck regime, |dL|~0.015) — no fixed lr fits both
    mu, lr = float(args.mu_init), 3.0
    L, dL = (float(x) for x in loss_and_grad(jnp.float64(mu)))
    t0 = time.time()
    for i in range(args.gd_iters):
        while True:
            cand = float(np.clip(mu - np.clip(lr * dL, -0.15, 0.15),
                                 0.01, 2.0))
            Lc, dLc = (float(x) for x in loss_and_grad(jnp.float64(cand)))
            if Lc <= L or abs(cand - mu) < 1e-12:
                mu, L, dL, lr = cand, Lc, dLc, lr * 1.3
                break
            lr *= 0.5
        if i % 5 == 0 or i == args.gd_iters - 1:
            print(f"  it {i:3d}  loss {L:.3e}  mu {mu:.4f}")
    dt_wall = time.time() - t0
    err = abs(float(mu) - args.mu_true)
    print(f"identified mu = {float(mu):.4f} (true {args.mu_true}, "
          f"|err| {err:.1e}) in {dt_wall:.1f}s")
    assert err < 5e-3, "friction identification failed"


if __name__ == "__main__":
    main()
