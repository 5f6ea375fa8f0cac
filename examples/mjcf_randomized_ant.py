#!/usr/bin/env python
"""MJCF intake → collision extraction → randomized parallel RL environments.

One pipeline through three layers that compose:

1. ``parse_mjcf`` / ``mjcf_collision_model`` load a MuJoCo-style quadruped
   "ant" (`zoo.ant_mjcf()` — degree-mode eulers, <default> classes,
   geom-derived inertia) and extract its geoms: the torso sphere rides the
   FLOATING BASE (link -1 — the jointless-root-body idiom), the leg
   capsules their links; candidate pairs are trimmed to the ones that can
   actually touch (shin-shin crossings + torso-shin folds).
2. A homogeneous fleet drops onto the ground plane and crouch-holds under a
   PD controller — `fb_step_ground_batched` in ONE `lax.scan`, per-env
   friction, collision cone rows in the same PGS solve (the fused kernel
   path on TPU).
3. A domain-randomized fleet (`randomize_model`: per-env link masses ±25 %,
   damping ±50 %) runs the same physics through `vmap_model` — exact
   per-environment dynamics, the sim-to-real training shape.

Run:  python examples/mjcf_randomized_ant.py --cpu --envs 8 --steps 300
"""

import argparse
import dataclasses
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--rand-envs", type=int, default=4)
    ap.add_argument("--dt", type=float, default=1e-3)
    ap.add_argument("--iters", type=int, default=30,
                    help="PGS iterations (drop to ~10 for CPU smoke runs)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.cpu else jnp.float32

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import collision as col
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff
    from gridcodegenerator_tpu.utils import randomize as rz

    # ---- 1. MJCF intake ---------------------------------------------------
    src = zoo.ant_mjcf()
    desc, cm = g.mjcf_collision_model(src, dtype=dtype)
    ffm = ff.free_flyer_model(desc, dtype=dtype)
    n = ffm.n
    # foot anchors straight from the document's <site> tags; motor
    # saturation from the <actuator> block (gear * ctrlrange)
    sites = g.mjcf_sites(src)
    foot_sites = [sites[f"foot{k}"] for k in range(4)]
    feet = tuple(s.link for s in foot_sites)
    offs = np.stack([s.pos for s in foot_sites])
    act = g.mjcf_actuators(src)
    tau_max = jnp.asarray(
        np.abs(act.gear_matrix()) @ np.maximum(np.abs(act.ctrl_lower),
                                               np.abs(act.ctrl_upper)),
        dtype)
    # trim the auto candidate set to the pairs that can actually touch in a
    # crouch: shin-shin crossings + torso(base geom)-shin folds
    shin_g = [i for i, l in enumerate(cm.geoms.links) if l in feet]
    torso_g = [i for i, l in enumerate(cm.geoms.links) if l < 0]
    pairs = ([(a, b) for k, a in enumerate(shin_g) for b in shin_g[k + 1:]]
             + [(t, s) for t in torso_g for s in shin_g])
    cm = col.make_collision_model(cm.geoms, pairs=pairs)
    print(f"ant: n={n} joints, base mass "
          f"{float(desc.base_inertia[5, 5]):.1f} kg, "
          f"{len(cm.geoms.links)} collision geoms "
          f"({len(torso_g)} on the base), {len(cm.pairs)} self-pairs")

    # crouch target inside the knee range; PD gains
    q_hold = jnp.asarray(np.tile([0.0, 0.9], 4), dtype)
    kp, kd = 40.0, 2.0
    B = args.envs
    rng = np.random.default_rng(0)
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (B, 1))
    pos = jnp.asarray(np.column_stack([
        rng.uniform(-0.5, 0.5, (B, 2)),
        0.45 + rng.uniform(0.0, 0.1, B)[:, None]]).reshape(B, 3), dtype)
    q0 = jnp.tile(q_hold, (B, 1)) + jnp.asarray(
        rng.uniform(-0.05, 0.05, (B, n)), dtype)
    state0 = (quat, pos, q0, jnp.zeros((B, 6), dtype),
              jnp.zeros((B, n), dtype))
    # explicit (B, k_feet) so per-env friction is unambiguous at any B
    mus = jnp.tile(jnp.asarray(rng.uniform(0.5, 1.1, B), dtype)[:, None],
                   (1, len(feet)))

    # ---- 2. homogeneous fleet (fast path) ---------------------------------
    @jax.jit
    def roll(state):
        def step(s, _):
            tau = ct.pd_torque(s[2], s[4], q_hold, kp=kp, kd=kd)
            tau = jnp.clip(tau, -tau_max, tau_max)   # motor saturation
            nxt, imp = ct.fb_step_ground_batched(
                ffm, s, tau, args.dt, feet, offs, mu=mus, collision=cm,
                mu_collision=0.8, iters=args.iters)
            return nxt, imp[..., 2].sum(-1)
        return jax.lax.scan(step, state, None, length=args.steps)

    t0 = time.time()
    stateT, fz = jax.block_until_ready(roll(state0))
    t_first = time.time() - t0
    t0 = time.time()
    stateT, fz = jax.block_until_ready(roll(state0))
    dt_roll = time.time() - t0
    zT = np.asarray(stateT[1][:, 2])
    print(f"homogeneous fleet: {B} envs x {args.steps} steps "
          f"(compile+run {t_first:.1f}s, steady {dt_roll:.2f}s = "
          f"{B * args.steps / dt_roll:.3g} env-steps/s)")
    print(f"  settled heights z in [{zT.min():.3f}, {zT.max():.3f}] m, "
          f"mean normal impulse {float(fz.mean()):.2e}")
    assert np.isfinite(zT).all() and (zT > 0.1).all(), "ants fell through"

    # ---- 3. domain-randomized fleet (vmap tier) ---------------------------
    Br = args.rand_envs
    mb = rz.randomize_model(ffm.arm, jax.random.PRNGKey(1), Br,
                            inertia_scale=0.25, damping_scale=0.5)
    ffm_b = dataclasses.replace(ffm, arm=mb)
    mus_r = jnp.asarray(rng.uniform(0.5, 1.1, Br), dtype)

    def step1(fm, s, mu):
        tau = ct.pd_torque(s[2], s[4], q_hold, kp=kp, kd=kd)
        return ct.fb_step_ground(fm, s, tau, args.dt, feet, offs, mu=mu,
                                 iters=args.iters)[0]

    step_b = rz.vmap_model(step1, ffm_b, ffm)

    @jax.jit
    def roll_rand(state):
        return jax.lax.scan(lambda s, _: (step_b(s, mus_r), s[1][:, 2]),
                            state, None, length=args.steps)

    state_r0 = tuple(x[:Br] for x in state0)
    t0 = time.time()
    state_rT, z_hist = jax.block_until_ready(roll_rand(state_r0))
    t_rand = time.time() - t0
    z_r = np.asarray(state_rT[1][:, 2])
    print(f"randomized fleet: {Br} envs, per-env masses ±25% / damping "
          f"±50% / mu, {t_rand:.1f}s compile+run")
    print(f"  per-env settle heights: {np.round(z_r, 3)} "
          f"(spread {z_r.max() - z_r.min():.3f} m from the randomization)")
    assert np.isfinite(z_r).all() and (z_r > 0.1).all()
    print("ok")


if __name__ == "__main__":
    main()
