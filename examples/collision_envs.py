#!/usr/bin/env python
"""Obstacle-rich parallel environments: batched quadrupeds dropped around a
capsule pillar, stepped with ground + collision contacts in one PGS solve.

Demonstrates the collision layer (``ops/collision.py``):
  * capsule geoms on the robot's legs (self-collision candidates picked by
    ``auto_pairs``),
  * a static world pillar every environment interacts with,
  * the batched frictional stepper with ``collision=`` — obstacle and
    self-collision impulses are extra cone rows in the same lane-parallel
    solver the feet use.

Run: python examples/collision_envs.py [--cpu] [--envs 512] [--steps 120]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--dt", type=float, default=5e-3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import collision as col
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops.freeflyer import free_flyer_model

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm = free_flyer_model(desc, dtype=jnp.float32)
    n = ffm.n

    # feet: the four distal links, contact at the link origin
    feet = tuple(range(n - 4, n))
    offsets = np.zeros((4, 3), np.float32)

    # body geometry: one sphere on the trunk-adjacent links of each leg
    geoms = col.make_geoms(list(range(4)), a=np.zeros((4, 3)), r=0.09)
    # world pillar: a vertical capsule at the arena center
    pillar = col.make_obstacles(a=[[0.35, 0.0, 0.0]], b=[[0.35, 0.0, 1.2]],
                                r=0.12)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=pillar)
    print(f"# {len(cm.pairs)} self pairs, {len(cm.obs_pairs)} obstacle "
          f"pairs per environment")

    B = args.envs
    rng = np.random.default_rng(0)
    state = (
        jnp.asarray(np.tile([1.0, 0, 0, 0], (B, 1)), jnp.float32),
        jnp.asarray(np.column_stack([
            rng.uniform(-0.15, 0.15, B), rng.uniform(-0.15, 0.15, B),
            rng.uniform(0.55, 0.65, B)]), jnp.float32),
        jnp.asarray(rng.uniform(-0.1, 0.1, (B, n)), jnp.float32),
        jnp.zeros((B, 6), jnp.float32),
        jnp.zeros((B, n), jnp.float32),
    )
    kp, kd = 60.0, 3.0
    q_ref = state[2]

    @jax.jit
    def rollout(state):
        def step(s, _):
            tau = ct.pd_torque(s[2], s[4], q_ref, kp, kd)
            s2, imp = ct.fb_step_ground_batched(
                ffm, s, tau, args.dt, feet, offsets, mu=0.7,
                collision=cm, mu_collision=0.4)
            return s2, imp
        return jax.lax.scan(step, state, None, length=args.steps)

    t0 = time.time()
    final, imps = jax.block_until_ready(rollout(state))
    wall = time.time() - t0
    # collision triplets are the trailing cm.n_contacts rows
    # (steps, B, n_obs_pairs) normal impulses → per-env any-contact flag
    obs_imp = np.asarray(imps)[..., len(feet) + len(cm.pairs):, 2]
    obs_imp = obs_imp.sum(axis=-1)
    gaps = col.fb_collision_rows_bl(
        ffm, final[0].T, final[1].T, final[2].T, cm)[0]
    gaps = np.asarray(gaps)[len(cm.pairs):]
    print(f"# {args.steps} steps x {B} envs in {wall:.1f}s "
          f"(compile included)")
    print(f"envs that touched the pillar: "
          f"{int((obs_imp.sum(0) > 0).sum())}/{B}")
    print(f"final pillar clearance: min {gaps.min():+.4f} m "
          f"(penetration tolerance ~ PGS erp recovery)")
    print(f"mean base height: {float(np.asarray(final[1])[:, 2].mean()):.3f} m")
    assert gaps.min() > -0.02, "deep pillar penetration — solver failure"


if __name__ == "__main__":
    main()
