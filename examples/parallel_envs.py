#!/usr/bin/env python
"""Massively-parallel quadruped simulation: N frictional-contact
environments in one program (the RL-training deployment shape).

A fleet of HyQ robots is dropped from randomized heights/poses onto the
ground plane; a PD + stance-feedforward controller holds a crouch. All
environments advance in ONE `lax.scan` over time with the batch on the TPU
vector lanes (`fb_step_ground_batched`: shared mass factorization,
lane-parallel PGS friction-cone projection, per-environment contact masks).

Run:  python examples/parallel_envs.py --cpu --envs 16 --steps 600
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
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--dt", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)   # f64 on CPU
    import jax.numpy as jnp
    # on TPU the stepper routes to the fused Pallas kernel
    # (ops/kernels/contact_fused.py) in f32 — one kernel per 128-env tile
    dtype = jnp.float64 if args.cpu else jnp.float32

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    ffm = g.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                             dtype=dtype)
    n, B = ffm.n, args.envs
    feet = (2, 5, 8, 11)
    offs = jnp.asarray(np.tile([0.35, 0.0, 0.0], (4, 1)), dtype)
    rng = np.random.default_rng(0)

    q_stand = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4), dtype)
    foot_z = min(float(ct._fb_point_base(ffm, q_stand, l, offs[i])[0][2])
                 for i, l in enumerate(feet))
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (B, 1))
    pos = jnp.asarray(np.column_stack([
        rng.uniform(-1, 1, B), rng.uniform(-1, 1, B),
        -foot_z + rng.uniform(0.0, 0.05, B)]), dtype)
    q = jnp.asarray(np.tile(np.asarray(q_stand), (B, 1))
                    + rng.uniform(-0.05, 0.05, (B, n)), dtype)
    vb = jnp.zeros((B, 6), dtype)
    qd = jnp.zeros((B, n), dtype)

    X = ffm.arm.joint_transforms(q_stand)
    p_b, c_j = ff.fb_bias(ffm, X, ff.quat_to_rot(quat[0]), jnp.zeros(6),
                          jnp.zeros(n))
    J = ct.fb_contact_jacobian(ffm, quat[0], q_stand, feet, offs)
    tau_g = c_j - (J.T @ (jnp.linalg.pinv(J[:, :6].T) @ p_b))[6:]

    @jax.jit
    def rollout(state):
        def step(s, _):
            tau = tau_g[None] + 300.0 * (q_stand[None] - s[2]) - 20.0 * s[4]
            nxt, imp = g.fb_step_ground_batched(
                ffm, s, tau, args.dt, feet, offs, mu=0.9)
            return nxt, imp.reshape(B, 4, 3)[:, :, 2].sum(-1)
        return jax.lax.scan(step, state, None, length=args.steps)

    t0 = time.time()
    (quatT, posT, qT, vbT, qdT), fz = jax.block_until_ready(
        rollout((quat, pos, q, vb, qd)))
    wall = time.time() - t0
    rate = B * args.steps / wall
    m_tot = 60.96 + 4 * (2.93 + 2.638 + 0.881)

    settled = float(jnp.abs(vbT).max())
    heights = np.asarray(posT[:, 2])
    print(f"{B} environments x {args.steps} steps in {wall:.2f}s "
          f"(incl. compile): {rate:.3e} env-steps/s")
    print(f"final base heights: {heights.min():.3f}-{heights.max():.3f} m "
          f"(standing: {-foot_z:.3f})")
    print(f"max |vb| after settling: {settled:.4f} m/s")
    print(f"mean total ground reaction at T: "
          f"{float(jnp.mean(fz[-1])) / args.dt:.0f} N (weight {m_tot*9.81:.0f} N)")
    ok = (settled < 0.2 and np.all(np.isfinite(heights))
          and abs(heights.mean() + foot_z) < 0.05)
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
