#!/usr/bin/env python
"""Massively-parallel RL locomotion training on the environment layer.

Trains an ant quadruped to run (+x) with antithetic evolution strategies:
one ``GroundEnv`` built straight from MJCF (`envs.make_ground_env` — foot
sites, actuator gears, limits, routing all automatic), a linear policy
obs → ctrl, and EVERY rollout of every perturbation in ONE batched
dispatch — P perturbations × E environments = one fused-stepper batch per
timestep on TPU (`ops/kernels/contact_fused.py`).

This is the serving shape the TPU build exists for: policy search where
the simulator is the bottleneck. With B = 4096 environments the v5e steps
~1.2e7 env-steps/s through the fused kernel — one 40-generation run of
this script is ~50M simulated steps.

Run:  python examples/rl_locomotion.py --cpu --pop 4 --envs 2 --steps 40 \
          --gens 3            # CPU smoke (~1 min)
      python examples/rl_locomotion.py --pop 32 --envs 128 --steps 250 \
          --gens 40           # TPU training run
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
    ap.add_argument("--pop", type=int, default=32,
                    help="ES perturbations (antithetic pairs: 2x this)")
    ap.add_argument("--envs", type=int, default=128,
                    help="environments per perturbation")
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--gens", type=int, default=40)
    ap.add_argument("--dt", type=float, default=4e-3)
    ap.add_argument("--sigma", type=float, default=0.05)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--iters", type=int, default=12,
                    help="PGS iterations per step")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    env = g.make_ground_env(zoo.ant_mjcf(), dt=args.dt, iters=args.iters,
                            init_height=0.55, min_height=0.2)
    print(f"env: kind={env.kind} n={env.model.n} n_ctrl={env.n_ctrl} "
          f"contacts={env.n_contacts}")

    obs_dim = int(env.observation(env.reset(1)).shape[1])
    n_ctrl = env.n_ctrl
    P2 = 2 * args.pop                       # antithetic population
    B = P2 * args.envs                      # simulator batch
    print(f"population {P2} x {args.envs} envs = batch {B}, "
          f"{args.steps} steps/gen")

    # linear policy: ctrl = tanh(obs @ W + b), params theta = (W, b)
    def policy(theta, obs):                 # obs (..., obs_dim)
        W, b = theta
        return jnp.tanh(obs @ W + b)

    theta0 = (jnp.zeros((obs_dim, n_ctrl)), jnp.zeros(n_ctrl))
    from jax.flatten_util import ravel_pytree
    flat0, unravel = ravel_pytree(theta0)
    dim = flat0.shape[0]

    def episode_return(thetas_flat, state0):
        """thetas_flat (P2, dim); state0: batch-B env state grouped as
        (P2, E) blocks. Returns (P2,) mean episode reward per policy."""
        Ws = jax.vmap(unravel)(thetas_flat)

        def step_fn(carry, _):
            state, ret, alive = carry
            obs = env.observation(state)                    # (B, obs_dim)
            obs_g = obs.reshape(P2, args.envs, obs_dim)
            ctrl = jax.vmap(policy)(Ws, obs_g).reshape(B, n_ctrl)
            state2, _ = env.step(state, ctrl)
            # reward: forward body-x velocity in the WORLD frame − ctrl
            # cost − 0.5 per fallen step
            quat, pos = env.base_pose(state2)
            vb = env.base_velocity(state2)
            from gridcodegenerator_tpu.ops.freeflyer import quat_to_rot
            vx_w = jax.vmap(lambda w, v: (quat_to_rot(w) @ v[3:])[0])(
                quat, vb)
            # clip the velocity reward (a blown-up PGS state must not pay)
            # and gate with where so a NaN'd dead environment contributes
            # exactly 0, not NaN (0 * nan == nan)
            vx_w = jnp.clip(jnp.nan_to_num(vx_w), -10.0, 10.0)
            falling = env.fallen(state2) | ~jnp.isfinite(
                env.base_pose(state2)[1][:, 2])
            alive = alive & ~falling
            r = jnp.where(alive,
                          vx_w - 0.005 * jnp.sum(ctrl**2, axis=1),
                          jnp.where(falling, -0.5, 0.0))
            return (state2, ret + r, alive), None

        alive0 = jnp.ones(B, bool)
        (_, ret, _), _ = jax.lax.scan(
            step_fn, (state0, jnp.zeros(B), alive0), None,
            length=args.steps)
        return ret.reshape(P2, args.envs).mean(axis=1)

    @jax.jit
    def generation(flat, eps, state0):
        """One ES update: antithetic perturbations, rank-free weighting by
        normalized returns."""
        thetas = jnp.concatenate([flat[None] + args.sigma * eps,
                                  flat[None] - args.sigma * eps])
        rets = episode_return(thetas, state0)               # (P2,)
        r_pos, r_neg = rets[:args.pop], rets[args.pop:]
        adv = r_pos - r_neg                                 # (pop,)
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        grad = (adv[:, None] * eps).mean(axis=0) / args.sigma
        return flat + args.lr * grad, rets.mean(), rets.max()

    flat = flat0
    rng = np.random.default_rng(0)
    t_setup = time.time()
    for gen in range(args.gens):
        eps = jnp.asarray(rng.normal(size=(args.pop, dim)), jnp.float32)
        state0 = env.reset(B, seed=1000 + gen)
        flat, r_mean, r_max = generation(flat, eps, state0)
        r_mean, r_max = float(r_mean), float(r_max)
        now = time.time()
        sps = B * args.steps / max(now - t_setup, 1e-9)
        t_setup = now
        print(f"gen {gen:3d}  mean return {r_mean:8.3f}  "
              f"best {r_max:8.3f}  ({sps:.2e} env-steps/s)")

    # final greedy evaluation
    theta = unravel(flat)
    state = env.reset(256, seed=99)
    dist0 = np.asarray(env.base_pose(state)[1][:, 0])
    for _ in range(args.steps):
        ctrl = jnp.nan_to_num(policy(theta, env.observation(state)))
        state, _ = env.step(state, ctrl)
    dist = np.asarray(env.base_pose(state)[1][:, 0]) - dist0
    dist = dist[np.isfinite(dist)]
    print(f"greedy policy: mean +x displacement over {args.steps} steps "
          f"({args.steps * args.dt:.2f} s): {dist.mean():.3f} m "
          f"(p90 {np.percentile(dist, 90):.3f} m)")


if __name__ == "__main__":
    main()
