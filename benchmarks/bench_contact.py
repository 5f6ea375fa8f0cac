#!/usr/bin/env python
"""Contact-layer throughput on TPU: batched constrained FD.

Two deployment shapes:
* fixed-base pinned FD (iiwa-14, 1 pin): the manipulation-in-contact
  batch — M⁻¹ via the analytic recursion, 3×3 Delassus Cholesky;
* floating-base stance FD (HyQ, 4 feet): the legged-robot batch — an
  18×18 mass Cholesky + 12×12 Delassus per state (MXU-heavy batched
  linear algebra on top of the recursion layer).

Same wall-bounded, marginal-slope protocol as run_benchmarks.py. Prints
JSON rows. Usage: python benchmarks/bench_contact.py [--batches 16384 ...]
"""

import argparse
import json
import os
import pathlib
import sys
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from run_benchmarks import time_fn  # noqa: E402  (same slope protocol)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="*", type=int, default=[16384, 262144])
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--impl", default="auto",
                   choices=["auto", "pallas", "vmap"],
                   help="contact implementation (auto: fused kernel on TPU)")
    p.add_argument("--cases", nargs="*",
                   default=["pinned", "stance", "step"],
                   help="subset of {pinned, stance, step}")
    p.add_argument("--budget", type=float,
                   default=float(os.environ.get("BENCH_BUDGET_S", "480")))
    args = p.parse_args(argv)

    def _watchdog():
        time.sleep(args.budget)
        print("# watchdog: budget exhausted, partial results", file=sys.stderr,
              flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)

    # ---- fixed-base pinned FD: iiwa-14, 1 contact -------------------------
    model = g.load_robot(zoo.iiwa14(damping=0.1), dtype=jnp.float32)
    n = model.n
    links, offs = (n - 1,), jnp.asarray([[0.04, -0.03, 0.1]], jnp.float32)
    for B in (args.batches if "pinned" in args.cases else []):
        q = jnp.asarray(rng.uniform(-1, 1, (B, n)), jnp.float32)
        qd = jnp.asarray(rng.uniform(-1, 1, (B, n)), jnp.float32)
        u = jnp.asarray(rng.uniform(-4, 4, (B, n)), jnp.float32)
        fn = lambda a, b, c: g.constrained_forward_dynamics(
            model, a, b, c, links, offs)[0]
        med, mn = time_fn(fn, (q, qd, u), reps=args.reps)
        row = dict(case="pinned_fd_iiwa14", n=n, contacts=1, batch=B,
                   median_ms=med * 1e3, evals_per_sec=B / med)
        print(json.dumps(row))
        print(f"# pinned iiwa B={B:7d}  {med*1e3:9.3f} ms  "
              f"{B/med:11.3e} evals/s", file=sys.stderr)

    # ---- floating-base stance FD: HyQ, 4 feet -----------------------------
    # impl routing is automatic: on TPU this measures the fused Pallas
    # lane-tile kernel (ops/kernels/contact_fused.py), elsewhere the plain
    # XLA batch-last pipeline. --impl forces a path for A/B runs.
    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float32)
    nh = ffm.n
    feet = (2, 5, 8, 11)
    foff = jnp.asarray(np.tile([0.35, 0.0, 0.0], (4, 1)), jnp.float32)

    @jax.jit
    def stance_fd(quat, pos, q, vb, qd, tau):
        return ct.fb_constrained_fd_batched(
            ffm, quat, pos, q, vb, qd, tau, feet, foff, impl=args.impl)[1]

    def states_for(B):
        quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (B, 1))
        pos = jnp.tile(jnp.asarray([0.0, 0, 0.5], jnp.float32), (B, 1))
        q = jnp.asarray(np.tile([-0.1, 0.7, -1.2], (B, 4)), jnp.float32)
        q = q + jnp.asarray(rng.uniform(-0.05, 0.05, (B, nh)), jnp.float32)
        vb = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 6)), jnp.float32)
        qd = jnp.asarray(rng.uniform(-0.3, 0.3, (B, nh)), jnp.float32)
        tau = jnp.asarray(rng.uniform(-10, 10, (B, nh)), jnp.float32)
        return quat, pos, q, vb, qd, tau

    if "stance" in args.cases:
        for B in args.batches:
            quat, pos, q, vb, qd, tau = states_for(B)
            med, mn = time_fn(stance_fd, (quat, pos, q, vb, qd, tau),
                              reps=args.reps)
            row = dict(case="stance_fd_hyq", n=nh, contacts=4, batch=B,
                       impl=args.impl, median_ms=med * 1e3,
                       evals_per_sec=B / med)
            print(json.dumps(row))
            print(f"# stance hyq  B={B:7d}  {med*1e3:9.3f} ms  "
                  f"{B/med:11.3e} evals/s", file=sys.stderr)

    # ---- batched frictional ground stepper: HyQ, the parallel-RL shape ----
    # (VERDICT r2 #2: this op previously had correctness on CPU but no TPU
    # number — the fused kernel makes the XLA program a single pallas_call,
    # which is what lets it compile inside a tunnel-healthy window)
    @jax.jit
    def env_step(state, tau):
        return ct.fb_step_ground_batched(
            ffm, state, tau, 1e-3, feet, foff, mu=0.8, impl=args.impl)[0]

    if "step" in args.cases:
        for B in args.batches:
            quat, pos, q, vb, qd, tau = states_for(B)
            state = (quat, pos, q, vb, qd)
            med, mn = time_fn(lambda s, t: env_step(s, t)[2], (state, tau),
                              reps=args.reps)
            row = dict(case="ground_step_hyq", n=nh, contacts=4, batch=B,
                       impl=args.impl, median_ms=med * 1e3,
                       env_steps_per_sec=B / med)
            print(json.dumps(row))
            print(f"# step   hyq  B={B:7d}  {med*1e3:9.3f} ms  "
                  f"{B/med:11.3e} env-steps/s", file=sys.stderr)

    # ---- scan rollout: T fused steps per dispatch (RL inner loop) ---------
    if "rollout" in args.cases:
        T = 16
        B = min(args.batches)

        @jax.jit
        def roll(state, taus):
            return ct.fb_simulate_ground_batched(
                ffm, state, taus, 1e-3, feet, foff, mu=0.8,
                impl=args.impl)[0][2]

        quat, pos, q, vb, qd, tau = states_for(B)
        taus = jnp.broadcast_to(tau[None], (T,) + tau.shape)
        med, mn = time_fn(roll, ((quat, pos, q, vb, qd), taus),
                          reps=max(2, args.reps // 4))
        row = dict(case="ground_rollout_hyq", n=nh, contacts=4, batch=B,
                   horizon=T, impl=args.impl, median_ms=med * 1e3,
                   env_steps_per_sec=B * T / med)
        print(json.dumps(row))
        print(f"# roll   hyq  B={B:7d} T={T}  {med*1e3:9.3f} ms  "
              f"{B*T/med:11.3e} env-steps/s", file=sys.stderr)

    # ---- heightfield terrain stepper: bumpy ground, XLA batch-last body ---
    # (the fused kernel bakes the flat plane; terrain= forces the XLA body,
    # so this row is the uneven-ground RL-env cost, incl. the 4-node
    # bilinear gathers per foot)
    if "terrain" in args.cases:
        from gridcodegenerator_tpu.ops import terrain as tr

        terr = tr.bumpy_terrain(amp=0.04, wavelength=1.1, extent=6.0,
                                cell=0.1, dtype=jnp.float32)

        @jax.jit
        def terr_step(state, tau):
            return ct.fb_step_ground_batched(
                ffm, state, tau, 1e-3, feet, foff, mu=0.8, impl="xla",
                terrain=terr)[0]

        for B in args.batches:
            quat, pos, q, vb, qd, tau = states_for(B)
            state = (quat, pos, q, vb, qd)
            med, mn = time_fn(lambda s, t: terr_step(s, t)[2], (state, tau),
                              reps=args.reps)
            row = dict(case="terrain_step_hyq", n=nh, contacts=4, batch=B,
                       median_ms=med * 1e3, env_steps_per_sec=B / med)
            print(json.dumps(row))
            print(f"# terr   hyq  B={B:7d}  {med*1e3:9.3f} ms  "
                  f"{B/med:11.3e} env-steps/s", file=sys.stderr)

    # ---- obstacle-rich stepper: ground + collision cone rows in-kernel ----
    # (r3s8: 4 leg capsules, cross-leg self pairs + one sphere obstacle =
    # 10 extra cone triplets per env, solved in the same VMEM-resident PGS
    # as the feet; impl routing as in "step")
    if "collision" in args.cases:
        from gridcodegenerator_tpu.ops import collision as col

        geoms = col.make_geoms(feet, a=np.zeros((4, 3)),
                               b=np.tile([0.3, 0, 0], (4, 1)), r=0.12)
        ball = col.make_obstacles(a=[[0.25, 0.05, 0.1]], r=0.3)
        cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                      obstacles=ball, min_separation=2)

        @jax.jit
        def col_step(state, tau):
            return ct.fb_step_ground_batched(
                ffm, state, tau, 1e-3, feet, foff, mu=0.8,
                collision=cm, mu_collision=0.5, impl=args.impl)[0]

        for B in args.batches:
            quat, pos, q, vb, qd, tau = states_for(B)
            state = (quat, pos, q, vb, qd)
            med, mn = time_fn(lambda s, t: col_step(s, t)[2], (state, tau),
                              reps=args.reps)
            row = dict(case="collision_step_hyq", n=nh,
                       contacts=4 + cm.n_contacts, batch=B, impl=args.impl,
                       median_ms=med * 1e3, env_steps_per_sec=B / med)
            print(json.dumps(row))
            print(f"# coll   hyq  B={B:7d}  {med*1e3:9.3f} ms  "
                  f"{B/med:11.3e} env-steps/s", file=sys.stderr)

    # ---- geom-vs-ground stepper: capsule feet + torso, in-kernel ----------
    # (r3s13: 4 shin capsules and the base torso capsule contact the plane
    # at their endpoint spheres — 10 extra cone triplets per env, the
    # MuJoCo-faithful quadruped contact shape; impl routing as in "step")
    if "groundgeoms" in args.cases:
        from gridcodegenerator_tpu.ops import collision as col

        gg = col.make_geoms((-1,) + feet,
                            a=[[-0.35, 0, -0.02]] + [[0, 0, 0]] * 4,
                            b=[[0.35, 0, -0.02]] + [[0.3, 0, 0]] * 4,
                            r=[0.18, 0.03, 0.03, 0.03, 0.03])
        kg = col.n_ground_contacts(gg)

        @jax.jit
        def gg_step(state, tau):
            return ct.fb_step_ground_batched(
                ffm, state, tau, 1e-3, feet, foff, mu=0.8,
                ground_geoms=gg, mu_ground=0.6, impl=args.impl)[0]

        for B in args.batches:
            quat, pos, q, vb, qd, tau = states_for(B)
            state = (quat, pos, q, vb, qd)
            med, mn = time_fn(lambda s, t: gg_step(s, t)[2], (state, tau),
                              reps=args.reps)
            row = dict(case="ground_geom_step_hyq", n=nh, contacts=4 + kg,
                       batch=B, impl=args.impl, median_ms=med * 1e3,
                       env_steps_per_sec=B / med)
            print(json.dumps(row))
            print(f"# ggeom  hyq  B={B:7d}  {med*1e3:9.3f} ms  "
                  f"{B/med:11.3e} env-steps/s", file=sys.stderr)


    # ---- multi-dof ground stepper: ball-hip ant, in-kernel ----------------
    # (r3s13: freejoint + 4×(ball ⊕ hinge) quadruped on frictional ground —
    # the generalized-joint RL-env shape; impl routing as in "step": on TPU
    # "auto" measures the fused md step kernel, ops/kernels/
    # md_contact_fused.py)
    if "md_step" in args.cases:
        from gridcodegenerator_tpu.ops import collision as col
        from gridcodegenerator_tpu.ops import md_contact as mc
        from gridcodegenerator_tpu.ops import multidof as md

        src = zoo.ball_ant_mjcf()
        mdm = md.multidof_model_from_description(g.parse_mjcf(src),
                                                 dtype=jnp.float32)
        sites = g.mjcf_sites(src)
        mfeet = tuple(sites[f"foot{k}"].link for k in range(4))
        moffs = np.stack([sites[f"foot{k}"].pos for k in range(4)])
        torso = col.make_geoms([0], a=[[0, 0, 0]], r=0.18)

        @jax.jit
        def md_env_step(q, qd, tau):
            return mc.md_step_ground_batched(
                mdm, q, qd, tau, 2e-3, mfeet, moffs, mu=0.7,
                ground_geoms=torso, mu_ground=0.6, impl=args.impl)[0]

        q0 = np.asarray(md.neutral_q(mdm), np.float64)
        for B in args.batches:
            d = jnp.asarray(rng.uniform(-0.25, 0.25, (B, mdm.nv)),
                            jnp.float32)
            q = jax.vmap(lambda t: md.md_tangent_apply(
                mdm, jnp.asarray(q0, jnp.float32), t))(d)
            q = q.at[:, 6].add(jnp.asarray(
                rng.uniform(0.0, 0.15, B), jnp.float32))
            qd = jnp.asarray(rng.uniform(-0.4, 0.4, (B, mdm.nv)),
                             jnp.float32)
            tau = jnp.asarray(rng.uniform(-3, 3, (B, mdm.nv)), jnp.float32)
            med, mn = time_fn(lambda a, b, c: md_env_step(a, b, c)[1],
                              (q, qd, tau), reps=args.reps)
            row = dict(case="md_step_ball_ant", nq=mdm.nq, nv=mdm.nv,
                       contacts=5, batch=B, impl=args.impl,
                       median_ms=med * 1e3, env_steps_per_sec=B / med)
            print(json.dumps(row))
            print(f"# mdstep ant  B={B:7d}  {med*1e3:9.3f} ms  "
                  f"{B/med:11.3e} env-steps/s", file=sys.stderr)


if __name__ == "__main__":
    main()
