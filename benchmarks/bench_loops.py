#!/usr/bin/env python
"""Throughput of the loop-closure layer (``ops/loops.py``) on the real chip:
batched closed-chain FD (vmap over the KKT solve) on the four-bar linkage,
and the floating four-bar (fb loops). Same wall-bounded marginal-slope
protocol as run_benchmarks.py. Prints JSON rows."""

import argparse
import json
import os
import pathlib
import sys
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from run_benchmarks import time_fn  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="*", type=int, default=[16384, 262144])
    p.add_argument("--reps", type=int, default=12)
    p.add_argument("--budget", type=float,
                   default=float(os.environ.get("BENCH_BUDGET_S", "900")))
    args = p.parse_args(argv)

    def _watchdog():
        time.sleep(args.budget)
        print(f"# watchdog: {args.budget:.0f}s budget exhausted",
              file=sys.stderr, flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import loops

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# backend={jax.default_backend()}", file=sys.stderr, flush=True)

    desc = g.parse_urdf(zoo.four_bar(damping=0.05))
    model = g.robot_model_from_description(desc, dtype=jnp.float32)
    names = desc.topology.link_names
    pairs = ((names.index("coupler"), names.index("rocker")),)
    oa = np.array([[0.8, 0.0, 0.0]], np.float32)
    ob = np.array([[0.0, 0.0, -0.5]], np.float32)

    @jax.jit
    def loop_fd_vmap(q, qd, u):
        return jax.vmap(lambda a, b, c: loops.loop_forward_dynamics(
            model, a, b, c, pairs, oa, ob, reg=1e-6)[0])(q, qd, u)

    @jax.jit
    def loop_fd_bl(q, qd, u):
        return loops.loop_fd_batched(model, q, qd, u, pairs, oa, ob,
                                     reg=1e-6)[0]

    cases = [("loop_fd_bl", loop_fd_bl, args.batches),
             ("loop_fd_vmap", loop_fd_vmap, args.batches[:1])]
    for case, fn, batches in cases:
        for B in batches:
            rng = np.random.default_rng(0)
            q, qd, u = (jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)),
                                    jnp.float32) for _ in range(3))
            t0 = time.time()
            out = jax.block_until_ready(fn(q, qd, u))
            print(f"# {case} B={B} compile+run {time.time()-t0:.1f}s "
                  f"out {out.shape}", file=sys.stderr, flush=True)
            med, mn = time_fn(fn, (q, qd, u), reps=args.reps)
            print(json.dumps({"case": case, "robot": "four_bar",
                              "batch": B, "median_s": med,
                              "evals_per_s": B / med}), flush=True)

    # closed chain ON frictional ground — bilateral rows inside the fused
    # step kernel's PGS solve vs the XLA batch-last body
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ffmod

    ffm = ffmod.free_flyer_model(desc, dtype=jnp.float32)
    glinks = (names.index("rocker"), names.index("crank"))
    goffs = np.array([[0.0, 0.0, -0.25], [0.0, 0.0, -0.25]])

    def step(impl):
        @jax.jit
        def f(state, tau):
            nxt, _ = ct.fb_step_ground_batched(
                ffm, state, tau, 1e-3, glinks, goffs, mu=0.8, iters=30,
                loops=(pairs, oa, ob), impl=impl)
            return nxt[3]                      # vb2: one small output
        return f

    for case, impl in (("loop_ground_step_fused", "pallas"),
                       ("loop_ground_step_xla", "vmap")):
        for B in args.batches:
            rng = np.random.default_rng(1)
            quat = rng.normal(size=(B, 4))
            quat /= np.linalg.norm(quat, axis=1, keepdims=True)
            state = tuple(jnp.asarray(x, jnp.float32) for x in (
                quat,
                rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.25],
                rng.uniform(-0.2, 0.2, (B, 3)),
                rng.uniform(-1, 1, (B, 6)),
                rng.uniform(-1, 1, (B, 3))))
            tau = jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32)
            fn = step(impl)
            t0 = time.time()
            out = jax.block_until_ready(fn(state, tau))
            print(f"# {case} B={B} compile+run {time.time()-t0:.1f}s "
                  f"out {out.shape}", file=sys.stderr, flush=True)
            med, mn = time_fn(fn, (state, tau), reps=args.reps)
            print(json.dumps({"case": case, "robot": "four_bar",
                              "batch": B, "median_s": med,
                              "env_steps_per_s": B / med}), flush=True)


if __name__ == "__main__":
    main()
