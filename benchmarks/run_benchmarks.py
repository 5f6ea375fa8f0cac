#!/usr/bin/env python
"""Full benchmark harness: per-algorithm × per-robot × batch-size timing.

The TPU analog of the reference's ``*_single_timing`` kernels/hosts
(``/root/reference/algorithms/_inverse_dynamics.py:407-420,483-494``): each
algorithm is timed with ``block_until_ready`` walltiming after a compile
warm-up; results print as a table plus machine-readable JSON lines.

Usage:
    python benchmarks/run_benchmarks.py [--robots iiwa14 hyq] [--batches 1024 16384]
    python benchmarks/run_benchmarks.py --profile  # emit a jax.profiler trace
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def time_fn(fn, args, reps=20, trials=4):
    """Steady-state throughput: enqueue `reps` calls then force one scalar
    device→host read (``block_until_ready`` does not block through TPU
    tunnels — it returns on enqueue)."""
    out = fn(*args)  # compile
    first = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(first[(0,) * first.ndim])
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(first[(0,) * first.ndim])
        ts.append((time.perf_counter() - t0) / reps)
    return float(np.median(ts)), float(np.min(ts))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--robots", nargs="*", default=["iiwa14", "hyq", "atlas"])
    p.add_argument("--batches", nargs="*", type=int, default=[1024, 16384])
    p.add_argument("--dtype", default="float32")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--impl", default="auto", choices=["auto", "pallas", "vmap"])
    p.add_argument("--profile", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    dtype = jnp.dtype(args.dtype)
    print(f"# backend={jax.default_backend()} device={jax.devices()[0].device_kind}",
          file=sys.stderr)

    impl = args.impl
    algs = {
        "inverse_dynamics": (lambda m, q, qd, u: g.inverse_dynamics(m, q, qd, u, impl=impl), 3),
        "direct_minv": (lambda m, q, qd, u: g.direct_minv(m, q, impl=impl), 3),
        "forward_dynamics": (lambda m, q, qd, u: g.forward_dynamics(m, q, qd, u, impl=impl), 3),
        "inverse_dynamics_gradient": (lambda m, q, qd, u: g.inverse_dynamics_gradient(m, q, qd, u, impl=impl), 3),
        "forward_dynamics_gradient": (lambda m, q, qd, u: g.forward_dynamics_gradient(m, q, qd, u, impl=impl), 3),
    }

    rows = []
    for robot in args.robots:
        model = g.load_robot(zoo.ZOO[robot](), dtype=dtype)
        n = model.n
        for B in args.batches:
            rng = np.random.default_rng(0)
            q = jnp.asarray(rng.uniform(-2, 2, (B, n)), dtype)
            qd = jnp.asarray(rng.uniform(-1, 1, (B, n)), dtype)
            u = jnp.asarray(rng.uniform(-8, 8, (B, n)), dtype)
            for name, (fn, _) in algs.items():
                # api entry points jit internally (and resolve impl from the
                # concrete inputs) — no outer jit
                med, mn = time_fn(fn, (model, q, qd, u), args.reps)
                eps = B / med
                rows.append(dict(robot=robot, n=n, batch=B, alg=name,
                                 median_ms=med * 1e3, min_ms=mn * 1e3,
                                 evals_per_sec=eps))
                print(json.dumps(rows[-1]))
                print(f"# {robot:8s} n={n:2d} B={B:6d} {name:28s} "
                      f"{med*1e3:9.3f} ms  {eps:12.3e} evals/s", file=sys.stderr)

    if args.profile:
        import jax.profiler
        model = g.load_robot(zoo.ZOO[args.robots[0]](), dtype=dtype)
        n = model.n
        B = args.batches[-1]
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-2, 2, (B, n)), dtype)
        qd = jnp.asarray(rng.uniform(-1, 1, (B, n)), dtype)
        u = jnp.asarray(rng.uniform(-8, 8, (B, n)), dtype)
        jfn = jax.jit(lambda m, a, b, c: g.forward_dynamics_gradient(m, a, b, c))
        jax.block_until_ready(jfn(model, q, qd, u))
        with jax.profiler.trace("/tmp/grid_tpu_trace"):
            jax.block_until_ready(jfn(model, q, qd, u))
        print("# trace written to /tmp/grid_tpu_trace", file=sys.stderr)


if __name__ == "__main__":
    main()
