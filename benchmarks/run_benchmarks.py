#!/usr/bin/env python
"""Full benchmark harness: per-algorithm × per-robot × batch-size timing.

The TPU analog of the reference's ``*_single_timing`` kernels/hosts
(``/root/reference/algorithms/_inverse_dynamics.py:407-420,483-494``): each
algorithm is timed with ``block_until_ready`` walltiming after a compile
warm-up; results print as a table plus machine-readable JSON lines.

Usage:
    python benchmarks/run_benchmarks.py [--robots iiwa14 hyq] [--batches 1024 16384]
    python benchmarks/run_benchmarks.py --curve       # the BASELINE batch curve
                                                      # 1k…1M via map_batched
    python benchmarks/run_benchmarks.py --profile     # emit a jax.profiler trace

Every run is wall-clock bounded (--budget, default 480 s): partial results
always print, a wedged TPU tunnel cannot produce an empty run.
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


def time_fn(fn, args, reps=20, trials=4):
    """Steady-state *marginal* per-call time via a two-point slope (same
    protocol as ``bench.py``): per trial, wall an enqueue of ``lo`` and of
    ``reps`` calls, each closed by one scalar device→host read
    (``block_until_ready`` does not block through TPU tunnels — it returns
    on enqueue), and report (T_hi − T_lo)/(reps − lo). The subtraction
    cancels the tunnel's ~40 ms fixed sync round-trip, which otherwise
    dominates small-rep measurements."""

    def enqueue_and_sync(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(first[(0,) * first.ndim])
        return time.perf_counter() - t0

    enqueue_and_sync(1)  # compile + warm
    reps = max(int(reps), 2)  # the slope needs reps > lo
    lo = max(1, reps // 4)
    ts, ceilings = [], []
    for _ in range(trials):
        t_lo = enqueue_and_sync(lo)
        t_hi = enqueue_and_sync(reps)
        ts.append((t_hi - t_lo) / (reps - lo))
        ceilings.append(t_hi / reps)
    good = [t for t in ts if t > 0] or ceilings
    return float(np.median(good)), float(np.min(good))


def batch_curve(args, g, zoo, jnp):
    """The BASELINE per-batch curve (VERDICT #4): ∇FD evals/s at batch sizes
    1k…1M. Small batches are measured through ``map_batched`` (one dispatch,
    ``lax.map`` over chunk-sized micro-batches — the on-device amortization
    of the per-dispatch host/tunnel cost), exactly the deployment shape for
    a trajectory-optimizer inner loop; large batches are direct calls."""
    dtype = jnp.dtype(args.dtype)
    model = g.load_robot(zoo.ZOO[args.robots[0]](), dtype=dtype)
    n = model.n
    rng = np.random.default_rng(0)
    for B in (1000, 4000, 10_000, 65_536, 262_144, 1_048_576):
        q = jnp.asarray(rng.uniform(-2, 2, (B, n)), dtype)
        qd = jnp.asarray(rng.uniform(-1, 1, (B, n)), dtype)
        u = jnp.asarray(rng.uniform(-8, 8, (B, n)), dtype)
        if B <= 16_384:
            # K micro-batches of exactly B states, one dispatch: measures
            # per-chunk-of-B throughput with the dispatch cost amortized
            K = max(1, 131_072 // B)
            fn = lambda m, a, b, c: g.map_batched(
                g.forward_dynamics_gradient, m, a, b, c, chunk_size=B)
            argsK = (model, jnp.tile(q, (K, 1)), jnp.tile(qd, (K, 1)),
                     jnp.tile(u, (K, 1)))
            med, mn = time_fn(fn, argsK, reps=max(4, args.reps // 2))
            eps = K * B / med
            mode = f"map_batched chunk={B} K={K}"
        else:
            fn = lambda m, a, b, c: g.forward_dynamics_gradient(m, a, b, c)
            med, mn = time_fn(fn, (model, q, qd, u), reps=max(4, args.reps // 2))
            eps = B / med
            mode = "direct"
        print(json.dumps(dict(robot=args.robots[0], n=n, batch=B,
                              alg="forward_dynamics_gradient", mode=mode,
                              median_ms=med * 1e3, min_ms=mn * 1e3,
                              evals_per_sec=eps)))
        print(f"# curve B={B:8d} {mode:28s} {eps:12.3e} evals/s",
              file=sys.stderr)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--robots", nargs="*", default=["iiwa14", "hyq", "atlas"])
    p.add_argument("--batches", nargs="*", type=int, default=[1024, 16384])
    p.add_argument("--dtype", default="float32")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--impl", default="auto", choices=["auto", "pallas", "vmap"])
    p.add_argument("--profile", action="store_true")
    p.add_argument("--curve", action="store_true",
                   help="BASELINE batch curve 1k…1M on --robots[0]")
    p.add_argument("--budget", type=float,
                   default=float(os.environ.get("BENCH_BUDGET_S", "480")))
    args = p.parse_args(argv)

    def _watchdog():
        time.sleep(args.budget)
        print(f"# watchdog: {args.budget:.0f}s budget exhausted, exiting "
              "with partial results", file=sys.stderr, flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dtype = jnp.dtype(args.dtype)
    print(f"# backend={jax.default_backend()} device={jax.devices()[0].device_kind}",
          file=sys.stderr)

    if args.curve:
        batch_curve(args, g, zoo, jnp)
        return

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
