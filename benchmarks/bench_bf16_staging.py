#!/usr/bin/env python
"""A/B: bf16 storage for the staged pipeline's inter-kernel HBM tensors.

ROADMAP experiment (mixed-precision exploration): the Atlas-scale staged
∇FD stages v/a/f (6,n,B) and M⁻¹ (n,n,B) through HBM between kernels,
and each K5 column-block launch re-reads them — the dominant repeated
traffic. ``stage_dtype=bfloat16`` halves those bytes while every kernel
computes in f32 (`ops/kernels/staged.py::fd_grad_staged`). This script
times both arms at the BENCHMARKS.md shapes and reports the on-device
parity delta (one scalar transfer — tunnel-safe).

Same wall-bounded, marginal-slope protocol as run_benchmarks.py. Prints
JSON rows. Usage: python benchmarks/bench_bf16_staging.py [--batches ...]
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
    p.add_argument("--robot", default="atlas")
    p.add_argument("--batches", nargs="*", type=int, default=[16384, 262144])
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--budget", type=float,
                   default=float(os.environ.get("BENCH_BUDGET_S", "900")))
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
    from gridcodegenerator_tpu.ops.kernels import staged

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    model = g.load_robot(zoo.ZOO[args.robot](), dtype=jnp.float32)
    n = model.n

    for B in args.batches:
        rng = np.random.default_rng(0)
        # batch-last (n, B): the staged pipeline's native layout
        q = jnp.asarray(rng.uniform(-2, 2, (n, B)), jnp.float32)
        qd = jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
        u = jnp.asarray(rng.uniform(-8, 8, (n, B)), jnp.float32)
        outs = {}
        for tag, sd in (("f32", None), ("bf16", jnp.bfloat16)):
            fn = jax.jit(lambda q, qd, u, sd=sd: staged.fd_grad_staged(
                model, q, qd, u, stage_dtype=sd))
            med, mn = time_fn(fn, (q, qd, u), args.reps)
            eps = B / med
            outs[tag] = fn(q, qd, u)
            print(json.dumps(dict(robot=args.robot, n=n, batch=B,
                                  alg="fd_grad_staged", stage_dtype=tag,
                                  median_ms=med * 1e3, min_ms=mn * 1e3,
                                  evals_per_sec=eps)))
            print(f"# {args.robot} B={B:6d} stage={tag:4s} "
                  f"{med*1e3:9.3f} ms  {eps:12.3e} evals/s",
                  file=sys.stderr, flush=True)
        # parity: reduce on device, transfer two scalars
        for side, a, b in zip(("ddq", "ddqd"), outs["f32"], outs["bf16"]):
            scale = float(jnp.abs(a).max())
            rel = float(jnp.abs(a - b).max()) / max(1.0, scale)
            print(json.dumps(dict(robot=args.robot, batch=B, side=side,
                                  bf16_rel_err=rel, scale=scale)))
            print(f"# parity {side}: rel err {rel:.3e} (scale {scale:.3e})",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
