#!/usr/bin/env python
"""A/B: the K2′ single-kernel dense M⁻¹+q̈ (CRBA + active-region Cholesky)
vs the articulated K2/K3/densify recursion inside the staged ∇FD, and the
standalone dense-M⁻¹ kernel vs the lane-tile recursion kernel.

The md pipeline's K2md (same construction, ``multidof_staged.
md_minv_qdd_fused``) measured 3× fewer wide-op flops than full-width
factor+solve and a 13% staged-∇FD gain; this is the fixed-base port
(``ops/kernels/staged.py::minv_qdd_dense_staged``).

Same wall-bounded, marginal-slope protocol as run_benchmarks.py. Prints
JSON rows. Usage: python benchmarks/bench_dense_minv.py [--batches ...]
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
    from gridcodegenerator_tpu.ops import blops
    from gridcodegenerator_tpu.ops.kernels.fused import _pallas_batch_call

    def _minv_lane(q):
        """The pre-dense production path: articulated recursion on a lane
        tile (bypasses minv_fused's new dense routing for the A/B)."""
        def body(km, q):
            X = blops.joint_transforms_bl(km, q)
            rows, _, _ = blops.minv_bl(km, X)
            return (blops.densify_rows(rows),)
        (M,) = _pallas_batch_call(model, body, [q], [(n, n)], None,
                                  False, lane_tile=True)
        return M

    def _fd_lane(q, qd, u):
        def body(km, q, qd, u):
            return (blops.fd_bl(km, q, qd, u, -9.81),)
        (qdd,) = _pallas_batch_call(model, body, [q, qd, u], [(n,)], None,
                                    False, lane_tile=True)
        return qdd

    for B in args.batches:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-2, 2, (n, B)), jnp.float32)
        qd = jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
        u = jnp.asarray(rng.uniform(-8, 8, (n, B)), jnp.float32)
        cases = [
            ("fd_grad dense", lambda q, qd, u: staged.fd_grad_staged(
                model, q, qd, u, minv_impl="dense")),
            ("fd_grad dense mergeaf", lambda q, qd, u: staged.
             fd_grad_staged(model, q, qd, u, minv_impl="dense",
                            merge_af=True)),
            ("fd_grad recursion", lambda q, qd, u: staged.fd_grad_staged(
                model, q, qd, u, minv_impl="recursion")),
            ("minv dense-kernel", lambda q, qd, u: staged.
             minv_qdd_dense_staged(model, q)[0]),
            ("minv lane-recursion", lambda q, qd, u: _minv_lane(q)),
            ("fd factor-solve", lambda q, qd, u: staged.fd_dense_staged(
                model, q, qd, u)),
            ("fd lane-recursion", lambda q, qd, u: _fd_lane(q, qd, u)),
        ]
        outs = {}
        for tag, fn in cases:
            jfn = jax.jit(fn)
            med, mn = time_fn(jfn, (q, qd, u), args.reps)
            eps = B / med
            outs[tag] = jfn(q, qd, u)
            print(json.dumps(dict(robot=args.robot, n=n, batch=B,
                                  case=tag, median_ms=med * 1e3,
                                  min_ms=mn * 1e3, evals_per_sec=eps)))
            print(f"# {args.robot} B={B:6d} {tag:20s} "
                  f"{med*1e3:9.3f} ms  {eps:12.3e} evals/s",
                  file=sys.stderr, flush=True)
        # parity between the two fd_grad arms (on-device reduce, two scalars)
        for side, a, b in zip(("ddq", "ddqd"), outs["fd_grad dense"],
                              outs["fd_grad recursion"]):
            scale = float(jnp.abs(a).max())
            rel = float(jnp.abs(a - b).max()) / max(1.0, scale)
            print(json.dumps(dict(robot=args.robot, batch=B, side=side,
                                  dense_vs_recursion_rel=rel, scale=scale)))
            print(f"# parity {side}: rel err {rel:.3e} (scale {scale:.3e})",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
