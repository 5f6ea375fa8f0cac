#!/usr/bin/env python
"""Throughput of the second-order derivative family (``ops/so.py``) on the
real chip: batched ``forward_dynamics_hessian`` (full (n, 3n, 3n) tensors)
and ``forward_dynamics_hessian_vp`` (the DDP contraction) on iiwa-14.

With ``impl="auto"`` on TPU these route to the fused Hessian kernel
(``ops/kernels/so_fused.py`` — primal gradient pipeline + all 3n tangent
sweeps in one ``pallas_call`` per tile) when the robot fits a VMEM tile;
``--impl bl`` forces the batch-last XLA formulation
(``ops/so.py::forward_dynamics_hessian_bl``) and ``--impl vmap`` the vmap
nest, to A/B the three tiers.

Same wall-bounded, marginal-slope protocol as run_benchmarks.py. Prints
JSON rows. Usage: python benchmarks/bench_so.py [--batches 16384 ...]
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
from run_benchmarks import time_fn  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--robots", nargs="*", default=["iiwa14"])
    p.add_argument("--batches", nargs="*", type=int, default=[16384, 65536])
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--impl", default="auto",
                   choices=["auto", "bl", "vmap"])
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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    for name in args.robots:
        model = g.load_robot(getattr(zoo, name)(damping=0.1),
                             dtype=jnp.float32)
        n = model.n
        for B in args.batches:
            rng = np.random.default_rng(0)
            q, qd, u, lam = (jnp.asarray(rng.uniform(-1, 1, (B, n)),
                                         jnp.float32) for _ in range(4))

            impl = args.impl
            cases = {
                "fd_hessian": (lambda m, a, b, c, d:
                               g.forward_dynamics_hessian(m, a, b, c,
                                                          impl=impl)),
                "fd_hessian_vp": (lambda m, a, b, c, d:
                                  g.forward_dynamics_hessian_vp(
                                      m, a, b, c, d, impl=impl)),
            }
            if B * n * 9 * n * n * 4 > 5e8:
                # the full rank-3 tensor alone is >0.5 GB per call; the
                # rep-enqueued timing loop keeps several alive and OOMs
                # HBM — only the contracted DDP form is a sane product
                # shape at this batch
                del cases["fd_hessian"]
                print(f"# B={B}: full-Hessian output too large to "
                      "rep-time, vp only", file=sys.stderr, flush=True)
            for label, fn in cases.items():
                jfn = jax.jit(fn)
                t0 = time.time()
                out = jax.block_until_ready(jfn(model, q, qd, u, lam))
                print(f"# {label} B={B} compile+run {time.time()-t0:.1f}s "
                      f"out {out.shape}", file=sys.stderr, flush=True)
                med, mn = time_fn(jfn, (model, q, qd, u, lam),
                                  reps=args.reps)
                print(json.dumps({
                    "case": label, "robot": name, "batch": B,
                    "impl": impl, "median_s": med, "evals_per_s": B / med,
                }), flush=True)


if __name__ == "__main__":
    main()
