#!/usr/bin/env python
"""A/B: dense CRBA+Cholesky M⁻¹ inside the single-tile (2-D batch-tile)
∇FD kernel vs the articulated-recursion M⁻¹ it ships with — on the
headline robots (iiwa-14, HyQ), where standalone M⁻¹ is up to ~30% of the
∇FD pipeline time. Decides whether the dense-Cholesky pass (a measured
win on the Atlas lane-tile kernels, bench_dense_minv.py) should also be
the small-robot default.

Same wall-bounded, marginal-slope protocol as run_benchmarks.py. Prints
JSON rows. Usage: python benchmarks/bench_dense_headline.py
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
    p.add_argument("--robots", nargs="*", default=["iiwa14", "hyq"])
    p.add_argument("--batches", nargs="*", type=int, default=[262144])
    p.add_argument("--reps", type=int, default=16)
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
    from gridcodegenerator_tpu.ops import blops
    from gridcodegenerator_tpu.ops.kernels.contact_fused import (
        _chol_factor_act, _chol_minv_sym)
    from gridcodegenerator_tpu.ops.kernels.fused import (
        _default_block, _pallas_batch_call)

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    def dense_minv(km, X):
        return _chol_minv_sym(_chol_factor_act(blops.crba_bl(km, X), km.n),
                              km.n)

    for robot in args.robots:
        model = g.load_robot(zoo.ZOO[robot](), dtype=jnp.float32)
        n = model.n
        blk0 = _default_block(n, "fd_grad")
        blocks = sorted({b for b in (blk0, 1024) if b}, reverse=True)
        print(f"# {robot}: n={n} default_block={blk0}", file=sys.stderr)
        for B in args.batches:
            rng = np.random.default_rng(0)
            q = jnp.asarray(rng.uniform(-2, 2, (n, B)), jnp.float32)
            qd = jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
            u = jnp.asarray(rng.uniform(-8, 8, (n, B)), jnp.float32)
            outs = {}
            for tag, mfn in (("recursion", None), ("dense", dense_minv)):
                for blk in blocks:
                    def body(km, q, qd, u, mfn=mfn):
                        return blops.fd_grad_bl(km, q, qd, u, minv_fn=mfn)

                    fn = jax.jit(
                        lambda q, qd, u, body=body, blk=blk:
                        _pallas_batch_call(model, body, [q, qd, u],
                                           [(n, n), (n, n)], blk, False))
                    try:
                        med, mn = time_fn(fn, (q, qd, u), args.reps)
                    except Exception as e:
                        msg = str(e)
                        kind = ("VMEM-OOM" if "vmem" in msg.lower()
                                else type(e).__name__)
                        print(f"# {robot} B={B:6d} minv={tag:9s} blk={blk:4d}"
                              f"  FAILED ({kind})", file=sys.stderr,
                              flush=True)
                        continue
                    eps = B / med
                    outs[tag] = fn(q, qd, u)
                    print(json.dumps(dict(robot=robot, n=n, batch=B,
                                          block=blk,
                                          case=f"fd_grad minv={tag}",
                                          median_ms=med * 1e3,
                                          min_ms=mn * 1e3,
                                          evals_per_sec=eps)))
                    print(f"# {robot} B={B:6d} minv={tag:9s} blk={blk:4d}"
                          f" {med*1e3:9.3f} ms  {eps:12.3e} evals/s",
                          file=sys.stderr, flush=True)
            if len(outs) == 2:
                for side, a, b in zip(("ddq", "ddqd"), outs["recursion"],
                                      outs["dense"]):
                    rel = (float(jnp.abs(a - b).max())
                           / max(1.0, float(jnp.abs(a).max())))
                    print(f"# parity {side}: rel {rel:.3e}", file=sys.stderr,
                          flush=True)


if __name__ == "__main__":
    main()
