#!/usr/bin/env python
"""Differentiable-contact training throughput on TPU: reverse-mode BPTT
through the frictional ground stepper (HyQ, 4 feet, f32).

Measures ``jax.grad`` of a rollout loss through T steps of
``fb_step_ground_batched`` — the gradient a policy-learning /
system-identification loop consumes — for the two AD treatments of the
PGS cone solve:

* ``unroll``   — differentiate the stored sweeps (O(iters) saved
                 iterates per step, gradient of the truncated iteration);
* ``implicit`` — IFT fixed-point gradients (``ops/contact.py::
                 _pgs_implicit``): O(1) memory in iters, exact gradient
                 of the converged solution; backward adds 3k+m linearized
                 sweeps + one batched (3k+m)² LU per step.

Also rows the forward-only step at the same (B, iters) so the gradient
overhead factor is explicit. Same wall-bounded, marginal-slope protocol
as run_benchmarks.py; prints JSON rows.

Usage: python benchmarks/bench_diffcontact.py [--batches 4096 16384]
       [--horizon 8] [--iters 30] [--modes implicit unroll]
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
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from run_benchmarks import time_fn  # noqa: E402  (same slope protocol)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="*", type=int, default=[4096, 16384])
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--modes", nargs="*", default=["implicit", "unroll"])
    p.add_argument("--layout", default="bl", choices=["bl", "vmap"],
                   help="bl: batch-last XLA body (fast steady-state, "
                        "~30+ min first compile); vmap: vmapped "
                        "single-state body (compiles in ~1 min)")
    p.add_argument("--no-fwd", dest="fwd", action="store_false",
                   help="skip the forward-only baseline row")
    p.add_argument("--budget", type=float,
                   default=float(os.environ.get("BENCH_BUDGET_S", "480")))
    args = p.parse_args(argv)

    def _watchdog():
        time.sleep(args.budget)
        print("# watchdog: budget exhausted, partial results",
              file=sys.stderr, flush=True)
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

    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float32)
    n = ffm.n
    feet = (2, 5, 8, 11)
    foff = np.tile([0.35, 0.0, 0.0], (4, 1))
    T = args.horizon

    def states_for(B):
        quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (B, 1))
        pos = jnp.tile(jnp.asarray([0.0, 0, 0.58], jnp.float32), (B, 1))
        q = jnp.asarray(np.tile([-0.1, 0.7, -1.2], (B, 4)), jnp.float32)
        q = q + jnp.asarray(rng.uniform(-0.05, 0.05, (B, n)), jnp.float32)
        vb = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 6)), jnp.float32)
        qd = jnp.asarray(rng.uniform(-0.3, 0.3, (B, n)), jnp.float32)
        tau = jnp.asarray(rng.uniform(-10, 10, (B, n)), jnp.float32)
        return (quat, pos, q, vb, qd), tau

    def step_batched(s, tau, mode):
        # implicit mode forces the XLA batch-last body (the fused kernel
        # has no AD rule); unroll must run the SAME body for a fair A/B.
        # --layout vmap trades steady-state rate for a ~30x faster
        # compile (the single-state body is a few hundred HLOs that vmap
        # re-shapes; the batch-last body unrolls ~20k lane ops).
        if args.layout == "bl":
            return ct.fb_step_ground_batched(
                ffm, s, tau, 1e-3, feet, foff, mu=0.8, iters=args.iters,
                impl="xla", diff_mode=mode)[0]
        one = lambda s1, t1: ct.fb_step_ground(
            ffm, s1, t1, 1e-3, feet, foff, mu=0.8, iters=args.iters,
            diff_mode=mode)[0]
        return jax.vmap(one)(s, tau)

    def make_grad(mode, B):
        def rollout_loss(tau, state):
            def step(s, _):
                return step_batched(s, tau, mode), None
            (quatT, posT, qT, vbT, qdT), _ = jax.lax.scan(
                step, state, None, length=T)
            return jnp.sum(vbT ** 2) + jnp.sum((posT[:, 2] - 0.58) ** 2)

        return jax.jit(jax.grad(rollout_loss))

    for B in args.batches:
        state, tau = states_for(B)
        if args.fwd:
            fwd = jax.jit(lambda s, t: step_batched(s, t, "unroll")[2])
            med, mn = time_fn(fwd, (state, tau), reps=args.reps * 2)
            row = dict(case=f"ground_step_fwd_{args.layout}", n=n, batch=B,
                       iters=args.iters, median_ms=med * 1e3,
                       env_steps_per_sec=B / med)
            print(json.dumps(row))
            print(f"# fwd           B={B:6d}        {med*1e3:9.3f} ms  "
                  f"{B/med:10.3e} env-steps/s", file=sys.stderr)
        for mode in args.modes:
            gfn = make_grad(mode, B)
            med, mn = time_fn(gfn, (tau, state), reps=args.reps)
            rate = B * T / med
            row = dict(case=f"bptt_grad_{mode}_{args.layout}", n=n,
                       batch=B, horizon=T, iters=args.iters,
                       median_ms=med * 1e3, env_step_grads_per_sec=rate)
            print(json.dumps(row))
            print(f"# grad {mode:8s} B={B:6d} T={T:2d}  {med*1e3:9.3f} ms  "
                  f"{rate:10.3e} env-step-grads/s", file=sys.stderr)


if __name__ == "__main__":
    main()
