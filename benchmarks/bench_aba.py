#!/usr/bin/env python
"""A/B: fused ABA forward dynamics (O(n), ``ops/aba.py`` inside one Pallas
kernel) vs the production M⁻¹-composition FD (``forward_dynamics_fused`` —
articulated M⁻¹ recursion or dense CRBA+Cholesky depending on robot size)
and the plain-XLA batch-last ABA.

Same wall-bounded, marginal-slope protocol as run_benchmarks.py. Prints
JSON rows. Usage: python benchmarks/bench_aba.py [--robots ...] [--batches ...]
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
    p.add_argument("--robots", nargs="*", default=["iiwa14", "atlas"])
    p.add_argument("--freeflyer", action="store_true",
                   help="A/B the floating-base ABA vs the mass-matrix "
                        "Cholesky kernel instead of the fixed-base FD")
    p.add_argument("--multidof", action="store_true",
                   help="A/B the generalized (spherical/free-joint) ABA "
                        "vs the CRBA+Cholesky md kernel")
    p.add_argument("--batches", nargs="*", type=int, default=[16384, 262144])
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
    from gridcodegenerator_tpu.ops import aba as aba_ops
    from gridcodegenerator_tpu.ops.kernels import fused

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    if args.multidof:
        from gridcodegenerator_tpu.ops import multidof as md
        from gridcodegenerator_tpu.ops.kernels import multidof_fused as mf
        builders = {
            "ball_arm": lambda: zoo.ball_arm(damping=0.1),
            "free_iiwa": lambda: zoo.with_free_joint(
                zoo.iiwa14(damping=0.1)),
            "free_atlas": lambda: zoo.with_free_joint(
                zoo.atlas(damping=0.1)),
        }
        robots = [r for r in args.robots if r in builders] or list(builders)
        for name in robots:
            model = md.multidof_model_from_description(
                g.parse_urdf(builders[name]()), dtype=jnp.float32)
            nq, nv = model.nq, model.nv
            for B in args.batches:
                rng = np.random.default_rng(0)
                q0 = np.asarray(md.neutral_q(model))
                qB = jnp.asarray(np.tile(q0[:, None], (1, B)), jnp.float32)
                dq = jnp.asarray(rng.uniform(-0.8, 0.8, (nv, B)),
                                 jnp.float32)
                qB = jax.vmap(lambda qq, dd: md.md_tangent_apply(
                    model, qq, dd), in_axes=1, out_axes=1)(qB, dq)
                qd = jnp.asarray(rng.uniform(-1, 1, (nv, B)), jnp.float32)
                u = jnp.asarray(rng.uniform(-5, 5, (nv, B)), jnp.float32)
                cases = [
                    ("md_fd aba-fused", lambda q_, qd_, u_: mf.md_aba_fused(
                        model, q_, qd_, u_)),
                    ("md_fd crba-fused", lambda q_, qd_, u_: mf.md_fd_fused(
                        model, q_, qd_, u_)),
                ]
                for tag, fn in cases:
                    jfn = jax.jit(fn)
                    t0 = time.time()
                    jax.block_until_ready(jfn(qB, qd, u))
                    print(f"# {tag} B={B} compile+run {time.time()-t0:.1f}s",
                          file=sys.stderr, flush=True)
                    med, mn = time_fn(jfn, (qB, qd, u), args.reps)
                    print(json.dumps(dict(robot=name, nq=nq, nv=nv, batch=B,
                                          case=tag, median_ms=med * 1e3,
                                          min_ms=mn * 1e3,
                                          evals_per_sec=B / med)),
                          flush=True)
        return

    if args.freeflyer:
        from gridcodegenerator_tpu.ops import freeflyer as ffmod
        from gridcodegenerator_tpu.ops.kernels import contact_fused as cf
        for name in args.robots:
            ffm = ffmod.free_flyer_model(
                g.parse_urdf(zoo.ZOO[name](damping=0.1)), dtype=jnp.float32)
            n = ffm.n
            for B in args.batches:
                rng = np.random.default_rng(0)
                quat = rng.standard_normal((4, B))
                quat /= np.linalg.norm(quat, axis=0)
                quat = jnp.asarray(quat, jnp.float32)
                q, qd, tau = (jnp.asarray(rng.uniform(-1.5, 1.5, (n, B)),
                                          jnp.float32) for _ in range(3))
                vb = jnp.asarray(rng.uniform(-1, 1, (6, B)), jnp.float32)
                cases = [
                    ("fb_fd aba-fused", lambda *s: cf.fb_aba_fused(
                        ffm, *s)[1]),
                    ("fb_fd chol-fused", lambda *s: cf.fb_fd_fused(
                        ffm, *s)[1]),
                ]
                for tag, fn in cases:
                    jfn = jax.jit(fn)
                    t0 = time.time()
                    jax.block_until_ready(jfn(quat, q, vb, qd, tau))
                    print(f"# {tag} B={B} compile+run {time.time()-t0:.1f}s",
                          file=sys.stderr, flush=True)
                    med, mn = time_fn(jfn, (quat, q, vb, qd, tau), args.reps)
                    print(json.dumps(dict(robot=name, n=n, batch=B,
                                          case=tag, median_ms=med * 1e3,
                                          min_ms=mn * 1e3,
                                          evals_per_sec=B / med)),
                          flush=True)
        return

    for name in args.robots:
        model = g.load_robot(zoo.ZOO[name](damping=0.1), dtype=jnp.float32)
        n = model.n
        for B in args.batches:
            rng = np.random.default_rng(0)
            q = jnp.asarray(rng.uniform(-2, 2, (n, B)), jnp.float32)
            qd = jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
            u = jnp.asarray(rng.uniform(-8, 8, (n, B)), jnp.float32)
            cases = [
                ("fd aba-fused", lambda q, qd, u: fused.
                 forward_dynamics_aba_fused(model, q, qd, u)),
                ("fd minv-fused", lambda q, qd, u: fused.
                 forward_dynamics_fused(model, q, qd, u)),
                ("fd aba-xla", lambda q, qd, u: aba_ops.aba_bl(
                    model, q, qd, u)),
            ]
            outs = {}
            for tag, fn in cases:
                jfn = jax.jit(fn)
                t0 = time.time()
                outs[tag] = jax.block_until_ready(jfn(q, qd, u))
                print(f"# {tag} B={B} compile+run {time.time()-t0:.1f}s",
                      file=sys.stderr, flush=True)
                med, mn = time_fn(jfn, (q, qd, u), args.reps)
                print(json.dumps(dict(robot=name, n=n, batch=B, case=tag,
                                      median_ms=med * 1e3, min_ms=mn * 1e3,
                                      evals_per_sec=B / med)), flush=True)
            err = float(jnp.abs(outs["fd aba-fused"]
                                - outs["fd minv-fused"]).max())
            print(f"# {name} B={B} aba-vs-minv maxerr {err:.3e}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
