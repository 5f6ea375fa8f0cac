#!/usr/bin/env python
"""Multi-dof family throughput on TPU: generalized FD and tangent-space
gradients (fused single-tile kernels and, past the VMEM gate, the
column-blocked staged md pipeline).

Cases (``--robots``):
* ``ball_arm``   — ball + 1-dof mix (n=5, nv=7): fused single-tile kernels
* ``free_iiwa``  — in-tree floating joint (n=8, nv=13): fused single-tile
* ``free_atlas`` — humanoid free-flyer (n=29, nv=34): the staged pipeline
                   (`ops/kernels/multidof_staged.py`) — the batched public
                   entries auto-route here past `md_grad_workset_ok`

Same wall-bounded, marginal-slope protocol as run_benchmarks.py. Prints
JSON rows. Usage: python benchmarks/bench_multidof.py [--batches ...]
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
    p.add_argument("--robots", nargs="*", default=["free_atlas"],
                   choices=["ball_arm", "free_iiwa", "free_atlas"])
    p.add_argument("--algs", nargs="*", default=["fd", "id_grad", "fd_grad"],
                   choices=["fd", "id_grad", "fd_grad"])
    p.add_argument("--batches", nargs="*", type=int, default=[16384, 262144])
    p.add_argument("--reps", type=int, default=12)
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
    from gridcodegenerator_tpu.ops import multidof as md

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    urdfs = {
        "ball_arm": lambda: zoo.ball_arm(damping=0.1),
        "free_iiwa": lambda: zoo.with_free_joint(zoo.iiwa14(damping=0.1)),
        "free_atlas": lambda: zoo.with_free_joint(zoo.atlas(damping=0.05)),
    }
    algs = {
        "fd": lambda m: jax.jit(lambda q, qd, u: md.md_forward_dynamics_batched(
            m, q, qd, u, impl="pallas")),
        "id_grad": lambda m: jax.jit(lambda q, qd, u: md.md_id_grad_batched(
            m, q, qd, u, impl="pallas")),
        "fd_grad": lambda m: jax.jit(
            lambda q, qd, u: md.md_forward_dynamics_gradient_batched(
                m, q, qd, u, impl="pallas")),
    }

    for robot in args.robots:
        model = md.multidof_model_from_description(
            g.parse_urdf(urdfs[robot]()), dtype=jnp.float32)
        n, nv, nq = model.n_joints, model.nv, model.nq
        for B in args.batches:
            # on-device input generation: no multi-MB transfers through the
            # tunnel; q near neutral with normalized quaternion blocks
            key = jax.random.PRNGKey(0)
            k1, k2, k3 = jax.random.split(key, 3)
            q0 = jnp.tile(jnp.asarray(md.neutral_q(model))[None, :], (B, 1))
            dq = jax.random.uniform(k1, (B, nv), jnp.float32, -0.4, 0.4)
            q = jax.vmap(lambda a, b: md.md_tangent_apply(model, a, b))(
                q0, dq)
            qd = jax.random.uniform(k2, (B, nv), jnp.float32, -0.6, 0.6)
            u = jax.random.uniform(k3, (B, nv), jnp.float32, -5.0, 5.0)
            q.block_until_ready()
            for name in args.algs:
                fn = algs[name](model)
                med, mn = time_fn(fn, (q, qd, u), args.reps)
                eps = B / med
                print(json.dumps(dict(robot=robot, n=n, nv=nv, nq=nq,
                                      batch=B, alg=name,
                                      median_ms=med * 1e3, min_ms=mn * 1e3,
                                      evals_per_sec=eps)))
                print(f"# {robot:10s} nv={nv:2d} B={B:6d} {name:8s} "
                      f"{med*1e3:9.3f} ms  {eps:12.3e} evals/s",
                      file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
