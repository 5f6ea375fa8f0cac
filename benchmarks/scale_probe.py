#!/usr/bin/env python
"""Root-cause probe for the 2²⁰ batch-scaling regression (VERDICT r4 #4).

BENCH_r04 measured the fused iiwa ∇FD kernel at 12.9 ns/state (batch 2¹⁸)
but 15.0 ns/state (batch 2²⁰) — per-state time should be flat in a
tile-gridded kernel. Hypotheses, separated by construction here:

H1 (bench artifact): bench.py's ``run_batch`` regenerates the inputs with
    threefry ``jax.random.uniform`` INSIDE every timed call and returns a
    256-state parity head; the PRNG + input materialization is O(B) work
    *outside* the kernel whose constant-per-state cost is not obviously
    <1% at 2²⁰. → time the bare kernel on pre-materialized device inputs.
H2 (kernel): the Mosaic grid itself loses efficiency with 4× more tiles
    (scheduling, tile-feed). → compare bare-kernel ns/state across
    2¹⁶..2²⁰.
H3 (memory): 2²⁰ holds 88 MB inputs + 411 MB outputs live; allocator or
    HBM pressure. → donate inputs / compare with output-consuming sum.

Protocol: two-point marginal slope per bench.py. One JSON line on stdout.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_S = float(os.environ.get("PROBE_BUDGET_S", "1500"))
T0 = time.monotonic()


def log(*a):
    print(f"[{time.monotonic()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def watchdog():
    time.sleep(BUDGET_S)
    log("watchdog: budget exhausted")
    os._exit(3)


def main():
    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    if os.environ.get("PROBE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        from gridcodegenerator_tpu.utils.cache import cpu_cache_dir
        jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops.kernels import fused

    log("backend", jax.default_backend())
    desc = g.parse_urdf(zoo.iiwa14())
    model = g.robot_model_from_description(desc, dtype=jnp.float32)
    n = desc.n
    shift = int(os.environ.get("PROBE_SHIFT", "0"))

    @jax.jit
    def bare(q, qd, u):
        ddq, ddqd = fused.fd_grad_fused(model, q, qd, u, -9.81)
        return jnp.concatenate([ddq, ddqd], axis=1)

    from functools import partial

    @partial(jax.jit, static_argnums=(0,))
    def bench_like(batch):
        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.uniform(ks[0], (batch, n), jnp.float32, -2, 2).T
        qd = jax.random.uniform(ks[1], (batch, n), jnp.float32, -1, 1).T
        u = jax.random.uniform(ks[2], (batch, n), jnp.float32, -8, 8).T
        return bare(q, qd, u)

    def slope(fn, args, reps=12, trials=2):
        def enq(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(*args)
            np.asarray(o[(0,) * o.ndim])
            return time.perf_counter() - t0

        lo = max(1, reps // 4)
        ts = []
        for _ in range(trials):
            a, b = enq(lo), enq(reps)
            ts.append((b - a) / (reps - lo))
        good = [t for t in ts if t > 0]
        return float(np.median(good or [enq(reps) / reps]))

    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend(), "rows": []}
    for p in (16, 18, 20):
        B = 1 << (p - shift)
        q = jnp.asarray(rng.uniform(-2, 2, (n, B)), jnp.float32)
        qd = jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
        u = jnp.asarray(rng.uniform(-8, 8, (n, B)), jnp.float32)
        jax.block_until_ready(bare(q, qd, u))          # compile
        t_bare = slope(bare, (q, qd, u))
        jax.block_until_ready(bench_like(B))
        t_full = slope(bench_like, (B,))
        row = {"batch": B,
               "bare_ns_per_state": t_bare / B * 1e9,
               "benchlike_ns_per_state": t_full / B * 1e9,
               "prng_overhead_ns": (t_full - t_bare) / B * 1e9}
        log(row)
        out["rows"].append(row)
        del q, qd, u

    print(json.dumps(out), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
