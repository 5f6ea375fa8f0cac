#!/usr/bin/env python
"""TPU measurement for the f32x2 parity experiment (VERDICT r4 #2).

Measures, on the real chip, the 256-state relative ∇FD parity vs the f64
golden model for (a) the plain batch-last f32 route and (b) the same route
with the Newton/f32x2-residual-refined M⁻¹ (``ops/df32.py``), plus the
throughput cost of (b). Watchdog-bounded like bench.py. Prints one JSON
line; diagnostics on stderr. Results are recorded in PARITY.md."""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_S = float(os.environ.get("X2_BUDGET_S", "1200"))
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
    if os.environ.get("X2_CPU"):
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
    from gridcodegenerator_tpu.ops import blops, df32

    log("backend", jax.default_backend())
    desc = g.parse_urdf(zoo.iiwa14())
    model = g.robot_model_from_description(desc, dtype=jnp.float32)
    consts = df32.x2_constants(desc)
    gold = g.GoldenDynamics(desc)
    n = desc.n
    P = int(os.environ.get("X2_STATES", "256"))

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-2, 2, (n, P)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, (n, P)), jnp.float32)
    u = jnp.asarray(rng.uniform(-8, 8, (n, P)), jnp.float32)

    @jax.jit
    def run_plain(q, qd, u):
        return blops.fd_grad_bl(model, q, qd, u, -9.81)

    @jax.jit
    def run_x2(q, qd, u):
        return df32.fd_grad_x2_bl(model, consts, q, qd, u, -9.81)

    def parity(pair, tag):
        ddq, ddqd = (np.asarray(x, np.float64) for x in pair)
        got = np.concatenate([np.moveaxis(ddq, -1, 0),
                              np.moveaxis(ddqd, -1, 0)], axis=2)
        errs = np.empty(P)
        qh, qdh, uh = (np.asarray(x, np.float64).T for x in (q, qd, u))
        for k in range(P):
            ref = gold.fd_grad(qh[k], qdh[k], uh[k])
            errs[k] = np.abs(got[k] - ref).max() / max(1.0,
                                                       np.abs(ref).max())
        out = {"max": float(errs.max()),
               "p99": float(np.quantile(errs, 0.99)),
               "median": float(np.median(errs))}
        log(tag, out)
        return out

    t0 = time.perf_counter()
    plain = run_plain(q, qd, u)
    jax.block_until_ready(plain)
    log(f"plain compile+run {time.perf_counter()-t0:.1f}s")
    p_plain = parity(plain, "plain bl")

    t0 = time.perf_counter()
    x2 = run_x2(q, qd, u)
    jax.block_until_ready(x2)
    log(f"x2 compile+run {time.perf_counter()-t0:.1f}s")
    p_x2 = parity(x2, "x2-refined")

    # Oracle arm: substitute the f64-exact M⁻¹ (the GOLDEN model's, pure
    # NumPy float64 on host, rounded to f32) — the unreachable best case of
    # ANY M⁻¹-stage fix. If this arm's tail still misses ≤1e-6, the residual
    # error is in the OTHER f32 stages and no M⁻¹ treatment (f32x2
    # included) can close the north star alone.
    qh64 = np.asarray(q, np.float64).T
    Minv_oracle = jnp.asarray(
        np.moveaxis(np.stack([gold.minv(qh64[k]) for k in range(P)]),
                    0, -1), jnp.float32)

    @jax.jit
    def run_oracle(q, qd, u, Mi):
        return blops.fd_grad_bl(model, q, qd, u, -9.81,
                                minv_fn=lambda m, X: Mi)

    oracle = run_oracle(q, qd, u, Minv_oracle)
    jax.block_until_ready(oracle)
    p_oracle = parity(oracle, "oracle-Minv")

    # throughput cost at a real batch (2^14), marginal-slope protocol
    B = 1 << int(os.environ.get("X2_SHIFT_B", "14"))
    qb = jnp.asarray(rng.uniform(-2, 2, (n, B)), jnp.float32)
    qdb = jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
    ub = jnp.asarray(rng.uniform(-8, 8, (n, B)), jnp.float32)

    def timeit(fn, reps=8):
        out = fn(qb, qdb, ub)
        np.asarray(out[0][0, 0, 0])
        def enq(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(qb, qdb, ub)
            np.asarray(o[0][0, 0, 0])
            return time.perf_counter() - t0
        lo = max(1, reps // 4)
        t = (enq(reps) - enq(lo)) / (reps - lo)
        return t if t > 0 else enq(reps) / reps

    t_plain = timeit(run_plain)
    t_x2 = timeit(run_x2)
    res = {"plain_parity": p_plain, "x2_parity": p_x2,
           "oracle_minv_parity": p_oracle,
           "batch": B,
           "plain_evals_per_sec": B / t_plain,
           "x2_evals_per_sec": B / t_x2,
           "x2_cost_factor": t_x2 / t_plain,
           "states": P, "backend": jax.default_backend()}
    print(json.dumps(res), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
