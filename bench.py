#!/usr/bin/env python
"""Benchmark: batched ∇FD (forward-dynamics gradient) on iiwa-14.

North-star metric (BASELINE.md / BASELINE.json): batched ∇FD evaluations/sec
on the 7-DoF iiwa-14, target ≥ 1e6 on one TPU chip at ≤1e-6 parity with the
float64 NumPy golden model. The reference publishes no numbers
(``/root/reference/README.md``); its timing machinery is the
``*_single_timing`` kernel/host pair (``_inverse_dynamics.py:483-494``),
replaced here by ``block_until_ready`` walltiming of the fused Pallas kernel.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": "evals/sec", "vs_baseline": N/1e6}
Diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, args, reps, trials=5):
    """Steady-state throughput: enqueue `reps` calls, then force ONE
    device→host read of the last result. In this environment
    ``block_until_ready`` does NOT block through the TPU tunnel (it returns
    on enqueue), so a real transfer is the only honest sync; a single
    trailing sync amortizes the tunnel round-trip over the reps. Median and
    min over `trials` repetitions."""
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(first[(0,) * first.ndim])  # scalar device→host sync
        ts.append((time.perf_counter() - t0) / reps)
    return float(np.median(ts)), float(np.min(ts))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} device={dev.device_kind} ndev={jax.device_count()}")

    desc = g.parse_urdf(zoo.iiwa14())
    model = g.robot_model_from_description(desc, dtype=jnp.float32)
    gold = g.GoldenDynamics(desc)
    n = desc.n

    BATCH = 1 << 20  # 1,048,576 states
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-2, 2, (BATCH, n)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, (BATCH, n)), jnp.float32)
    u = jnp.asarray(rng.uniform(-8, 8, (BATCH, n)), jnp.float32)

    fn = lambda q, qd, u: g.forward_dynamics_gradient(model, q, qd, u)

    # compile + parity check against the f64 golden model (several states)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(q, qd, u))
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")
    errs = []
    for k in (0, BATCH // 2, BATCH - 1):
        ref = gold.fd_grad(np.asarray(q[k], np.float64),
                           np.asarray(qd[k], np.float64),
                           np.asarray(u[k], np.float64))
        errs.append(np.abs(np.asarray(out[k], np.float64) - ref).max()
                    / max(1.0, np.abs(ref).max()))
    log(f"f32-vs-golden relative parity (3 states): {max(errs):.3e}")

    med, mn = timeit(fn, (q, qd, u), reps=20)
    evals_per_sec = BATCH / med
    log(f"batch={BATCH} median={med*1e3:.3f}ms/call min={mn*1e3:.3f}ms "
        f"evals/sec={evals_per_sec:.3e} ({med/BATCH*1e9:.1f} ns/state)")

    # secondary diagnostic: smaller batch (tunnel latency shows up here)
    B2 = 16384
    med2, _ = timeit(fn, (q[:B2], qd[:B2], u[:B2]), reps=20)
    log(f"batch={B2}: {B2/med2:.3e} evals/sec")

    print(json.dumps({
        "metric": f"batched fwd-dynamics-gradient evals/sec, iiwa-14, batch={BATCH}, f32, fused pallas kernel",
        "value": evals_per_sec,
        "unit": "evals/sec",
        "vs_baseline": evals_per_sec / 1e6,
    }))


if __name__ == "__main__":
    main()
