#!/usr/bin/env python
"""Benchmark: batched ∇FD (forward-dynamics gradient) on iiwa-14.

North-star metric (BASELINE.md / BASELINE.json): batched ∇FD evaluations/sec
on the 7-DoF iiwa-14, target ≥ 1e6 on one TPU chip at ≤1e-6 parity with the
float64 NumPy golden model. The reference publishes no numbers
(``/root/reference/README.md``); its timing machinery is the
``*_single_timing`` kernel/host pair (``_inverse_dynamics.py:483-494``),
replaced here by ``block_until_ready`` walltiming.

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


def main():
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} device={dev.device_kind} ndev={jax.device_count()}")

    desc = g.parse_urdf(zoo.iiwa14())
    model = g.robot_model_from_description(desc, dtype=jnp.float32)
    gold = g.GoldenDynamics(desc)
    n = desc.n

    BATCH = 16384
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-2, 2, (BATCH, n)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, (BATCH, n)), jnp.float32)
    u = jnp.asarray(rng.uniform(-8, 8, (BATCH, n)), jnp.float32)

    fn = jax.jit(lambda q, qd, u: g.forward_dynamics_gradient(model, q, qd, u))

    # compile + parity check on a small slice against the f64 golden model
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(q, qd, u))
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")
    ref = gold.fd_grad(np.asarray(q[0], np.float64), np.asarray(qd[0], np.float64),
                       np.asarray(u[0], np.float64))
    err = np.abs(np.asarray(out[0], np.float64) - ref).max() / max(1.0, np.abs(ref).max())
    log(f"f32-vs-golden relative parity (state 0): {err:.3e}")

    # timed runs
    reps = 30
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(q, qd, u))
        times.append(time.perf_counter() - t0)
    t_med = float(np.median(times))
    evals_per_sec = BATCH / t_med
    log(f"batch={BATCH} median={t_med*1e3:.3f}ms  min={min(times)*1e3:.3f}ms  "
        f"evals/sec={evals_per_sec:.3e}")

    print(json.dumps({
        "metric": f"batched fwd-dynamics-gradient evals/sec, iiwa-14, batch={BATCH}, f32",
        "value": evals_per_sec,
        "unit": "evals/sec",
        "vs_baseline": evals_per_sec / 1e6,
    }))


if __name__ == "__main__":
    main()
