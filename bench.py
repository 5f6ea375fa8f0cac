#!/usr/bin/env python
"""Benchmark: batched ∇FD (forward-dynamics gradient) on iiwa-14.

North-star metric (BASELINE.md / BASELINE.json): batched ∇FD evaluations/sec
on the 7-DoF iiwa-14, target ≥ 1e6 on one TPU chip at ≤1e-6 parity with the
float64 NumPy golden model. The reference publishes no numbers
(``/root/reference/README.md``); its timing machinery is the
``*_single_timing`` kernel/host pair (``_inverse_dynamics.py:483-494``) —
a one-number-and-exit host. This script matches that contract under a hard
wall-clock budget:

* a watchdog thread prints the best-so-far JSON line and exits the process
  before any external timeout can kill it silently;
* the first defensible number (batch 2^18) is measured within seconds of
  compile; the 2^20 refinement only runs if budget remains;
* at most 12 kernel calls are ever in flight (~70 ms of device work); inputs
  are generated on-device (no multi-MB host->device transfers through the
  TPU tunnel); the parity check transfers a handful of states, never
  Jacobian rows of the big batch;
* per-call time is the two-point marginal slope (see ``timeit``), which
  cancels the tunnel's ~40 ms fixed sync round-trip out of the measurement.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": "evals/sec", "vs_baseline": N/1e6}
Diagnostics go to stderr.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# must undercut any external (driver) timeout so the watchdog, not SIGKILL,
# ends a degraded run — with the JSON line already flushed
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "240"))
_T0 = time.monotonic()
_BEST = {}          # best-so-far result line, updated after every measurement
_EMITTED = threading.Event()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def elapsed():
    return time.monotonic() - _T0


def emit_and_exit(code=0):
    if not _EMITTED.is_set():
        _EMITTED.set()
        if _BEST:
            print(json.dumps(_BEST), flush=True)
    # os._exit: never wait on wedged device work during interpreter teardown
    os._exit(code if _BEST else max(code, 3))


def _watchdog():
    """Bound the wall clock: if the main thread wedges (TPU-tunnel hang), the
    watchdog still holds the GIL periodically and can flush the best-so-far
    result before the driver's own timeout would produce rc=124/parsed=null."""
    while True:
        rem = BUDGET_S - elapsed()
        if rem <= 0:
            break
        time.sleep(min(rem, 1.0))
    log(f"watchdog: budget {BUDGET_S:.0f}s exhausted at {elapsed():.1f}s, "
        f"emitting best-so-far ({'yes' if _BEST else 'none'})")
    emit_and_exit(0)


def record(batch, evals_per_sec):
    _BEST.clear()
    _BEST.update({
        "metric": (f"batched fwd-dynamics-gradient evals/sec, iiwa-14, "
                   f"batch={batch}, f32, fused pallas kernel"),
        "value": evals_per_sec,
        "unit": "evals/sec",
        "vs_baseline": evals_per_sec / 1e6,
    })


def timeit(fn, args, reps, trials):
    """Steady-state *marginal* per-call time via a two-point slope.

    Protocol: per trial, wall-time an enqueue of ``lo`` calls and of ``reps``
    calls (each closed by ONE scalar device→host read — ``block_until_ready``
    does not block through the TPU tunnel, so a real transfer is the only
    honest sync), then take (T_hi − T_lo)/(reps − lo). The subtraction
    cancels the fixed per-sync tunnel round-trip (~40 ms here), which at
    small rep counts otherwise inflates per-call time by an order of
    magnitude (measured: reps=1 → 44.6 ms/call vs reps=30 → 5.9 ms/call at
    batch 2¹⁸). This is the TPU-tunnel analog of the reference's
    reps-amortized single-timing kernel (``_inverse_dynamics.py:407-420``:
    one launch, NUM_REPS repetitions, divide at the end)."""

    def enqueue_and_sync(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(first[(0,) * first.ndim])  # scalar device→host sync
        return time.perf_counter() - t0

    reps = max(int(reps), 2)  # the slope needs reps > lo
    lo = max(1, reps // 4)
    ts = []
    ceilings = []
    for _ in range(trials):
        t_lo = enqueue_and_sync(lo)
        t_hi = enqueue_and_sync(reps)
        ts.append((t_hi - t_lo) / (reps - lo))
        ceilings.append(t_hi / reps)
    # tunnel jitter can make a slope non-positive on a short trial; such
    # trials carry no signal — fall back to the conservative per-call
    # ceiling (sync cost still included) rather than report garbage
    good = [t for t in ts if t > 0]
    if not good:
        good = ceilings
    return float(np.median(good)), float(np.min(good))


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    dev = jax.devices()[0]
    log(f"[{elapsed():.1f}s] backend={jax.default_backend()} "
        f"device={dev.device_kind} ndev={jax.device_count()}")

    desc = g.parse_urdf(zoo.iiwa14())
    model = g.robot_model_from_description(desc, dtype=jnp.float32)
    gold = g.GoldenDynamics(desc)
    n = desc.n

    from functools import partial

    # ONE jitted computation per batch size: input generation + ∇FD + the
    # 256-state parity head, fused. When the tunnel's remote-compile service
    # is degraded it charges a flat ~50 s per DISTINCT computation (even
    # cache-hit), so the old 3-computation prelude (inputs, fn, slice)
    # could eat the whole budget before the first measurement. One
    # computation bounds that prelude to one flat cost; regenerating the
    # inputs inside every timed call adds only O(B·n) uniform-PRNG work
    # against O(B·n²·depth) gradient work (<1%).
    P_HEAD = 256  # parity sample size (VERDICT r2 #3: 4 states under-sampled)

    @partial(jax.jit, static_argnums=0)
    def run_batch(batch):
        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.uniform(ks[0], (batch, n), jnp.float32, -2, 2)
        qd = jax.random.uniform(ks[1], (batch, n), jnp.float32, -1, 1)
        u = jax.random.uniform(ks[2], (batch, n), jnp.float32, -8, 8)
        out = g.forward_dynamics_gradient(model, q, qd, u)
        return out[:P_HEAD], q[:P_HEAD], qd[:P_HEAD], u[:P_HEAD]

    # ---- phase 1: compile + first defensible number at batch 2^18 ----------
    B1 = 1 << 18
    t0 = time.perf_counter()
    head, qh, qdh, uh = (np.asarray(x, np.float64) for x in run_batch(B1))
    log(f"[{elapsed():.1f}s] compile+first run (B={B1}): "
        f"{time.perf_counter() - t0:.2f}s")

    # parity vs the float64 golden model over the first 256 states of the
    # real batch (same compiled program — no extra TPU computation; ~100 kB
    # transferred once). Reporting max AND p99: the f32 error is a
    # floor-attributed distribution (PARITY.md), so a sample-robust claim
    # needs both the tail and the typical state.
    errs = np.empty(P_HEAD)
    for k in range(P_HEAD):
        ref = gold.fd_grad(qh[k], qdh[k], uh[k])
        errs[k] = np.abs(head[k] - ref).max() / max(1.0, np.abs(ref).max())
    log(f"[{elapsed():.1f}s] f32-vs-golden relative parity ({P_HEAD} states): "
        f"max={errs.max():.3e} p99={np.quantile(errs, 0.99):.3e} "
        f"median={np.median(errs):.3e}")

    med, mn = timeit(run_batch, (B1,), reps=12, trials=2)
    record(B1, B1 / med)
    log(f"[{elapsed():.1f}s] batch={B1} median={med*1e3:.3f}ms/call "
        f"evals/sec={B1/med:.3e} ({med/B1*1e9:.1f} ns/state)")

    # ---- phase 2: refine at 2^20 if budget remains --------------------------
    if elapsed() < 0.55 * BUDGET_S:
        B2 = 1 << 20
        t0 = time.perf_counter()
        np.asarray(run_batch(B2)[0])
        log(f"[{elapsed():.1f}s] compile+first run (B={B2}): "
            f"{time.perf_counter() - t0:.2f}s")
        if elapsed() < 0.75 * BUDGET_S:
            med2, _ = timeit(run_batch, (B2,), reps=12, trials=3)
            if B2 / med2 > _BEST["value"]:
                record(B2, B2 / med2)
            log(f"[{elapsed():.1f}s] batch={B2} median={med2*1e3:.3f}ms/call "
                f"evals/sec={B2/med2:.3e} ({med2/B2*1e9:.1f} ns/state)")

    emit_and_exit(0)


if __name__ == "__main__":
    main()
