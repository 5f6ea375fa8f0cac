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
* phase 0 measures the cheap-to-compile batch-last XLA path (impl="bl",
  batch 2^16) and its 256-state golden parity FIRST, so a number + parity
  are on record within ~1 min cold; only then is the fused Pallas kernel
  (2^18, then 2^20) compiled and measured — a slow fused compile degrades the result to the
  phase-0 number instead of producing nothing (the r3 failure mode);
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


def record(batch, evals_per_sec, impl, parity=None):
    if _BEST and evals_per_sec <= _BEST.get("value", 0.0):
        return
    keep_parity = _BEST.get("parity") if _BEST else None
    _BEST.clear()
    _BEST.update({
        "metric": (f"batched fwd-dynamics-gradient evals/sec, iiwa-14, "
                   f"batch={batch}, f32, {impl}"),
        "value": evals_per_sec,
        "unit": "evals/sec",
        "vs_baseline": evals_per_sec / 1e6,
    })
    p = parity if parity is not None else keep_parity
    if p is not None:
        _BEST["parity"] = p  # {"max": .., "median": ..} rel err, 256 states


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
    if os.environ.get("BENCH_CPU"):  # logic-testing escape hatch: run the
        # whole protocol on host CPU (phase 1/2 then degrade gracefully);
        # per-host CPU cache dir (see gridcodegenerator_tpu/utils/cache.py)
        jax.config.update("jax_platforms", "cpu")
        from gridcodegenerator_tpu.utils.cache import cpu_cache_dir
        cache_dir = cpu_cache_dir()
    else:
        cache_dir = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
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

    @partial(jax.jit, static_argnums=(0, 1))
    def run_batch(batch, impl):
        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.uniform(ks[0], (batch, n), jnp.float32, -2, 2)
        qd = jax.random.uniform(ks[1], (batch, n), jnp.float32, -1, 1)
        u = jax.random.uniform(ks[2], (batch, n), jnp.float32, -8, 8)
        out = g.forward_dynamics_gradient(model, q, qd, u, impl=impl)
        return out[:P_HEAD], q[:P_HEAD], qd[:P_HEAD], u[:P_HEAD]

    def parity(head, qh, qdh, uh, tag):
        """Max/p99/median relative error of ``head`` vs the float64 golden
        model. The f32 error is a floor-attributed distribution
        (PARITY.md), so a sample-robust claim needs tail AND typical."""
        m = min(P_HEAD, head.shape[0])  # BENCH_SHIFT>8 shrinks the head
        errs = np.empty(m)
        for k in range(m):
            ref = gold.fd_grad(qh[k], qdh[k], uh[k])
            errs[k] = np.abs(head[k] - ref).max() / max(1.0,
                                                        np.abs(ref).max())
        log(f"[{elapsed():.1f}s] f32-vs-golden relative parity "
            f"({m} states, {tag}): max={errs.max():.3e} "
            f"p99={np.quantile(errs, 0.99):.3e} "
            f"median={np.median(errs):.3e}")
        return {"max": float(errs.max()), "median": float(np.median(errs)),
                "states": m}

    # ---- phase 0: XLA-path number + parity, cheap to compile ---------------
    # The batch-last XLA route ("bl", ops/blops.py — the portable fast path,
    # VERDICT r4 #3: the old vmap-nest phase0 measured 5.9e5 evals/s, below
    # the 1e6 north star) compiles in seconds even with a cold persistent
    # cache, so a defensible number AND the 256-state parity are both on
    # record long before the fused kernel's (potentially cold, r3: ~190 s
    # via the tunnel's remote-compile service) compile is attempted. A slow
    # fused compile now degrades the result instead of zeroing it
    # (VERDICT r3 weak #1).
    shift = int(os.environ.get("BENCH_SHIFT", "0"))  # debug: shrink batches
    B0 = 1 << (16 - shift)
    t0 = time.perf_counter()
    head, qh, qdh, uh = (np.asarray(x, np.float64)
                         for x in run_batch(B0, "bl"))
    log(f"[{elapsed():.1f}s] phase0 compile+first run (B={B0}, bl): "
        f"{time.perf_counter() - t0:.2f}s")
    par0 = parity(head, qh, qdh, uh, "bl")
    med, mn = timeit(run_batch, (B0, "bl"), reps=10, trials=2)
    record(B0, B0 / med, "batch-last XLA path", parity=par0)
    log(f"[{elapsed():.1f}s] phase0 batch={B0} median={med*1e3:.3f}ms/call "
        f"evals/sec={B0/med:.3e} ({med/B0*1e9:.1f} ns/state)")

    # ---- phase 1: fused pallas kernel at batch 2^18 ------------------------
    # Wrapped so a fused-path failure (compile error, non-TPU backend)
    # still emits the phase-0 record instead of dying with nothing.
    try:
        B1 = 1 << (18 - shift)
        t0 = time.perf_counter()
        head, qh, qdh, uh = (np.asarray(x, np.float64)
                             for x in run_batch(B1, "pallas"))
        log(f"[{elapsed():.1f}s] phase1 compile+first run (B={B1}, pallas): "
            f"{time.perf_counter() - t0:.2f}s")
        par1 = parity(head, qh, qdh, uh, "pallas")
        med, mn = timeit(run_batch, (B1, "pallas"), reps=12, trials=2)
        record(B1, B1 / med, "fused pallas kernel", parity=par1)
        log(f"[{elapsed():.1f}s] phase1 batch={B1} "
            f"median={med*1e3:.3f}ms/call evals/sec={B1/med:.3e} "
            f"({med/B1*1e9:.1f} ns/state)")

        # ---- phase 2: refine at 2^20 if budget remains ---------------------
        if elapsed() < 0.55 * BUDGET_S:
            B2 = 1 << (20 - shift)
            t0 = time.perf_counter()
            np.asarray(run_batch(B2, "pallas")[0])
            log(f"[{elapsed():.1f}s] phase2 compile+first run (B={B2}): "
                f"{time.perf_counter() - t0:.2f}s")
            if elapsed() < 0.75 * BUDGET_S:
                med2, _ = timeit(run_batch, (B2, "pallas"), reps=12,
                                 trials=3)
                record(B2, B2 / med2, "fused pallas kernel", parity=par1)
                log(f"[{elapsed():.1f}s] phase2 batch={B2} "
                    f"median={med2*1e3:.3f}ms/call evals/sec={B2/med2:.3e} "
                    f"({med2/B2*1e9:.1f} ns/state)")
    except Exception as e:  # noqa: BLE001 — degrade, never zero the result
        log(f"[{elapsed():.1f}s] fused phase failed ({type(e).__name__}: "
            f"{e}); emitting phase-0 result")

    emit_and_exit(0)


if __name__ == "__main__":
    main()
