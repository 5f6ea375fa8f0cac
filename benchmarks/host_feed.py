#!/usr/bin/env python
"""Host-feed ∇FD throughput (VERDICT r4 #6).

Every headline number starts from device-resident arrays; the reference's
host API instead overlaps trajectory H2D copies with compute via three
priority streams (``/root/reference/GRiDCodeGenerator.py:155-188``,
``cudaMemcpyAsync`` in each host, ``_inverse_dynamics.py:456-466``). This
probe measures the end-to-end "feed a fresh NumPy batch from host memory
every call" rate that machinery exists for, in three regimes:

  resident   — device-resident inputs (the headline protocol, baseline)
  feed       — fresh ``jax.device_put`` of a NEW NumPy batch per call,
               256-state head fetched back (the bench contract)
  feed+out   — as ``feed`` but the FULL (B, n, 2n) Jacobian is fetched to
               host each call (the reference's d_c → h_c memcpy analog)

Feeds are enqueued for the NEXT call while the current one computes (XLA
async dispatch — the TPU analog of the reference's stream overlap; JAX
issues transfers and kernels asynchronously, so the overlap needs no
explicit streams, only not-blocking between enqueues).

One JSON line on stdout; diagnostics on stderr. Recorded in BENCHMARKS.md.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_S = float(os.environ.get("FEED_BUDGET_S", "1200"))
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
    if os.environ.get("FEED_CPU"):
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
    shift = int(os.environ.get("FEED_SHIFT", "0"))
    dev = jax.devices()[0]

    # donate the input buffers: a fed batch is consumed exactly once, so
    # XLA can write kernel temporaries over it (the reference's d_q_qd_u
    # buffer reuse across timesteps)
    @jax.jit
    def run(q, qd, u):
        ddq, ddqd = fused.fd_grad_fused(model, q, qd, u, -9.81)
        return jnp.concatenate([ddq, ddqd], axis=1)

    run_donated = jax.jit(
        lambda q, qd, u: run(q, qd, u), donate_argnums=(0, 1, 2))

    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend(), "rows": []}
    CALLS = int(os.environ.get("FEED_CALLS", "8"))

    for p in (16, 18):
        B = 1 << (p - shift)
        # a pool of pre-generated host batches (fresh data each call, but
        # generation cost excluded — the protocol measures the FEED, not
        # numpy's PRNG)
        host = [tuple(np.asarray(rng.uniform(-1, 1, (n, B)), np.float32)
                      for _ in range(3)) for _ in range(4)]
        d0 = tuple(jax.device_put(a, dev) for a in host[0])
        jax.block_until_ready(run(*d0))                 # compile

        # --- resident baseline (marginal slope, bench protocol) ----------
        def slope(k_lo, k_hi):
            def enq(k):
                t0 = time.perf_counter()
                o = None
                for _ in range(k):
                    o = run(*d0)
                np.asarray(o[0, 0, 0])
                return time.perf_counter() - t0
            return (enq(k_hi) - enq(k_lo)) / (k_hi - k_lo)

        t_res = slope(2, 10)

        # --- fed: fresh device_put per call, next feed overlapped --------
        def feed_loop(fetch_full, donate):
            f = run_donated if donate else run
            # pre-enqueue first feed
            cur = tuple(jax.device_put(a, dev) for a in host[0])
            t0 = time.perf_counter()
            outs = None
            for k in range(CALLS):
                nxt = tuple(jax.device_put(a, dev)
                            for a in host[(k + 1) % len(host)])
                outs = f(*cur)
                if fetch_full:
                    _ = np.asarray(outs)            # full D2H
                cur = nxt
            np.asarray(outs[0, 0, 0])
            return (time.perf_counter() - t0) / CALLS

        t_feed = feed_loop(False, False)
        t_feed_don = feed_loop(False, True)
        t_feed_out = feed_loop(True, False)

        row = {"batch": B,
               "resident_ns_state": t_res / B * 1e9,
               "feed_ns_state": t_feed / B * 1e9,
               "feed_donated_ns_state": t_feed_don / B * 1e9,
               "feed_fullout_ns_state": t_feed_out / B * 1e9,
               "resident_evals_s": B / t_res,
               "feed_evals_s": B / t_feed,
               "feed_donated_evals_s": B / t_feed_don,
               "feed_fullout_evals_s": B / t_feed_out,
               "h2d_mb": 3 * n * B * 4 / 1e6,
               "d2h_full_mb": n * 2 * n * B * 4 / 1e6}
        log(row)
        out["rows"].append(row)

    print(json.dumps(out), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
