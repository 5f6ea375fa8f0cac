"""Persistent-compile-cache locations.

Two distinct XLA:CPU failure modes drive this design (r4s1 postmortem,
BENCHLOG):

1. **Foreign-host AOT loads.** XLA:CPU AOT results bake the compile
   host's CPU features into the executable but NOT into the cache key;
   loading an entry written by a different machine (the round driver's
   host vs the builder's) triggers ``cpu_aot_loader`` machine-feature
   errors and can crash. → CPU entries live in a directory keyed by a
   fingerprint of this host's CPU flags; every machine gets its own
   warm cache and never loads foreign code.

2. **Compile-count crash horizon.** ``backend_compile_and_load``
   segfaults nondeterministically once a single process has compiled
   O(hundreds) of programs (observed repeatedly at ~30% of the full
   test suite with the cache disabled; also observed once through the
   cache-READ path in an already-compile-heavy process). A warm
   persistent cache keeps long suite runs far below that horizon —
   which is why the r3 suites (warm cache) never hit it. If a cold
   warm-up run crashes mid-way, rerun it: entries already written
   persist, so successive runs compile strictly less and converge to a
   hit-mostly run.

TPU executables carry no host coupling and share
``/root/repo/.jax_cache`` (bench.py, the ``-m tpu`` tier, the driver).
"""

import hashlib
import os


def cpu_cache_dir(root: str = "/root/repo/.jax_cache_cpu") -> str:
    """Per-CPU-model persistent cache dir (created on first use).

    Fingerprint = cpuinfo flags + model name + jaxlib version. Flags alone
    proved insufficient (r5: ``cpu_aot_loader`` machine-feature errors on
    entries from a host with identical flags but different LLVM target
    features — XLA derives ``prefer-no-gather``-class pseudo-features from
    the CPU *model*, not the flag list)."""
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.readlines()
        flags = next((ln for ln in lines if ln.startswith("flags")), "")
        model = next((ln for ln in lines if ln.startswith("model name")), "")
    except OSError:
        flags = model = ""
    try:
        import jaxlib
        ver = getattr(jaxlib, "__version__", "")
    except Exception:
        ver = ""
    tag = hashlib.md5((flags + model + ver).encode()).hexdigest()[:10]
    path = os.path.join(root, tag)
    os.makedirs(path, exist_ok=True)
    return path
