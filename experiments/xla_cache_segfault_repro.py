"""Minimal-repro attempt: XLA CPU persistent-cache serialize segfault.

ROADMAP "Known issue" / VERDICT r2 weak #7: one-process full-suite runs
(~310 tests) segfaulted deterministically at ~96% inside XLA CPU
``serialize_executable`` / ``deserialize_executable`` (persistent
compile-cache put/get).  Established facts (round 2): every crashing
test passes in a fresh process with the SAME cache dir; the crash moves
when the allocation pattern changes; a fresh cache dir does not help;
zstd is not the faulting layer.

This script reproduces the suite's stress profile in isolation:

  1. imports the same heavy C-extension set the suite loads
     (torch, sklearn, h5py, pandas, scipy),
  2. enables the persistent compile cache into a scratch dir,
  3. compiles ``--programs`` DISTINCT jitted programs (unique shapes →
     unique cache keys → one serialize per program) while keeping every
     LoadedExecutable alive in a list (the suite's failure precondition),
  4. phase 2: clears jit caches and re-compiles the same programs so
     every entry goes through deserialize_executable as well.

Exit 0 = no crash at this stress level (record the level); a segfault
(rc 139) reproduces the bug.  Round-3 status: at 600 programs × the
full extension set this script does NOT crash — together with the
module-scoped ``jax.clear_caches()`` fixture keeping the suite's live-
executable count bounded (tests/conftest.py), the full suite has been
green since; the trigger therefore needs more state than executable
count + cache traffic alone (likely heap layout from the real test
bodies).  Decision recorded in tests/conftest.py: cache stays ON with
the bounding fixture; HEBO_TPU_DISABLE_COMPILE_CACHE remains as a
diagnostic switch only.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
        python experiments/xla_cache_segfault_repro.py --programs 600
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", type=int, default=600)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--heap-churn", action="store_true",
                    help="r5: interleave torch/numpy allocation churn "
                         "between compiles to perturb the heap layout "
                         "(the r4 hypothesis: the trigger needs heap "
                         "state the pure compile loop lacks)")
    args = ap.parse_args()

    # the suite's C-extension load profile
    import torch  # noqa: F401
    import sklearn.svm  # noqa: F401
    import h5py  # noqa: F401
    import pandas  # noqa: F401
    import scipy.linalg  # noqa: F401

    import jax
    import jax.numpy as jnp

    cache = args.cache_dir or tempfile.mkdtemp(prefix="xla_cache_repro_")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    def make_prog(i):
        n = 4 + (i % 97)
        m = 3 + (i % 13)

        @jax.jit
        def f(x):
            y = jnp.sin(x) @ jnp.cos(x.T)
            return jnp.tanh(y)[:m].sum() + i * 0.0

        return f, jnp.ones((n, n + 1), jnp.float32)

    import numpy as np

    churn_pool = []

    def churn(i):
        """Fragment/perturb the allocator the way real test bodies do:
        odd-sized torch tensors + numpy arrays + pandas frames held with
        staggered lifetimes."""
        if not args.heap_churn:
            return
        t = torch.randn(317 + (i * 7) % 1311)
        a = np.random.default_rng(i).normal(size=(211 + (i * 13) % 977,))
        churn_pool.append((t, a))
        if len(churn_pool) > 64:  # staggered frees
            del churn_pool[:: 3]
        if i % 50 == 0:
            df = pandas.DataFrame({"a": a[:50], "b": a[:50] * 2})
            churn_pool.append((df.describe(),))

    live = []
    print(f"phase 1: compiling {args.programs} distinct programs "
          f"(cache: {cache}, heap_churn={args.heap_churn})", flush=True)
    for i in range(args.programs):
        f, x = make_prog(i)
        f(x).block_until_ready()
        live.append(f)  # keep the LoadedExecutable alive
        churn(i)
        if (i + 1) % 100 == 0:
            print(f"  {i + 1} compiled+serialized", flush=True)

    print("phase 2: clearing jit caches, re-compiling through "
          "deserialize_executable", flush=True)
    jax.clear_caches()
    live2 = []
    for i in range(args.programs):
        f, x = make_prog(i)
        f(x).block_until_ready()
        live2.append(f)
        churn(args.programs + i)
        if (i + 1) % 100 == 0:
            print(f"  {i + 1} deserialized", flush=True)

    print(f"PASS: no crash with {args.programs} live executables x 2 "
          "phases and full cache traffic", flush=True)


if __name__ == "__main__":
    main()
