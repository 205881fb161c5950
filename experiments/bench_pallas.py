"""A/B: Pallas kernels vs jnp forms on the real TPU.

Usage (TPU-attached; ONE process at a time):
  python experiments/bench_pallas.py ssk      # SSK gram einsum vs pallas
  python experiments/bench_pallas.py matern   # Matern gram jnp vs pallas
  python experiments/bench_pallas.py suggest  # full HEBO bench w/ use_pallas
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache():
    import jax

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def _time(f, n=5):
    f()  # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def bench_ssk():
    import jax
    import jax.numpy as jnp

    from hebo_tpu.models.gp.kernels import ssk_kernel
    from hebo_tpu.ops.pallas_ssk import ssk_gram

    N, L, V = 256, 11, 20
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, V, (N, L)), jnp.int32)
    md = jnp.float32(0.6)
    gd = jnp.float32(0.7)

    @jax.jit
    def f_einsum(md, gd):
        return ssk_kernel(s.astype(jnp.float32), s.astype(jnp.float32), md, gd, 3)

    @jax.jit
    def f_pallas(md, gd):
        return ssk_gram(s, s, md, gd, 3)

    @jax.jit
    def g_einsum(md, gd):
        return jax.grad(lambda m, g: jnp.sum(
            ssk_kernel(s.astype(jnp.float32), s.astype(jnp.float32), m, g, 3) ** 2
        ), argnums=(0, 1))(md, gd)

    @jax.jit
    def g_pallas(md, gd):
        return jax.grad(lambda m, g: jnp.sum(ssk_gram(s, s, m, g, 3) ** 2),
                        argnums=(0, 1))(md, gd)

    # correctness on device
    K1 = np.asarray(f_einsum(md, gd))
    K2 = np.asarray(f_pallas(md, gd))
    err = float(np.abs(K1 - K2).max())

    # fit-loop shape: 50 gram+grad evaluations inside ONE jitted scan —
    # isolates compute from the ~10 ms/dispatch tunnel latency
    def scan_of(loss):
        @jax.jit
        def run(md, gd):
            def step(c, _):
                m, g = c
                dm, dg = jax.grad(loss, argnums=(0, 1))(m, g)
                return (m - 1e-4 * dm, g - 1e-4 * dg), None

            (m, g), _ = jax.lax.scan(step, (md, gd), None, length=50)
            return m, g

        return run

    loss_e = lambda m, g: jnp.sum(
        ssk_kernel(s.astype(jnp.float32), s.astype(jnp.float32), m, g, 3) ** 2
    )
    loss_p = lambda m, g: jnp.sum(ssk_gram(s, s, m, g, 3) ** 2)
    run_e = scan_of(loss_e)
    run_p = scan_of(loss_p)
    t_e = _time(lambda: jax.block_until_ready(run_e(md, gd)), n=3)
    t_p = _time(lambda: jax.block_until_ready(run_p(md, gd)), n=3)
    print(json.dumps({
        "bench": "ssk_gram_fit50", "N": N, "L": L, "max_err": err,
        "einsum_s": round(t_e, 5), "pallas_s": round(t_p, 5),
        "speedup": round(t_e / t_p, 2),
    }))


def bench_matern():
    import jax
    import jax.numpy as jnp

    from hebo_tpu.ops.pallas_gram import matern32_gram, matern32_gram_reference

    N, D = 512, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    ls = jnp.ones((D,), jnp.float32)

    f_ref = jax.jit(lambda x, l: matern32_gram_reference(x, x, l))
    f_pal = jax.jit(lambda x, l: matern32_gram(x, x, l))
    err = float(np.abs(np.asarray(f_ref(x, ls)) - np.asarray(f_pal(x, ls))).max())
    t_r = _time(lambda: jax.block_until_ready(f_ref(x, ls)))
    t_p = _time(lambda: jax.block_until_ready(f_pal(x, ls)))
    print(json.dumps({
        "bench": "matern32_gram", "N": N, "D": D, "max_err": err,
        "jnp_s": round(t_r, 6), "pallas_s": round(t_p, 6),
        "speedup": round(t_r / t_p, 2),
    }))


def bench_suggest():
    from hebo_tpu import HEBO
    from hebo_tpu.tasks import Ackley

    task = Ackley(dim=6)
    opt = HEBO(task.space, model_config={"use_pallas": True})
    init = opt.quasi_sample(200)
    opt.observe(init, task(init))
    rec = opt.suggest(8)
    opt.observe(rec, task(rec))
    times = []
    for _ in range(5):
        t0 = time.time()
        rec = opt.suggest(8)
        times.append(time.time() - t0)
        opt.observe(rec, task(rec))
    print(json.dumps({
        "bench": "hebo_suggest_pallas", "median_s": round(float(np.median(times)), 4),
    }))


if __name__ == "__main__":
    _cache()
    {"ssk": bench_ssk, "matern": bench_matern, "suggest": bench_suggest}[sys.argv[1]]()
