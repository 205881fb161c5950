"""Speed-of-light microbench: GP log-prob + leapfrog kernels (BASELINE.md).

Measures on the current backend (TPU chip or CPU):
  * gp log-prob (masked NLL at bucket N): evals/s + achieved FLOP/s vs an
    analytic FLOP count (gram + Cholesky + solves) → MFU,
  * gp log-prob GRADIENT (the pSGLD/HMC inner step),
  * leapfrog transitions (L steps of HMC dynamics over the GP posterior).

    python experiments/kernel_microbench.py          # real chip
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        PYTHONPATH=. python experiments/kernel_microbench.py

Writes experiments/kernel_microbench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 90.0))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_tpu",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from hebo_tpu.design_space import DesignSpace
    from hebo_tpu.models.gp.gp import GPCore, _make_data

    out = {"backend": jax.default_backend(), "peak_tflops_assumed": PEAK_TFLOPS,
           "rows": []}
    for n_pad, batch in ((256, 64), (1024, 16)):
        d = 6
        space = DesignSpace().parse(
            [{"name": f"x{i}", "type": "num", "lb": -5.0, "ub": 5.0}
             for i in range(d)]
        )
        core = GPCore(
            numeric_dims=tuple(range(d)), cat_dims=(), num_categories=(),
            n_steps=1,
        )
        rng = np.random.default_rng(0)
        X = rng.uniform(-5, 5, (n_pad - 8, d)).astype(np.float32)
        y = np.sum(X**2, axis=1, keepdims=True).astype(np.float32) / 10
        data = _make_data(X, y, core.numeric_dims, n_pad)
        p0 = core.init_params(jax.random.PRNGKey(0), data)
        # batched log-prob over `batch` hyperparameter settings (the
        # vmapped-restart / chain shape of the real fit loop)
        ps = jax.vmap(
            lambda k: core.init_params(k, data)
        )(jax.random.split(jax.random.PRNGKey(1), batch))

        logp = lambda p: -core.loss(p, data)
        v_logp = jax.jit(jax.vmap(logp))
        v_grad = jax.jit(jax.vmap(jax.grad(logp)))

        def timeit(fn, arg, reps=10):
            r = fn(arg)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(arg)
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / reps

        t_logp = timeit(v_logp, ps)
        t_grad = timeit(v_grad, ps)

        # analytic FLOPs per logp eval (2-rung nll ladder):
        # gram 2 n^2 d + 2 cholesky n^3/3 + solves 2 n^2
        fl = 2 * n_pad**2 * d + 2 * n_pad**3 / 3 + 2 * n_pad**2
        fl_grad = 3 * fl  # fwd + backward ~ 2x fwd

        # leapfrog: L grad evals per transition (chains = batch axis)
        from hebo_tpu.models.gp.inference import _make_hmc_chain

        L = 8
        chain = _make_hmc_chain(
            logp, n_warmup=0, n_samples=4, n_leapfrog=L,
            init_step=0.01, target_accept=0.8,
        )
        v_chain = jax.jit(jax.vmap(chain))
        keys = jax.random.split(jax.random.PRNGKey(2), batch)
        s, acc = v_chain(keys, ps)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        s, acc = v_chain(keys, ps)
        jax.block_until_ready(acc)
        t_leap = time.perf_counter() - t0
        transitions = 4 * batch

        out["rows"].append({
            "bucket": n_pad,
            "batch": batch,
            "logp_evals_per_s": round(batch / t_logp, 1),
            "logp_mfu": round(batch * fl / t_logp / (PEAK_TFLOPS * 1e12), 5),
            "grad_evals_per_s": round(batch / t_grad, 1),
            "grad_mfu": round(batch * fl_grad / t_grad / (PEAK_TFLOPS * 1e12), 5),
            "hmc_transitions_per_s": round(transitions / t_leap, 1),
            "accept_mean": round(float(np.asarray(acc).mean()), 3),
        })
        print(out["rows"][-1], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "kernel_microbench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
