"""Probe: where does the GP log-prob/grad time go on the chip?

Times the individual stages of the masked NLL at bucket N — gram build,
one Cholesky, the 2-rung ladder, triangular solves, full nll, full grad —
at several batch (restart/chain) widths, and reports XLA's own
cost-analysis (flops / bytes accessed) where available so the roofline
(ROOFLINE.md) rests on measured bytes, not guesses.

    python experiments/chol_probe.py            # real chip
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
        python experiments/chol_probe.py

Writes experiments/chol_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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

    out = {"backend": jax.default_backend(), "rows": []}

    def timeit(fn, *args, reps=10):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    def cost(fn, *args):
        try:
            c = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0]
            return {
                "flops": c.get("flops"),
                "bytes": c.get("bytes accessed"),
            }
        except Exception as e:  # pragma: no cover
            return {"err": str(e)[:120]}

    d = 6
    for n_pad, batches in ((256, (2, 16, 64)), (1024, (4, 16, 64))):
        space = DesignSpace().parse(
            [
                {"name": f"x{i}", "type": "num", "lb": -5.0, "ub": 5.0}
                for i in range(d)
            ]
        )
        core = GPCore(
            numeric_dims=tuple(range(d)), cat_dims=(), num_categories=(),
            n_steps=1,
        )
        rng = np.random.default_rng(0)
        X = rng.uniform(-5, 5, (n_pad - 8, d)).astype(np.float32)
        y = np.sum(X**2, axis=1, keepdims=True).astype(np.float32) / 10
        data = _make_data(X, y, core.numeric_dims, n_pad)

        for batch in batches:
            ps = jax.vmap(lambda k: core.init_params(k, data))(
                jax.random.split(jax.random.PRNGKey(1), batch)
            )
            # raw SPD matrices for isolated factor/solve timing
            A = np.asarray(
                rng.standard_normal((batch, n_pad, 32)), np.float32
            )
            K = jnp.asarray(A @ np.swapaxes(A, 1, 2)) + 32.0 * jnp.eye(
                n_pad, dtype=jnp.float32
            )
            B1 = jnp.asarray(
                rng.standard_normal((batch, n_pad, 1)).astype(np.float32)
            )
            Bn = jnp.asarray(
                rng.standard_normal((batch, n_pad, n_pad)).astype(np.float32)
            )

            chol = jax.jit(jnp.linalg.cholesky)
            L = chol(K)
            trsm1 = jax.jit(
                lambda L, b: jax.scipy.linalg.solve_triangular(
                    L, b, lower=True
                )
            )
            trsmN = trsm1

            logp = lambda p: -core.loss(p, data)
            v_logp = jax.jit(jax.vmap(logp))
            v_grad = jax.jit(jax.vmap(jax.grad(logp)))

            gram = jax.jit(
                jax.vmap(lambda p: core.gram_points(p, data.X, data.X, data))
            )

            row = {
                "bucket": n_pad,
                "batch": batch,
                "t_gram_ms": round(timeit(gram, ps) * 1e3, 3),
                "t_chol_ms": round(timeit(chol, K) * 1e3, 3),
                "t_trsm_rhs1_ms": round(timeit(trsm1, L, B1) * 1e3, 3),
                "t_trsm_rhsN_ms": round(timeit(trsmN, L, Bn) * 1e3, 3),
                "t_nll_fwd_ms": round(timeit(v_logp, ps) * 1e3, 3),
                "t_nll_grad_ms": round(timeit(v_grad, ps) * 1e3, 3),
                "cost_chol": cost(jnp.linalg.cholesky, K),
                "cost_nll_grad": cost(
                    jax.vmap(jax.grad(logp)), ps
                ),
            }
            out["rows"].append(row)
            print(row, flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "chol_probe.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
