"""Slab-kernel probe on the real chip: correctness + chained timing vs XLA."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from hebo_tpu.ops.pallas_chol import chol_inv_slab

    print("backend:", jax.default_backend(), flush=True)
    CHAIN = 8
    out = {"rows": []}

    def chain_fn(fn):
        @jax.jit
        def run(K):
            def body(c, _):
                r = fn(c)
                if not isinstance(r, tuple):
                    r = (r,)
                # feed a scalar from EVERY output back so steps are
                # dependent and no output is dead code (the r4 version
                # fed only r[0] → the fused-inverse/trsm calls were
                # DCE'd and those columns were factor-only numbers)
                s = sum(1e-20 * jnp.sum(ri[:, 0, 0]) for ri in r)
                return c + s, ()
            c, _ = jax.lax.scan(body, K, None, length=CHAIN)
            # reduce to a scalar so the sync (device_get) transfers 4
            # bytes, not the 64 MB iterate, yet depends on every step
            return jnp.sum(c[:, 0, :2])
        return run

    rng = np.random.default_rng(0)
    for B, N in [(16, 1024), (32, 1024), (64, 256), (16, 512), (8, 2048)]:
        A = rng.normal(size=(B, N, N)).astype(np.float32)
        K = A @ np.transpose(A, (0, 2, 1)) / N + 0.5 * np.eye(N, dtype=np.float32)
        Kd = jnp.asarray(K)
        # correctness (single call)
        L, W = chol_inv_slab(Kd)
        L, W = np.asarray(L), np.asarray(W)
        Lr = np.linalg.cholesky(K.astype(np.float64)).astype(np.float32)
        errL = float(np.abs(L - Lr).max())
        errW = float(np.abs(np.einsum('bij,bjk->bik', W, L) - np.eye(N, dtype=np.float32)).max())

        xla_chol = chain_fn(lambda c: jnp.linalg.cholesky(c))
        slab = chain_fn(lambda c: chol_inv_slab(c))
        def trsm(c):
            Lc = jnp.linalg.cholesky(c)
            Wc = jax.scipy.linalg.solve_triangular(Lc, jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), Lc.shape), lower=True)
            return (Lc, Wc)  # chain_fn consumes BOTH outputs (no DCE)
        xla_choltrsm = chain_fn(trsm)

        def timed(fn):
            # sync via device_get of the scalar result — block_until_ready
            # is not a barrier through the async axon relay
            jax.device_get(fn(Kd))
            ts = []
            for _ in range(6):
                t0 = time.perf_counter(); jax.device_get(fn(Kd)); ts.append(time.perf_counter() - t0)
            return min(ts) / CHAIN * 1e3

        t_xla = timed(xla_chol)
        t_slab = timed(slab)
        t_xt = timed(xla_choltrsm)
        from hebo_tpu.ops.chol import _use_slab
        row = {"B": B, "N": N, "in_gate": bool(_use_slab(N, B)),
               "errL": errL, "errWL": errW,
               "xla_chol_ms": round(t_xla, 3), "slab_cholinv_ms": round(t_slab, 3),
               "xla_chol_trsm_ms": round(t_xt, 3)}
        out["rows"].append(row)
        print(row, flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "slab_probe.json"), "w") as f:
        json.dump(out, f, indent=2)

if __name__ == "__main__":
    main()
