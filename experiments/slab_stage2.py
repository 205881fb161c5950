"""Slab-kernel stage-2 probe (r5): phase attribution + merged-diag timing.

Times, chained and dispatch-amortized (slab_probe.py methodology — the
failed slab_dissect.py attempt chained through a scalar that XLA hoisted;
here every link feeds the full matrix back through the next call):

  factor[m1]   — factor pallas_call only, r4 two-phase diag (micro=1)
  factor[m2]   — factor pallas_call only, r5 merged diag (micro=2)
  winv         — W = L⁻¹ assembly pallas_call only
  full[m2]     — chol_inv_slab end-to-end
  xla_chol / xla_chol_trsm — the expander references

Writes experiments/slab_stage2.json.  TPU-only (run as the single
TPU-attached process; redirect output to a file).
"""
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
        ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import hebo_tpu.ops.pallas_chol as pc

    print("backend:", jax.default_backend(), flush=True)
    CHAIN = 8
    out = {"chain": CHAIN, "rows": []}

    def chain_fn(fn):
        """Feed ALL outputs back into the next input: every link is
        data-dependent on every output, so XLA cannot dead-code-eliminate
        any of them.  (The r4 slab_probe chains fed only r[0]=L back —
        the fused-inverse pallas_call and the trsm were DCE'd, so those
        columns were factor-only numbers.)"""
        @jax.jit
        def run(K, eps):
            def body(c, _):
                r = fn(c)
                if not isinstance(r, tuple):
                    r = (r,)
                # keep the iterate SPD-ish and structurally dependent
                for ri in r:
                    c = c + eps * ri
                return c, ()
            c, _ = jax.lax.scan(body, K, None, length=CHAIN)
            return c
        return run

    def timed(fn, Kd, eps):
        jax.block_until_ready(fn(Kd, eps))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(Kd, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts) / CHAIN * 1e3

    shapes_env = os.environ.get("SLAB2_SHAPES", "16x1024,8x2048,64x256")
    shapes = [tuple(int(v) for v in s.split("x"))
              for s in shapes_env.split(",")]
    rng = np.random.default_rng(0)
    for B, N in shapes:
        A = rng.normal(size=(B, N, N)).astype(np.float32)
        K = (A @ np.transpose(A, (0, 2, 1)) / N
             + 0.5 * np.eye(N, dtype=np.float32))
        Kd = jnp.asarray(K)
        eps = jnp.asarray(1e-6, jnp.float32)

        kp = N // pc.BLK
        bc_res = pc._slab_bc(N, resident=True)
        resident = bc_res >= min(B, 8)
        bc = pc._balanced_bc(
            B, bc_res if resident else pc._slab_bc(N, resident=False))
        assert -(-B // bc) * bc == B, (B, bc)

        # correctness of the merged variant on chip
        L, W = pc.chol_inv_slab(Kd, micro=2)
        Lr = np.linalg.cholesky(K.astype(np.float64)).astype(np.float32)
        errL = float(np.abs(np.asarray(L) - Lr).max())
        errW = float(np.abs(
            np.einsum("bij,bjk->bik", np.asarray(W), np.asarray(L))
            - np.eye(N, dtype=np.float32)).max())

        # m1 (the r4 two-phase diag) baselines are the committed r4
        # slab_probe.json rows — not re-timed here (each distinct Mosaic
        # kernel costs ~8 min of remote compile through the tunnel)
        variants = {
            "factor_m2": chain_fn(
                lambda c: pc._run_factor(c, bc, kp, resident, 2, False)[0]),
            "full_m2": chain_fn(lambda c: pc.chol_inv_slab(c, micro=2)),
            "xla_chol": chain_fn(lambda c: jnp.linalg.cholesky(c)),
        }

        def trsm(c):
            Lc = jnp.linalg.cholesky(c)
            Wc = jax.scipy.linalg.solve_triangular(
                Lc,
                jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), Lc.shape),
                lower=True)
            return Lc + 0.0 * Wc[:, :1, :1]
        variants["xla_chol_trsm"] = chain_fn(trsm)

        # winv-only: dependent chain feeding eps*W back into L (both are
        # lower-triangular, so the iterate stays in-domain)
        Ld = jnp.asarray(np.asarray(L))
        Wd_d = pc._run_factor(Kd, bc, kp, resident, 2, False)[1]

        @jax.jit
        def winv_chain2(Lx, eps):
            def body(c, _):
                Wx = pc._run_winv(c, Wd_d, bc_res, resident, False)
                return c + eps * Wx, ()
            c, _ = jax.lax.scan(body, Lx, None, length=CHAIN)
            return c

        row = {"B": B, "N": N, "bc": bc, "resident": bool(resident),
               "errL_m2": errL, "errWL_m2": errW}
        for name, fn in variants.items():
            row[name + "_ms"] = round(timed(fn, Kd, eps), 3)
        row["winv_ms"] = round(timed(winv_chain2, Ld, eps), 3)
        out["rows"].append(row)
        print(row, flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "slab_stage2.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
