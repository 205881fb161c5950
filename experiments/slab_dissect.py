"""Dissect the slab-kernel cost at (16, 1024): which phase dominates?

Variants timed (chained, dispatch-amortized):
  full        — factor + winv (chol_inv_slab)
  factor-only — the factor pallas_call alone
  micro=0     — factor with the old (bc,128,128) rank-1 diag loop
  nodiag      — factor kernel with the diag factorization REPLACED by a
                copy (upper bound for DMA + panel matmul skeleton cost)
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import hebo_tpu.ops.pallas_chol as pc

    B, N = 16, 1024
    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    K = A @ np.transpose(A, (0, 2, 1)) / N + 0.5 * np.eye(N, dtype=np.float32)
    Kd = jnp.asarray(K)
    CHAIN = 8

    def chain(fn):
        @jax.jit
        def run(Kx):
            def body(c, _):
                r = fn(c)
                r0 = r[0] if isinstance(r, tuple) else r
                return c + 1e-20 * jnp.sum(r0[:, 0, 0]), ()
            c, _ = jax.lax.scan(body, Kx, None, length=CHAIN)
            return c
        return run

    # distinct input per rep: rules out any result caching in the relay
    Kds = [jnp.asarray(K + i * 1e-6) for i in range(7)]

    def timed(fn, name=""):
        jax.block_until_ready(fn(Kds[6]))
        ts = []
        for i in range(6):
            t0 = time.perf_counter(); jax.block_until_ready(fn(Kds[i])); ts.append(time.perf_counter()-t0)
        print(name, [round(t*1e3, 2) for t in ts], flush=True)
        return min(ts)/CHAIN*1e3

    def factor_only(Kx, micro=True, nodiag=False):
        kp = N // pc.BLK
        bc_res = pc._slab_bc(N, resident=True)
        resident = bc_res >= min(B, 8)
        bc = pc._balanced_bc(B, bc_res if resident else pc._slab_bc(N, False))
        Bp = -(-B // bc) * bc
        assert Bp == B, (bc, Bp)

        def kern(a_ref, l_ref, wd_ref, c_ref, lbuf_ref, d_ref, lt_ref, wb_ref, sem):
            i = pl.program_id(0); b0 = i * bc
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
            for j in range(kp):
                c0 = j * pc.BLK
                cp = pltpu.make_async_copy(a_ref.at[pl.ds(b0, bc), :, pl.ds(c0, pc.BLK)], c_ref, sem)
                cp.start(); cp.wait()
                for k in range(j):
                    Lk = lbuf_ref[:, :, k*pc.BLK:(k+1)*pc.BLK]
                    c_ref[:] = c_ref[:] - pc._bmm_t(Lk, Lk[:, c0:c0+pc.BLK, :])
                d_ref[:] = c_ref[:, c0:c0+pc.BLK, :]
                if nodiag:
                    lt_ref[:] = d_ref[:]
                    wb_ref[:] = d_ref[:]
                elif micro:
                    pc._diag_factor_inverse_mb(d_ref, lt_ref, wb_ref, bc)
                else:
                    pc._diag_factor_inverse(d_ref, lt_ref, wb_ref, bc)
                cpw = pltpu.make_async_copy(wb_ref, wd_ref.at[pl.ds(b0, bc), j], sem)
                cpw.start()
                P = pc._bmm_t(c_ref[:], wb_ref[:])
                c_ref[:] = jnp.where(rows >= c0 + pc.BLK, P, 0.0)
                c_ref[:, c0:c0+pc.BLK, :] = jnp.transpose(lt_ref[:], (0, 2, 1))
                lbuf_ref[:, :, c0:c0+pc.BLK] = c_ref[:]
                cpw.wait()
                cpo = pltpu.make_async_copy(c_ref, l_ref.at[pl.ds(b0, bc), :, pl.ds(c0, pc.BLK)], sem)
                cpo.start(); cpo.wait()

        return pl.pallas_call(
            kern, grid=(Bp // bc,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_shape=[jax.ShapeDtypeStruct((Bp, N, N), jnp.float32),
                       jax.ShapeDtypeStruct((Bp, kp, pc.BLK, pc.BLK), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((bc, N, pc.BLK), jnp.float32),
                pltpu.VMEM((bc, N, N), jnp.float32),
                pltpu.VMEM((bc, pc.BLK, pc.BLK), jnp.float32),
                pltpu.VMEM((bc, pc.BLK, pc.BLK), jnp.float32),
                pltpu.VMEM((bc, pc.BLK, pc.BLK), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=pc._VMEM_LIMIT),
        )(Kx)

    out = {}
    out["empty_ms"] = timed(chain(lambda c: (c,)), "empty")
    out["full_ms"] = timed(chain(lambda c: pc.chol_inv_slab(c)), "full")
    out["factor_micro_ms"] = timed(chain(lambda c: factor_only(c, micro=True)), "micro")
    out["factor_old_ms"] = timed(chain(lambda c: factor_only(c, micro=False)), "old")
    out["factor_nodiag_ms"] = timed(chain(lambda c: factor_only(c, nodiag=True)), "nodiag")
    for k, v in out.items():
        out[k] = round(v, 3)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "slab_dissect.json"), "w") as f:
        json.dump(out, f, indent=2)

if __name__ == "__main__":
    main()
