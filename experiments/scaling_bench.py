"""Scaling table: sharded-inference samples/s + fused-suggest latency at
1/2/4/8 devices (VERDICT r1 next-#2/#3; BASELINE.md "samples/s scaling
efficiency at 1 chip / 1 host / N hosts").

Run with N virtual CPU devices for functional scaling shape:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python experiments/scaling_bench.py

On a real slice the same script measures true ICI scaling (drop the env
overrides).  Writes experiments/scaling_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from hebo_tpu import HEBO, DesignSpace
from hebo_tpu.models.gp.inference import smc_sample_sharded, hmc_sample_sharded


def _gp_problem(n=64, d=6, seed=0):
    space = DesignSpace().parse(
        [{"name": f"x{i}", "type": "num", "lb": -5.0, "ub": 5.0} for i in range(d)]
    )
    rng = np.random.default_rng(seed)
    X = rng.uniform(-5, 5, (n, d)).astype(np.float32)
    y = (np.sum(X**2, axis=1, keepdims=True) / 10.0).astype(np.float32)
    return space, X, y


def bench_smc(mesh, core, data, n_particles=128, n_stages=12, reps=3):
    pkeys = jax.random.split(jax.random.PRNGKey(0), n_particles)
    parts0 = jax.vmap(lambda kk: core.init_params(kk, data))(pkeys)
    run = lambda k: smc_sample_sharded(
        core.log_prior, lambda p: -core.nll(p, data), parts0, k, mesh,
        n_stages=n_stages, n_mala=2,
    )
    parts, z = run(jax.random.PRNGKey(1))
    jax.tree.leaves(parts)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for r in range(reps):
        parts, z = run(jax.random.PRNGKey(2 + r))
        jax.tree.leaves(parts)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    # one "sample" = one particle advanced through all stages
    return n_particles * n_stages / dt, dt


def bench_hmc(mesh, core, data, pf, n_chains=8, n_samples=32, reps=3):
    def logp(p):
        return -core.loss(p, data)

    jkeys = jax.random.split(jax.random.PRNGKey(3), n_chains)
    chain0 = jax.vmap(
        lambda kk: jax.tree.map(
            lambda t: t + 0.05 * jax.random.normal(kk, t.shape, t.dtype), pf
        )
    )(jkeys)
    run = lambda k: hmc_sample_sharded(
        logp, chain0, k, mesh, n_chains=n_chains,
        n_warmup=32, n_samples=n_samples, n_leapfrog=8,
    )
    s, a, r = run(jax.random.PRNGKey(4))
    jax.tree.leaves(s)[0].block_until_ready()
    t0 = time.perf_counter()
    for i in range(reps):
        s, a, r = run(jax.random.PRNGKey(5 + i))
        jax.tree.leaves(s)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return n_chains * (32 + n_samples) / dt, dt


def bench_hebo_suggest(mesh, reps=3, n_dev=1):
    space, X, y = _gp_problem()
    # HEBO(mesh) shards n_restarts×n_dev chains; keep TOTAL restart work
    # fixed (8 chains) across mesh sizes so the overhead metric compares
    # equal work
    kw = dict(pop=64, iters=32, migrate_every=8,
              model_config={"num_epochs": 30,
                            "n_restarts": max(1, 8 // n_dev)})
    opt = HEBO(space, mesh=mesh, **kw) if mesh is not None else HEBO(space, **kw)
    opt.observe(space.inverse_transform(space.transform(
        space.sample(64, seed=0))), y)
    opt.suggest(4)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        opt.suggest(4)
    return (time.perf_counter() - t0) / reps


def bench_hebo_suggest_large_n(mesh, n_obs=2500, reps=2):
    """Bucket-4096 suggest through the large-N product path (VERDICT r4
    next #8): above ``max_cholesky_size`` the suggest pipeline runs the
    subsampled fit + block-sharded posterior factorization
    (``ops/block_chol.block_cholesky_sharded`` on the mesh) + evolution
    acq — the one multi-chip branch whose overhead was unmeasured.
    Returns (wall_s, finite_ok)."""
    space, _, _ = _gp_problem()
    rng = np.random.default_rng(2)
    d = space.num_cols
    Xb = rng.uniform(-5, 5, (n_obs, d)).astype(np.float32)
    yb = (np.sum(Xb**2, axis=1, keepdims=True) / 10.0).astype(np.float32)
    kw = dict(pop=48, iters=16,
              model_config={"num_epochs": 4, "n_restarts": 1,
                            "max_cholesky_size": 1024})
    opt = HEBO(space, mesh=mesh, **kw) if mesh is not None else HEBO(space, **kw)
    df = space.sample(n_obs, seed=0)
    for c in df.columns:
        df[c] = Xb[:, list(df.columns).index(c)]
    opt.observe(df, yb)
    rec = opt.suggest(4)  # compile
    ok = bool(np.all(np.isfinite(space.transform(rec).astype(np.float64))))
    t0 = time.perf_counter()
    for _ in range(reps):
        opt.suggest(4)
    return (time.perf_counter() - t0) / reps, ok


def main():
    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    path = os.path.join(os.path.dirname(__file__), "scaling_results.json")

    # SCALING_LARGE_N_ONLY=1: measure just the bucket-4096 product-path
    # rows and merge them into the existing artifact (the small-shape
    # rows are expensive to re-run and unchanged)
    if os.environ.get("SCALING_LARGE_N_ONLY") == "1":
        large_rows = []
        for n in (1, sizes[-1]) if sizes[-1] > 1 else (1,):
            mesh = Mesh(np.array(devs[:n]), ("shard",)) if n > 1 else None
            dt, ok = bench_hebo_suggest_large_n(mesh)
            large_rows.append({
                "devices": n, "n_obs": 2500, "bucket": 4096,
                "suggest_s": round(dt, 3), "suggestions_finite": ok,
            })
            print(large_rows[-1], flush=True)
        if len(large_rows) == 2:
            large_rows[1]["suggest_partition_overhead"] = round(
                large_rows[1]["suggest_s"] / large_rows[0]["suggest_s"], 3)
        with open(path) as f:
            out = json.load(f)
        out["large_n_rows"] = large_rows
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", path, "(large_n_rows only)")
        return

    space, X, y = _gp_problem()
    from hebo_tpu.models import get_model

    m = get_model("gp", space, num_out=1, num_epochs=20, n_restarts=1)
    m.fit(X, y)
    core, data, pf = m.core, m.data, m.params

    rows = []
    for n in sizes:
        mesh = Mesh(np.array(devs[:n]), ("shard",))
        smc_sps, smc_dt = bench_smc(mesh, core, data)
        hmc_sps, hmc_dt = bench_hmc(mesh, core, data, pf)
        sug_dt = bench_hebo_suggest(mesh if n > 1 else None, n_dev=n)
        rows.append({
            "devices": n,
            "smc_particle_stages_per_s": round(smc_sps, 1),
            "smc_wall_s": round(smc_dt, 4),
            "hmc_transitions_per_s": round(hmc_sps, 1),
            "hmc_wall_s": round(hmc_dt, 4),
            "hebo_suggest_s": round(sug_dt, 4),
        })
        print(rows[-1], flush=True)

    # bucket-4096 large-N product-path row: 1 device vs the full mesh
    large_rows = []
    for n in (1, sizes[-1]) if sizes[-1] > 1 else (1,):
        mesh = Mesh(np.array(devs[:n]), ("shard",)) if n > 1 else None
        dt, ok = bench_hebo_suggest_large_n(mesh)
        large_rows.append({
            "devices": n, "n_obs": 2500, "bucket": 4096,
            "suggest_s": round(dt, 3), "suggestions_finite": ok,
        })
        print(large_rows[-1], flush=True)
    if len(large_rows) == 2:
        large_rows[1]["suggest_partition_overhead"] = round(
            large_rows[1]["suggest_s"] / large_rows[0]["suggest_s"], 3)

    base = rows[0]
    on_cpu = jax.default_backend() == "cpu"
    for r in rows:
        if on_cpu:
            # Virtual CPU devices SHARE the same physical cores: total
            # compute does not grow with N, so throughput/N is 1/N even
            # for a perfect implementation.  The honest fixed-work metric
            # here is partition overhead — wall_N / wall_1 (ideal 1.0):
            # the extra cost of running the same total work as N sharded
            # programs with collectives instead of one program.
            r["smc_partition_overhead"] = round(
                r["smc_wall_s"] / base["smc_wall_s"], 3)
            r["hmc_partition_overhead"] = round(
                r["hmc_wall_s"] / base["hmc_wall_s"], 3)
            r["suggest_partition_overhead"] = round(
                r["hebo_suggest_s"] / base["hebo_suggest_s"], 3)
        else:
            r["smc_scaling_eff"] = round(
                r["smc_particle_stages_per_s"]
                / (base["smc_particle_stages_per_s"] * r["devices"]), 3)
            r["hmc_scaling_eff"] = round(
                r["hmc_transitions_per_s"]
                / (base["hmc_transitions_per_s"] * r["devices"]), 3)

    out = {
        "backend": jax.default_backend(),
        "n_devices_visible": len(devs),
        "note": (
            "virtual CPU devices share physical cores, so speedup is not "
            "measurable — partition_overhead (wall_N/wall_1 at fixed total "
            "work, ideal 1.0) isolates the cost of sharding + collectives; "
            "true ICI scaling_eff requires a real slice (then this script "
            "reports throughput/(t1*N) instead)"
        ),
        "rows": rows,
        "large_n_rows": large_rows,
    }
    path = os.path.join(os.path.dirname(__file__), "scaling_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
