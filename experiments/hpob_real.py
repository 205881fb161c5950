"""Evaluate repo GP-BO on the reference's REAL HPO-B-format data.

VERDICT r2 missing #1: `/root/reference/NAP/HPO_data/` ships ~30 real
`hpobenchXGB_*_eq.pkl` datasets (each: 1000 discretized XGBoost configs
in a 6-d domain with measured accuracies — the finite-domain surrogate
format produced by NAP's HPOB converter, HPOB_data/convertHPOB.py), and
`/root/reference/NAP/results/HPO-B/{GP,NAP,OptFormer,Random}.json` are
the reference's published traces: per-space → per-dataset →
``test0..test4`` → 101-length best-so-far **normalized accuracy**
curves.

This harness runs the repo GP (pSGLD ensemble, EI over the finite
domain — the reference GP policy's protocol, scripts/gp/test_gp_hpo.py)
and a Random baseline on every shipped dataset under that exact
protocol (5 seeds, 5-point init, 100 steps, 101-entry curves,
per-dataset min/max normalization), and emits
``experiments/hpob_vs_reference.json`` whose ``traces`` block uses the
exact NAP.json schema.

TPU-native design: all (datasets × seeds) problems run as ONE vmapped
program — each BO iteration is a single jitted step that fits every
problem's GP and scores every problem's 1000 candidates in batch.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
        python experiments/hpob_real.py
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_DIR = "/root/reference/NAP"
N_SEEDS = int(os.environ.get("HPOB_SEEDS", 5))
N_INIT = 5
N_STEPS = int(os.environ.get("HPOB_STEPS", 100))
MAX_DS = int(os.environ.get("HPOB_MAX_DS", 0))  # 0 = all
BUCKET = 128
SPACE_KEY = "hpobenchXGB"


def load_datasets():
    paths = sorted(
        glob.glob(os.path.join(REF_DIR, "HPO_data", "hpobenchXGB_*_eq.pkl")),
        key=lambda p: int(os.path.basename(p).split("_")[1]),
    )
    doms, accs, names, valids = [], [], [], []
    n_max = 1000
    for p in paths:
        with open(p, "rb") as f:
            d = pickle.load(f)
        X = np.asarray(d["domain"], np.float32)
        a = np.asarray(d["accs"], np.float32)
        lo, hi = X.min(0), X.max(0)
        span = np.where(hi - lo < 1e-12, 1.0, hi - lo)
        X = (X - lo) / span
        n = len(X)
        valid = np.zeros((n_max,), bool)
        valid[:n] = True
        if n < n_max:  # one dataset ships 897 points: pad + mask
            X = np.concatenate([X, np.repeat(X[:1], n_max - n, axis=0)])
            a = np.concatenate([a, np.full(n_max - n, a.min(), np.float32)])
        doms.append(X)
        accs.append(a)
        valids.append(valid)
        names.append(os.path.basename(p).split("_")[1])
    if MAX_DS:
        doms, accs, names, valids = (
            doms[:MAX_DS], accs[:MAX_DS], names[:MAX_DS], valids[:MAX_DS]
        )
    return np.stack(doms), np.stack(accs), names, np.stack(valids)


def norm_curve(acc_seq, a_min, a_max):
    """best-so-far accuracy, normalized by the dataset's min/max (the
    HPO-B metric the reference JSONs carry; curves reach 1.0 when the
    domain optimum is found)."""
    best = np.maximum.accumulate(acc_seq)
    return (best - a_min) / max(a_max - a_min, 1e-12)


def run_gp(doms, accs, valids):
    import jax
    import jax.numpy as jnp

    from hebo_tpu.models.gp.gp import GPCore, GPData

    n_ds, n_cand, d = doms.shape
    P = n_ds * N_SEEDS
    T = N_INIT + N_STEPS

    core = GPCore(
        numeric_dims=tuple(range(d)), cat_dims=(), num_categories=(),
        n_steps=48, n_ensemble=8, lr=0.05,
    )

    dom_all = jnp.asarray(np.repeat(doms, N_SEEDS, axis=0))  # (P,1000,d)
    # minimize y = -acc
    y_all = jnp.asarray(np.repeat(-accs, N_SEEDS, axis=0))  # (P,1000)
    valid_all = jnp.asarray(np.repeat(valids, N_SEEDS, axis=0))  # (P,1000)

    def one_problem(key, dom, yfull, valid, chosen, count):
        idx = jnp.arange(T)
        mask_t = idx < count
        Xp = jnp.zeros((BUCKET, d), jnp.float32)
        Xp = Xp.at[:T].set(jnp.where(mask_t[:, None], dom[chosen], 0.0))
        yo = jnp.where(mask_t, yfull[chosen], 0.0)
        cnt = jnp.maximum(count.astype(jnp.float32), 1.0)
        mu_y = jnp.sum(yo) / cnt
        sd_y = jnp.sqrt(
            jnp.maximum(jnp.sum((yo - mu_y) ** 2 * mask_t) / cnt, 1e-12)
        )
        sd_y = jnp.where(sd_y > 1e-6, sd_y, 1.0)
        yp = jnp.zeros((BUCKET, 1), jnp.float32)
        yp = yp.at[:T, 0].set((yo - mu_y) / sd_y * mask_t)
        maskp = jnp.zeros((BUCKET,), bool).at[:T].set(mask_t)
        data = GPData(
            X=Xp, y=yp, mask=maskp,
            x_lb=jnp.zeros((d,), jnp.float32),
            x_span=jnp.ones((d,), jnp.float32),
            y_mean=mu_y, y_std=sd_y,
        )
        k1, k2 = jax.random.split(key)
        p0 = core.init_params(k1, data)
        pf, loss, samples = core.fit_from(k2, p0, data)
        caches = jax.vmap(lambda p: core.posterior_cache(p, data))(samples)
        mu_s, var_s = core.predict_ensemble(samples, caches, data, dom)
        mu = mu_s[:, 0] * sd_y + mu_y
        sig = jnp.sqrt(jnp.maximum(var_s[:, 0], 1e-12)) * sd_y
        best = jnp.min(jnp.where(mask_t, yfull[chosen], jnp.inf))
        imp = best - mu
        z = imp / sig
        Phi = 0.5 * (1.0 + jax.lax.erf(z / np.sqrt(2.0)))
        phi = jnp.exp(-0.5 * z**2) / np.sqrt(2.0 * np.pi)
        ei = imp * Phi + sig * phi
        # never re-pick an observed candidate
        taken = jnp.zeros((n_cand,), bool).at[chosen].set(mask_t)
        ei = jnp.where(taken | ~valid, -jnp.inf, ei)
        return jnp.argmax(ei).astype(jnp.int32)

    @jax.jit
    def step(key, chosen, count):
        keys = jax.random.split(key, P)
        nxt = jax.vmap(one_problem, in_axes=(0, 0, 0, 0, 0, None))(
            keys, dom_all, y_all, valid_all, chosen, count
        )
        chosen = chosen.at[:, count].set(nxt)
        return chosen

    # seed-s init: first N_INIT of a seeded permutation (document: the
    # reference's HPO-B testK inits are fixed index sets; hpobenchXGB
    # ships none, so seeded permutations stand in — identical across
    # methods so comparisons stay paired)
    chosen0 = np.zeros((P, T), np.int32)
    for p in range(P):
        ds, seed = divmod(p, N_SEEDS)
        rng = np.random.default_rng(1000 * seed + ds)
        n_v = int(valids[ds].sum())
        chosen0[p, :N_INIT] = rng.permutation(n_v)[:N_INIT]
    chosen = jnp.asarray(chosen0)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for t in range(N_STEPS):
        key, sub = jax.random.split(key)
        chosen = step(sub, chosen, jnp.asarray(N_INIT + t, jnp.int32))
        if t % 10 == 0:
            print(f"gp step {t}/{N_STEPS} ({time.time()-t0:.0f}s)",
                  flush=True)
    return np.asarray(chosen)


def run_random(doms, accs, valids):
    n_ds, n_cand, _ = doms.shape
    T = N_INIT + N_STEPS
    chosen = np.zeros((n_ds * N_SEEDS, T), np.int32)
    for p in range(n_ds * N_SEEDS):
        ds, seed = divmod(p, N_SEEDS)
        rng = np.random.default_rng(1000 * seed + ds)
        perm = rng.permutation(int(valids[ds].sum()))
        chosen[p] = perm[:T]  # same init prefix as the GP arm
    return chosen


def curves_from_chosen(chosen, accs, names, valids):
    out = {SPACE_KEY: {}}
    n_ds = len(names)
    for ds in range(n_ds):
        a = accs[ds][valids[ds]]
        a_min, a_max = float(a.min()), float(a.max())
        a = accs[ds]  # index space of `chosen` (padded)
        tr = {}
        for seed in range(N_SEEDS):
            p = ds * N_SEEDS + seed
            seq = a[chosen[p]]
            bs = norm_curve(seq, a_min, a_max)
            # 101 entries: best-of-init then one per BO step
            curve = [float(bs[N_INIT - 1])] + [
                float(bs[N_INIT + t]) for t in range(N_STEPS)
            ]
            tr[f"test{seed}"] = curve
        out[SPACE_KEY][names[ds]] = tr
    return out


def aggregate(traces):
    cs = []
    for sp in traces.values():
        for ds in sp.values():
            for c in ds.values():
                cs.append(c)
    cs = np.asarray(cs)
    return cs.mean(0), cs.std(0), cs.shape[0]


def main():
    doms, accs, names, valids = load_datasets()
    print(f"{len(names)} datasets, domain {doms.shape}", flush=True)

    rnd_chosen = run_random(doms, accs, valids)
    rnd_traces = curves_from_chosen(rnd_chosen, accs, names, valids)

    gp_chosen = run_gp(doms, accs, valids)
    gp_traces = curves_from_chosen(gp_chosen, accs, names, valids)

    # reference aggregates (their 16 HPO-B spaces)
    ref = {}
    for nm in ("GP", "Random", "NAP"):
        with open(os.path.join(REF_DIR, "results", "HPO-B", nm + ".json")) as f:
            ref[nm] = json.load(f)

    gp_m, gp_s, n_gp = aggregate(gp_traces)
    rd_m, rd_s, _ = aggregate(rnd_traces)
    ref_gp_m, ref_gp_s, n_ref = aggregate(ref["GP"])
    ref_rd_m, ref_rd_s, _ = aggregate(ref["Random"])

    se = lambda s, n: s / np.sqrt(max(n, 1))
    final = {
        "repo_gp": [float(gp_m[-1]), float(2 * se(gp_s[-1], n_gp))],
        "repo_random": [float(rd_m[-1]), float(2 * se(rd_s[-1], n_gp))],
        "ref_gp": [float(ref_gp_m[-1]), float(2 * se(ref_gp_s[-1], n_ref))],
        "ref_random": [float(ref_rd_m[-1]), float(2 * se(ref_rd_s[-1], n_ref))],
    }
    lo_a = final["repo_gp"][0] - final["repo_gp"][1]
    hi_a = final["repo_gp"][0] + final["repo_gp"][1]
    lo_b = final["ref_gp"][0] - final["ref_gp"][1]
    hi_b = final["ref_gp"][0] + final["ref_gp"][1]
    overlap = (lo_a <= hi_b) and (lo_b <= hi_a)

    out = {
        "protocol": {
            "source_data": "NAP/HPO_data/hpobenchXGB_*_eq.pkl (30 real "
                           "finite-domain datasets, 1000x6)",
            "metric": "best-so-far accuracy normalized by dataset min/max "
                      "(HPO-B convention; reference JSON curves)",
            "seeds": N_SEEDS, "n_init": N_INIT, "n_steps": N_STEPS,
            "curve_len": N_STEPS + 1,
            "init": "seeded permutation prefix, identical across methods "
                    "(the reference's fixed HPO-B test inits are not "
                    "shipped for hpobenchXGB)",
            "note": "reference traces cover HPO-B's 16 meta-spaces (data "
                    "not shipped, download script HPOB_data/convertHPOB.py "
                    "requires network); comparison is therefore at the "
                    "protocol/aggregate level on the reference's own "
                    "shipped hpobenchXGB data",
        },
        "traces": gp_traces,
        "traces_random": rnd_traces,
        "aggregate": {
            "repo_gp_mean_curve": [round(float(v), 5) for v in gp_m],
            "repo_random_mean_curve": [round(float(v), 5) for v in rd_m],
            "ref_gp_mean_curve": [round(float(v), 5) for v in ref_gp_m],
            "ref_random_mean_curve": [round(float(v), 5) for v in ref_rd_m],
            "final_mean_pm_2se": final,
            "final_bands_overlap_repo_gp_vs_ref_gp": bool(overlap),
            "repo_gp_above_ref_gp": bool(
                final["repo_gp"][0] > final["ref_gp"][0]
            ),
            "gp_minus_random_final_gap": {
                "repo": round(float(gp_m[-1] - rd_m[-1]), 5),
                "reference": round(float(ref_gp_m[-1] - ref_rd_m[-1]), 5),
            },
        },
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "hpob_vs_reference.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("final:", json.dumps(final))
    print("overlap:", overlap)
    print("wrote", path)


if __name__ == "__main__":
    main()
