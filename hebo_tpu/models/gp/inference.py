"""Hyperparameter posterior inference: HMC, SVI, SMC over GP pytrees.

The reference's hyperparameter-posterior machinery is pSGLD
(HEBO/hebo/models/nn/sgld.py:15-114), univariate slice sampling
(MCBO/mcbo/models/gp/combo_gp.py:211-247) and Gibbs for linear models
(MCBO linear_regression.py:123-124) — all sequential CPU loops.  The
TPU-native generalization (BASELINE.json north star): gradient-based
samplers whose *chains/particles are a batch axis*:

  * ``hmc_sample`` — leapfrog HMC with dual-averaging step-size adaptation
    (Hoffman & Gelman 2014 Alg. 5 schedule) and jittered trajectory
    lengths; chains via ``vmap``, NaN-guarded divergence rejection
    (mirrors the reference's "reject divergent trajectory" policy,
    SURVEY.md §5.3).
  * ``svi_fit`` — mean-field Gaussian over unconstrained hyperparameters,
    reparametrized ELBO by Adam.
  * ``smc_sample`` — likelihood-tempered sequential Monte Carlo:
    prior-sampled particles, annealed importance weighting with adaptive
    ESS-triggered systematic resampling, MALA mutation moves.

All functions operate on a generic pytree ``params`` and a closure
``logp(params) -> scalar`` so they serve every surrogate, not just the GP.

Cross-device scaling (the BASELINE.json north star): ``hmc_sample_sharded``
shards chains and ``smc_sample_sharded`` shards particles over a
``jax.sharding.Mesh`` with ``shard_map`` — SMC weight normalization and
ESS are global ``psum`` reductions, resampling is *global* systematic
resampling over an ``all_gather`` of the (small) particle pytrees, and
HMC reports a cross-chain split-R̂ computed with ``psum`` moments.  Both
run identically on a real TPU slice (ICI collectives) and the CPU test
backend with ``--xla_force_host_platform_device_count``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "hmc_sample",
    "hmc_sample_sharded",
    "svi_fit",
    "smc_sample",
    "smc_sample_sharded",
    "slice_sample",
]


# ---------------------------------------------------------------- tree utils
def _tree_randn_like(key, tree):
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    new = [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    return jax.tree.unflatten(treedef, new)


def _tree_dot(a, b):
    return sum(
        jnp.sum(x * y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _tree_axpy(alpha, x, y):
    """y + alpha * x"""
    return jax.tree.map(lambda xi, yi: yi + alpha * xi, x, y)


def _tree_scale(alpha, x):
    return jax.tree.map(lambda t: alpha * t, x)


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


# Zero-sized leaves (e.g. the GP's empty categorical-embedding table on
# cat-free spaces) cannot pass through shard_map: XLA normalizes them to
# replicated, tripping the sharding-override check.  Pack them into (n, 1)
# dummies at the boundary and restore the true trailing shapes inside.
def _zero_leaf_trails(tree):
    """Trailing shapes (beyond the leading batch axis) per flattened leaf;
    None for leaves that need no packing."""
    return [
        tuple(l.shape[1:]) if (l.size == 0 and l.ndim >= 1) else None
        for l in jax.tree.leaves(tree)
    ]


def _pack_zero_leaves(tree, trails):
    leaves, treedef = jax.tree.flatten(tree)
    out = [
        jnp.zeros((l.shape[0], 1), l.dtype) if t is not None else l
        for l, t in zip(leaves, trails)
    ]
    return jax.tree.unflatten(treedef, out)


def _unpack_zero_leaves(tree, trails):
    leaves, treedef = jax.tree.flatten(tree)
    # slice-to-empty (not jnp.zeros) so the restored leaf inherits the
    # packed leaf's device-varying metadata under shard_map
    out = [
        l[:, :0].reshape((l.shape[0],) + t) if t is not None else l
        for l, t in zip(leaves, trails)
    ]
    return jax.tree.unflatten(treedef, out)


# ----------------------------------------------------------------------- HMC
class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray  # dual-averaging anchor (Stan re-anchors at mass switch)


def _leapfrog(grad_fn, q, p, eps, n_steps, inv_mass):
    """Leapfrog with a diagonal mass matrix M = inv_mass⁻¹ (pytree):
    q̇ = M⁻¹p = inv_mass ⊙ p, kinetic = ½ pᵀ(inv_mass)p."""

    def body(_, qp):
        q, p = qp
        p = _tree_axpy(0.5 * eps, grad_fn(q), p)
        q = jax.tree.map(lambda a, v, b: a + eps * v * b, q, inv_mass, p)
        p = _tree_axpy(0.5 * eps, grad_fn(q), p)
        return q, p

    return lax.fori_loop(0, n_steps, body, (q, p))


def _make_hmc_chain(
    logp: Callable,
    *,
    n_warmup: int,
    n_samples: int,
    n_leapfrog: int,
    init_step: float,
    target_accept: float,
):
    """Build ``one_chain(key, q0) -> (samples, accept_rate)`` — the single-
    chain HMC kernel shared by the vmapped and shard_mapped front ends."""
    grad_fn = jax.grad(logp)
    total = n_warmup + n_samples  # one retained draw per post-warmup step

    # dual-averaging constants (Hoffman-Gelman)
    mu_da = jnp.log(10.0 * init_step)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    # diagonal mass-matrix window: Welford moments over the middle half of
    # warmup, switch at 3/4 and give dual averaging the last quarter to
    # re-adapt the step size to the new metric (Stan's windowed scheme,
    # collapsed to one window; fixes the acceptance collapse at large
    # buckets — 0.47 at bucket 1024 with identity mass, VERDICT r2 weak #5)
    w_lo = n_warmup // 4
    w_hi = max((3 * n_warmup) // 4, w_lo)

    def one_chain(key, q0):
        # derive the zero from the (possibly device-varying) key so the
        # dual-averaging carry has consistent varying-axis metadata when
        # this kernel runs under shard_map (see shard_map scan-vma docs)
        z = jnp.sum(key).astype(jnp.float32) * 0.0
        da0 = _DAState(
            jnp.log(init_step) + z, jnp.log(init_step) + z, z, z, mu_da + z
        )
        zeros = jax.tree.map(lambda t: jnp.zeros_like(t) + z, q0)
        ones = jax.tree.map(lambda t: jnp.ones_like(t) + z, q0)
        mstat0 = (zeros, zeros, z, ones)  # (mean, m2, count, inv_mass)

        def step(carry, i):
            q, da, k, mstat = carry
            mean, m2, cnt, inv_mass = mstat
            k, k_mom, k_acc, k_jit = jax.random.split(k, 4)
            xi = _tree_randn_like(k_mom, q)
            # p ~ N(0, M) with M = inv_mass⁻¹ (diagonal)
            p = jax.tree.map(lambda x, v: x / jnp.sqrt(v), xi, inv_mass)
            eps = jnp.exp(da.log_eps)
            # jittered trajectory length: 1..n_leapfrog
            n_lf = jax.random.randint(k_jit, (), 1, n_leapfrog + 1)
            q_new, p_new = _leapfrog(grad_fn, q, p, eps, n_lf, inv_mass)

            def kin(pp):
                return 0.5 * sum(
                    jnp.sum(v * t**2)
                    for v, t in zip(
                        jax.tree.leaves(inv_mass), jax.tree.leaves(pp)
                    )
                )

            h0 = -logp(q) + kin(p)
            h1 = -logp(q_new) + kin(p_new)
            log_alpha = jnp.minimum(0.0, h0 - h1)
            # NaN guard: divergent trajectory → reject
            finite = jnp.isfinite(h1)
            log_alpha = jnp.where(finite, log_alpha, -jnp.inf)
            accept = jnp.log(jax.random.uniform(k_acc, ())) < log_alpha
            q = _tree_where(accept, q_new, q)
            a_prob = jnp.where(finite, jnp.exp(log_alpha), 0.0)

            # Welford moments of q inside the adaptation window
            w_in = ((i >= w_lo) & (i < w_hi)).astype(jnp.float32)
            cnt2 = cnt + w_in
            denom = jnp.maximum(cnt2, 1.0)
            delta = jax.tree.map(lambda a, mu: a - mu, q, mean)
            mean2 = jax.tree.map(
                lambda mu, d: mu + w_in * d / denom, mean, delta
            )
            m2n = jax.tree.map(
                lambda s, d, a, mu: s + w_in * d * (a - mu),
                m2, delta, q, mean2,
            )
            # switch to the estimated metric at the end of the window
            at_switch = (i == w_hi) & (cnt2 > 2.0)
            var = jax.tree.map(
                lambda s: jnp.clip(
                    s / jnp.maximum(cnt2 - 1.0, 1.0), 1e-4, 1e4
                ),
                m2n,
            )
            inv_mass = jax.tree.map(
                lambda v, old: jnp.where(at_switch, v, old), var, inv_mass
            )

            # dual averaging during warmup; frozen after.  At the mass
            # switch, restart the averaging clock AND re-anchor mu to the
            # pre-switch converged step size (Stan sets mu = log(10·eps)
            # at each window boundary) so the last-quarter re-adaptation
            # is pulled toward where adaptation converged, not back to
            # the init-based anchor (ADVICE r3).
            in_warmup = i < n_warmup
            t = jnp.where(at_switch, 1.0, da.t + 1.0)
            h_bar_prev = jnp.where(at_switch, 0.0, da.h_bar)
            mu = jnp.where(
                at_switch, jnp.log(10.0) + da.log_eps_bar, da.mu
            )
            h_bar = (1.0 - 1.0 / (t + t0)) * h_bar_prev + (
                target_accept - a_prob
            ) / (t + t0)
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * da.log_eps_bar
            da_new = _DAState(log_eps, log_eps_bar, h_bar, t, mu)
            da_frozen = _DAState(
                da.log_eps_bar, da.log_eps_bar, da.h_bar, da.t, da.mu
            )
            da = jax.tree.map(
                lambda n, f: jnp.where(in_warmup, n, f), da_new, da_frozen
            )
            return (q, da, k, (mean2, m2n, cnt2, inv_mass)), (q, a_prob)

        (_, _, _, _), (qs, a_probs) = lax.scan(
            step, (q0, da0, key, mstat0), jnp.arange(total)
        )
        # retain the post-warmup draws
        samples = jax.tree.map(lambda t: t[n_warmup:], qs)
        return samples, jnp.mean(a_probs[n_warmup:])

    return one_chain


def hmc_sample(
    logp: Callable,
    init_params,
    key: jax.Array,
    *,
    n_chains: int = 4,
    n_warmup: int = 64,
    n_samples: int = 16,
    n_leapfrog: int = 8,
    init_step: float = 0.02,
    target_accept: float = 0.8,
):
    """Run ``n_chains`` HMC chains; returns (samples, accept_rate).

    ``init_params``: pytree with a leading chain axis of size n_chains
    (e.g. built by vmapping an init function over split keys).
    ``samples``: pytree with leading axis (n_samples, n_chains, ...)
    thinned evenly from the post-warmup phase.
    """
    one_chain = _make_hmc_chain(
        logp, n_warmup=n_warmup, n_samples=n_samples, n_leapfrog=n_leapfrog,
        init_step=init_step, target_accept=target_accept,
    )
    keys = jax.random.split(key, n_chains)
    samples, acc = jax.vmap(one_chain)(keys, init_params)
    # reorder to (n_samples, n_chains, ...)
    samples = jax.tree.map(lambda t: jnp.swapaxes(t, 0, 1), samples)
    return samples, acc


def hmc_sample_sharded(
    logp: Callable,
    init_params,
    key: jax.Array,
    mesh,
    *,
    axis: Optional[str] = None,
    n_chains: int = 8,
    n_warmup: int = 64,
    n_samples: int = 16,
    n_leapfrog: int = 8,
    init_step: float = 0.02,
    target_accept: float = 0.8,
):
    """Chain-parallel HMC across a device mesh (north-star P2 axis).

    ``init_params``: pytree with leading chain axis ``n_chains`` (must be a
    multiple of the mesh size); chains are sharded with ``shard_map`` —
    each device runs its chain block with the identical kernel used by
    ``hmc_sample``, so 1-device and N-device runs are statistically
    equivalent (same per-chain keys).  A cross-chain potential
    scale-reduction factor (split-R̂ of a scalar pytree summary) is
    computed in-graph with ``psum`` moment reductions.

    Returns (samples (n_samples, n_chains, ...), accept_rate (n_chains,),
    rhat scalar).
    """
    from jax.sharding import PartitionSpec as P

    axis = axis or mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert n_chains % n_dev == 0, (n_chains, n_dev)
    one_chain = _make_hmc_chain(
        logp, n_warmup=n_warmup, n_samples=n_samples, n_leapfrog=n_leapfrog,
        init_step=init_step, target_accept=target_accept,
    )

    def _summary(tree):
        """Scalar per-sample summary for the R̂ diagnostic."""
        return sum(
            jnp.sum(l, axis=tuple(range(1, l.ndim)))
            for l in jax.tree.leaves(tree)
        )

    trails = _zero_leaf_trails(init_params)

    def per_device(keys_local, q0_local):
        q0_local = _unpack_zero_leaves(q0_local, trails)
        samples, acc = jax.vmap(one_chain)(keys_local, q0_local)
        # split-R̂ over ALL chains: B/W from psum'd moments of the summary
        s = jax.vmap(_summary)(samples)  # (chains_local, n_samples)
        ch_mean = jnp.mean(s, axis=1)  # (chains_local,)
        ch_var = jnp.var(s, axis=1, ddof=1)  # (chains_local,)
        m = n_chains
        grand = lax.psum(jnp.sum(ch_mean), axis) / m
        B = lax.psum(jnp.sum((ch_mean - grand) ** 2), axis) * n_samples / (m - 1)
        W = lax.psum(jnp.sum(ch_var), axis) / m
        var_plus = (n_samples - 1) / n_samples * W + B / n_samples
        rhat = jnp.sqrt(var_plus / jnp.maximum(W, 1e-12))
        return _pack_zero_leaves(samples, trails), acc, rhat

    smapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
    )
    keys = jax.random.split(key, n_chains)
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(axis))
    keys = jax.device_put(keys, sh)
    init_packed = jax.device_put(_pack_zero_leaves(init_params, trails), sh)
    samples, acc, rhat = smapped(keys, init_packed)
    # restore zero-sized leaves: (chains, n_samples) + original trailing shape
    leaves, treedef = jax.tree.flatten(samples)
    restored = [
        jnp.zeros((l.shape[0], n_samples) + t, l.dtype) if t is not None else l
        for l, t in zip(leaves, trails)
    ]
    samples = jax.tree.unflatten(treedef, restored)
    samples = jax.tree.map(lambda t: jnp.swapaxes(t, 0, 1), samples)
    return samples, acc, rhat


# --------------------------------------------------------------------- slice
def slice_sample(
    logp: Callable,
    init_params,
    key: jax.Array,
    *,
    n_samples: int = 10,
    n_burnin: int = 20,
    thinning: int = 2,
    width: float = 1.0,
    max_stepout: int = 8,
):
    """Univariate slice sampling with stepping-out, cycling coordinates.

    Parity: the COMBO GP hyperparameter sampler (MCBO
    mcbo/utils/sampling.py:33-99, used by combo_gp.py:211-247 with burn-in
    and thinning).  Gradient-free — the companion to HMC for targets with
    cheap evaluations; coordinates are flattened from the pytree and
    updated one at a time inside a ``lax.scan`` (fixed step-out/shrink
    budgets keep shapes static).
    """
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(init_params)
    dim = flat.shape[0]

    def logp_flat(v):
        return logp(unravel(v))

    def sample_coord(carry, inp):
        v, k = carry
        (i,) = inp
        k, k1, k2, k3 = jax.random.split(k, 4)
        x0 = v[i]
        lp0 = logp_flat(v)
        log_u = lp0 + jnp.log(jax.random.uniform(k1, ()) + 1e-12)
        # stepping out
        r = jax.random.uniform(k2, ())
        lo = x0 - r * width
        hi = lo + width

        def out_body(state, _):
            lo, hi = state
            lo = jnp.where(logp_flat(v.at[i].set(lo)) > log_u, lo - width, lo)
            hi = jnp.where(logp_flat(v.at[i].set(hi)) > log_u, hi + width, hi)
            return (lo, hi), None

        (lo, hi), _ = lax.scan(out_body, (lo, hi), None, length=max_stepout)

        # shrinkage: fixed budget of proposals
        def shrink_body(state, kk):
            lo, hi, x, accepted = state
            prop = lo + jax.random.uniform(kk, ()) * (hi - lo)
            ok = logp_flat(v.at[i].set(prop)) > log_u
            x = jnp.where(ok & (~accepted), prop, x)
            accepted = accepted | ok
            lo = jnp.where(ok, lo, jnp.where(prop < x0, prop, lo))
            hi = jnp.where(ok, hi, jnp.where(prop >= x0, prop, hi))
            return (lo, hi, x, accepted), None

        ks = jax.random.split(k3, 16)
        (lo, hi, x_new, acc), _ = lax.scan(
            shrink_body, (lo, hi, x0, jnp.asarray(False)), ks
        )
        return (v.at[i].set(x_new), k), None

    total = n_burnin + n_samples * thinning

    def sweep(carry, t):
        v, k = carry
        idx = jnp.arange(dim)[:, None]
        (v, k), _ = lax.scan(sample_coord, (v, k), (idx,))
        return (v, k), v

    (_, _), trace = lax.scan(sweep, (flat, key), jnp.arange(total))
    keep = trace[n_burnin :: thinning][:n_samples]
    return jax.vmap(unravel)(keep)


# ----------------------------------------------------------------------- SVI
def svi_fit(
    logp: Callable,
    init_params,
    key: jax.Array,
    *,
    n_steps: int = 200,
    n_mc: int = 4,
    lr: float = 0.02,
    init_log_scale: float = -3.0,
    n_samples: int = 16,
):
    """Mean-field Gaussian VI on the unconstrained pytree.

    Returns (samples with leading axis n_samples, final ELBO estimate).
    """
    import optax

    loc0 = init_params
    scale0 = jax.tree.map(
        lambda t: jnp.full_like(t, init_log_scale), init_params
    )

    def elbo(dist, k):
        loc, log_scale = dist
        ks = jax.random.split(k, n_mc)

        def one(kk):
            eps = _tree_randn_like(kk, loc)
            q = jax.tree.map(
                lambda m, ls, e: m + jnp.exp(ls) * e, loc, log_scale, eps
            )
            return logp(q)

        e_logp = jnp.mean(jax.vmap(one)(ks))
        entropy = sum(jnp.sum(ls) for ls in jax.tree.leaves(log_scale))
        return e_logp + entropy

    opt = optax.adam(lr)
    dist0 = (loc0, scale0)

    def step(carry, i):
        dist, st, k = carry
        k, ke = jax.random.split(k)
        val, g = jax.value_and_grad(lambda d: -elbo(d, ke))(dist)
        up, st = opt.update(g, st, dist)
        dist = jax.tree.map(lambda a, b: a + b, dist, up)
        return (dist, st, k), val

    (dist, _, key), vals = lax.scan(
        step, (dist0, opt.init(dist0), key), jnp.arange(n_steps)
    )
    loc, log_scale = dist
    ks = jax.random.split(key, n_samples)

    def draw(kk):
        eps = _tree_randn_like(kk, loc)
        return jax.tree.map(lambda m, ls, e: m + jnp.exp(ls) * e, loc, log_scale, eps)

    samples = jax.vmap(draw)(ks)
    return samples, -vals[-1]


# ----------------------------------------------------------------------- SMC
def smc_sample(
    log_prior: Callable,
    log_lik: Callable,
    init_particles,
    key: jax.Array,
    *,
    n_stages: int = 16,
    n_mala: int = 2,
    mala_step: float = 0.01,
    ess_threshold: float = 0.5,
):
    """Likelihood-tempered SMC: β 0→1 over n_stages.

    ``init_particles``: pytree with leading particle axis (prior draws).
    Returns (particles, log_evidence_estimate).  Resampling is systematic
    and ESS-triggered; mutation is MALA at the current temperature.
    """
    n = jax.tree.leaves(init_particles)[0].shape[0]
    betas = jnp.linspace(0.0, 1.0, n_stages + 1)

    v_lik = jax.vmap(log_lik)
    v_tempered_grad = jax.vmap(
        lambda q, b: jax.grad(lambda p: log_prior(p) + b * log_lik(p))(q),
        in_axes=(0, None),
    )

    def systematic_resample(k, w):
        u = (jnp.arange(n) + jax.random.uniform(k, ())) / n
        cum = jnp.cumsum(w)
        return jnp.searchsorted(cum, u)

    def stage(carry, s):
        parts, logw, logZ, k = carry
        b_prev, b_next = betas[s], betas[s + 1]
        ll = v_lik(parts)
        ll = jnp.where(jnp.isfinite(ll), ll, -1e10)
        logw = logw + (b_next - b_prev) * ll
        # normalized weights + evidence increment
        m = jnp.max(logw)
        w = jnp.exp(logw - m)
        logZ = logZ + m + jnp.log(jnp.mean(w))
        w = w / jnp.sum(w)
        ess = 1.0 / jnp.sum(w**2)

        k, k_res, k_mala = jax.random.split(k, 3)
        do_resample = ess < ess_threshold * n
        idx = jnp.where(
            do_resample,
            systematic_resample(k_res, w),
            jnp.arange(n),
        )
        parts = jax.tree.map(lambda t: t[idx], parts)
        # carry weights in the "sums to n" convention (uniform weight = 1):
        # the evidence increment above uses mean(exp(logw')·exp Δll), which
        # equals Σ w̄·exp Δll only when logw sums to n, matching the
        # resampled (all-ones) branch
        logw = jnp.where(do_resample, jnp.zeros_like(logw), jnp.log(w * n))

        # MALA mutation at temperature b_next
        def mala_once(pp, kk):
            g = v_tempered_grad(pp, b_next)
            noise = _tree_randn_like(kk, pp)
            prop = jax.tree.map(
                lambda q, gi, e: q + 0.5 * mala_step * gi + jnp.sqrt(mala_step) * e,
                pp, g, noise,
            )

            def logt(q):
                return log_prior(q) + b_next * log_lik(q)

            lp_old = jax.vmap(logt)(pp)
            lp_new = jax.vmap(logt)(prop)
            # symmetric-proposal approximation of the MH correction
            log_alpha = jnp.where(
                jnp.isfinite(lp_new), lp_new - lp_old, -jnp.inf
            )
            ku = jax.random.split(kk, 1)[0]
            acc = jnp.log(jax.random.uniform(ku, (n,))) < log_alpha
            return jax.tree.map(
                lambda a, b2: jnp.where(
                    acc.reshape((n,) + (1,) * (a.ndim - 1)), a, b2
                ),
                prop, pp,
            )

        for j in range(n_mala):
            k, kj = jax.random.split(k)
            parts = mala_once(parts, kj)
        return (parts, logw, logZ, k), ess

    logw0 = jnp.zeros(n)
    (parts, logw, logZ, _), ess_hist = lax.scan(
        stage, (init_particles, logw0, jnp.asarray(0.0), key), jnp.arange(n_stages)
    )
    return parts, logZ


def smc_sample_sharded(
    log_prior: Callable,
    log_lik: Callable,
    init_particles,
    key: jax.Array,
    mesh,
    *,
    axis: Optional[str] = None,
    n_stages: int = 16,
    n_mala: int = 2,
    mala_step: float = 0.01,
    ess_threshold: float = 0.5,
):
    """Particle-parallel likelihood-tempered SMC across a device mesh.

    The north-star distributed-inference axis (BASELINE.json; SURVEY.md
    §2.9 P2): particles are sharded with ``shard_map``; per stage the
    importance-weight normalization and evidence increment are *global*
    ``pmax``/``psum`` reductions, the ESS is a global ``psum``, and — when
    the ESS collapses — **systematic resampling runs over the full
    cross-device population**: weights and particle pytrees are
    ``all_gather``-ed (hyperparameter pytrees are tiny — O(D) floats per
    particle), each device computes its own slice of the global stratified
    grid positions, and selects its new local block from the gathered
    pool.  MALA mutation stays local.  The same stratified-uniform draw is
    used on every device (the PRNG key is replicated), so the result is
    identical to a single-device systematic resampling of the full
    population.

    ``init_particles``: pytree with leading particle axis (a multiple of
    the mesh size).  Returns (particles, log_evidence) exactly like
    ``smc_sample``.
    """
    from jax.sharding import PartitionSpec as P

    axis = axis or mesh.axis_names[0]
    n_total = jax.tree.leaves(init_particles)[0].shape[0]
    n_dev = mesh.devices.size
    assert n_total % n_dev == 0, (n_total, n_dev)
    n_loc = n_total // n_dev
    betas = jnp.linspace(0.0, 1.0, n_stages + 1)

    v_lik = jax.vmap(log_lik)
    v_tempered_grad = jax.vmap(
        lambda q, b: jax.grad(lambda p: log_prior(p) + b * log_lik(p))(q),
        in_axes=(0, None),
    )

    trails = _zero_leaf_trails(init_particles)

    def per_device(parts_local, key):
        parts_local = _unpack_zero_leaves(parts_local, trails)
        i_dev = lax.axis_index(axis)
        # device-local PRNG stream for mutation noise; the resampling
        # stratified draw below uses the *replicated* key stream so all
        # devices agree on the global resampling permutation.
        k_rep = key
        k_loc = jax.random.fold_in(key, i_dev + 1)

        def stage(carry, s):
            parts, logw, logZ, k_rep, k_loc = carry
            b_prev, b_next = betas[s], betas[s + 1]
            ll = v_lik(parts)
            ll = jnp.where(jnp.isfinite(ll), ll, -1e10)
            logw = logw + (b_next - b_prev) * ll

            # ---- global normalization + evidence (psum/pmax) ----------
            m = lax.pmax(jnp.max(logw), axis)
            sw = lax.psum(jnp.sum(jnp.exp(logw - m)), axis)
            logZ = logZ + m + jnp.log(sw / n_total)
            w = jnp.exp(logw - m) / sw  # sums to 1 over ALL devices
            ess = 1.0 / lax.psum(jnp.sum(w**2), axis)

            k_rep, k_res = jax.random.split(k_rep)
            k_loc, k_mala = jax.random.split(k_loc)
            do_resample = ess < ess_threshold * n_total

            # ---- global systematic resampling via all_gather ----------
            w_all = lax.all_gather(w, axis).reshape(n_total)  # device-major
            cum = jnp.cumsum(w_all)
            u0 = jax.random.uniform(k_res, ())  # same on every device
            pos = (jnp.arange(n_loc) + i_dev * n_loc + u0) / n_total
            idx = jnp.searchsorted(cum, pos)  # this device's global picks
            parts_all = jax.tree.map(
                lambda t: lax.all_gather(t, axis).reshape((n_total,) + t.shape[1:]),
                parts,
            )
            parts_res = jax.tree.map(lambda t: t[idx], parts_all)
            parts = _tree_where(do_resample, parts_res, parts)
            logw = jnp.where(do_resample, jnp.zeros_like(logw), jnp.log(w * n_total))

            # ---- local MALA mutation at temperature b_next -------------
            def mala_once(pp, kk):
                g = v_tempered_grad(pp, b_next)
                noise = _tree_randn_like(kk, pp)
                prop = jax.tree.map(
                    lambda q, gi, e: q + 0.5 * mala_step * gi
                    + jnp.sqrt(mala_step) * e,
                    pp, g, noise,
                )

                def logt(q):
                    return log_prior(q) + b_next * log_lik(q)

                lp_old = jax.vmap(logt)(pp)
                lp_new = jax.vmap(logt)(prop)
                log_alpha = jnp.where(jnp.isfinite(lp_new), lp_new - lp_old, -jnp.inf)
                ku = jax.random.split(kk, 1)[0]
                acc = jnp.log(jax.random.uniform(ku, (n_loc,))) < log_alpha
                return jax.tree.map(
                    lambda a, b2: jnp.where(
                        acc.reshape((n_loc,) + (1,) * (a.ndim - 1)), a, b2
                    ),
                    prop, pp,
                )

            for j in range(n_mala):
                k_mala, kj = jax.random.split(k_mala)
                pp_new = mala_once(parts, kj)
                parts = pp_new
            return (parts, logw, logZ, k_rep, k_loc), ess

        # derive the zero log-weights from the (device-varying) particles so
        # the scan carry's varying-axis metadata is consistent under shard_map
        logw0 = 0.0 * jax.vmap(
            lambda p: sum(jnp.sum(l) for l in jax.tree.leaves(p))
        )(parts_local)
        (parts, logw, logZ, _, _), _ = lax.scan(
            stage, (parts_local, logw0, jnp.asarray(0.0), k_rep, k_loc),
            jnp.arange(n_stages),
        )
        return _pack_zero_leaves(parts, trails), logZ

    smapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P()),
    )
    from jax.sharding import NamedSharding

    init_packed = jax.device_put(
        _pack_zero_leaves(init_particles, trails), NamedSharding(mesh, P(axis))
    )
    key = jax.device_put(key, NamedSharding(mesh, P()))
    parts, logZ = smapped(init_packed, key)
    return _unpack_zero_leaves(parts, trails), logZ
