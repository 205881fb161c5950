"""Chem decoder for latent-space molecule BO — SELFIES-style robustness.

Parity target: the T-LBO chem task (T-LBO weighted_retraining/
weighted_retraining/chem/jtnn/, ~2,000 LoC of junction-tree VAE).  The
jtnn needs rdkit (absent in this image); what it gives the BO loop is a
decoder for which EVERY latent point decodes to a VALID molecule.  The
same guarantee is what SELFIES (Krenn et al. 2020) provides for strings:
a derivation-rule alphabet where any token sequence decodes to a valid
molecular graph.  This module implements that idea self-contained:

  * a token alphabet of atoms (with bond-order prefixes), branches and
    rings ([C], [=C], [N], [O], [F], [S], [Branch], [Pop], [Ring1..3],
    [nop]),
  * a valence-constrained derivation decoder: bond orders are clipped to
    the remaining valence on both endpoints, branches push/pop a stack,
    ring tokens bond back to earlier atoms — so *every* sequence yields a
    chemically valid (valence-respecting) graph,
  * a canonical serialization for deduplication,
  * a deterministic ``penalized_logp_proxy`` objective: Crippen-style
    additive atom contributions (octanol-water logP parametrization per
    heavy-atom class) minus SA-like ring/branch penalties — the shape of
    the reference's penalized-logP target without the rdkit dependency.

``ChemLatentBO`` then runs T-LBO weighted retraining over a GRU sequence
VAE (latent/decoders.SeqVAE): rank-weighted ELBO retraining, GP + EI in
latent space, decode-and-score — the full reference loop
(robust_opt_scripts/robust_opt_chem.py) with the TPU-native VAE/GP.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "ALPHABET",
    "decode_tokens",
    "canonical_string",
    "penalized_logp_proxy",
    "random_molecules",
    "ChemLatentBO",
]

# token alphabet: (kind, element|arg, bond_order)
ALPHABET: List[Tuple[str, str, int]] = [
    ("nop", "", 0),
    ("atom", "C", 1), ("atom", "N", 1), ("atom", "O", 1),
    ("atom", "F", 1), ("atom", "S", 1),
    ("atom", "C", 2), ("atom", "N", 2), ("atom", "O", 2),
    ("atom", "C", 3), ("atom", "N", 3),
    ("branch", "", 0),
    ("pop", "", 0),
    ("ring", "1", 1), ("ring", "2", 1), ("ring", "3", 1),
]
N_TOKENS = len(ALPHABET)
VALENCE = {"C": 4, "N": 3, "O": 2, "F": 1, "S": 2}
# Crippen-inspired additive logP contributions per heavy atom (sign and
# ordering follow the Wildman-Crippen parametrization: carbon lipophilic,
# heteroatoms hydrophilic)
LOGP_CONTRIB = {"C": 0.36, "N": -0.60, "O": -0.64, "F": 0.22, "S": 0.41}


class MolGraph:
    """Atoms (element symbols) + bonds (i, j, order)."""

    def __init__(self):
        self.atoms: List[str] = []
        self.bonds: List[Tuple[int, int, int]] = []

    def free_valence(self, i: int) -> int:
        used = sum(o for a, b, o in self.bonds if a == i or b == i)
        return VALENCE[self.atoms[i]] - used

    def add_atom(self, el: str) -> int:
        self.atoms.append(el)
        return len(self.atoms) - 1

    def add_bond(self, i: int, j: int, order: int) -> bool:
        if i == j:
            return False
        if any((a, b) in ((i, j), (j, i)) for a, b, _ in self.bonds):
            return False
        o = min(order, self.free_valence(i), self.free_valence(j))
        if o <= 0:
            return False
        self.bonds.append((i, j, o))
        return True


def decode_tokens(tokens) -> MolGraph:
    """Derivation-rule decode: ANY token sequence yields a valid graph."""
    g = MolGraph()
    cur: Optional[int] = None
    stack: List[int] = []
    for t in np.asarray(tokens, int).ravel():
        kind, arg, order = ALPHABET[int(t) % N_TOKENS]
        if kind == "nop":
            continue
        if kind == "atom":
            j = g.add_atom(arg)
            if cur is not None:
                if not g.add_bond(cur, j, order):
                    # no capacity on cur: start a new fragment root
                    pass
            cur = j
        elif kind == "branch":
            if cur is not None:
                stack.append(cur)
        elif kind == "pop":
            if stack:
                cur = stack.pop()
        elif kind == "ring":
            if cur is not None:
                back = int(arg)
                j = cur - 1 - back
                if j >= 0:
                    g.add_bond(cur, j, order)
    if not g.atoms:
        g.add_atom("C")  # empty sequence decodes to methane
    return g


def canonical_string(g: MolGraph) -> str:
    """Deterministic serialization for dedupe (degree-sorted DFS)."""
    n = len(g.atoms)
    adj = {i: [] for i in range(n)}
    for a, b, o in g.bonds:
        adj[a].append((b, o))
        adj[b].append((a, o))
    seen = set()
    frags = []
    for root in sorted(range(n), key=lambda i: (g.atoms[i], -len(adj[i]))):
        if root in seen:
            continue
        out = []
        stack = [(root, 0)]
        while stack:
            i, o = stack.pop()
            if i in seen:
                out.append(f"r{o}")
                continue
            seen.add(i)
            out.append(("", "=", "#")[o - 1] + g.atoms[i] if o > 1 else g.atoms[i])
            for j, oj in sorted(adj[i], key=lambda t: (g.atoms[t[0]], t[1])):
                if j not in seen:
                    stack.append((j, oj))
        frags.append("".join(out))
    return ".".join(sorted(frags))


def penalized_logp_proxy(g: MolGraph) -> float:
    """Deterministic penalized-logP-shaped objective (maximize).

    logP term: Crippen-style additive contributions; penalties: cycle-rank
    (SA/ring-size analogue) and fragment count; small size regularizer so
    the optimum isn't a trivial max-length carbon chain."""
    logp = sum(LOGP_CONTRIB[a] for a in g.atoms)
    n = len(g.atoms)
    n_frag = _n_fragments(g)
    cycle_rank = len(g.bonds) - n + n_frag
    double_bonds = sum(1 for _, _, o in g.bonds if o >= 2)
    return (
        logp
        - 0.8 * max(cycle_rank - 1, 0)
        - 1.5 * (n_frag - 1)
        + 0.3 * double_bonds
        - 0.02 * (n - 20) ** 2 / 20.0
    )


def _n_fragments(g: MolGraph) -> int:
    n = len(g.atoms)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b, _ in g.bonds:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return len({find(i) for i in range(n)})


def random_molecules(n: int, length: int = 24, seed: int = 0) -> np.ndarray:
    """Random token sequences (all valid by construction) — the hermetic
    stand-in for the reference's ZINC-250k SMILES dataset."""
    rng = np.random.default_rng(seed)
    # bias towards atoms so molecules have a reasonable size
    probs = np.asarray(
        [0.08] + [0.12, 0.07, 0.07, 0.04, 0.04, 0.05, 0.03, 0.03, 0.02, 0.02]
        + [0.08, 0.08, 0.09, 0.09, 0.09]
    )
    probs = probs / probs.sum()
    return rng.choice(N_TOKENS, size=(n, length), p=probs).astype(np.int32)


class ChemLatentBO:
    """T-LBO weighted retraining on the SELFIES-style chem task.

    Mirrors robust_opt_chem.py: encode dataset → rank-weighted VAE
    retraining every ``retrain_every`` iterations → GP + EI in latent
    space → decode candidate → score; all molecules deduped on the
    canonical serialization."""

    def __init__(
        self,
        n_init: int = 128,
        seq_len: int = 24,
        latent_dim: int = 8,
        retrain_every: int = 8,
        rank_k: float = 1e-2,
        seed: int = 0,
        vae_steps: int = 300,
    ):
        import jax
        import jax.numpy as jnp

        from .decoders import SeqVAE

        self.seq_len = seq_len
        self.latent_dim = latent_dim
        self.retrain_every = retrain_every
        self.rank_k = rank_k
        self.seed = seed
        self.vae_steps = vae_steps
        self.tokens = random_molecules(n_init, seq_len, seed)
        self.y = np.asarray(
            [penalized_logp_proxy(decode_tokens(t)) for t in self.tokens]
        )
        self._seen = {canonical_string(decode_tokens(t)) for t in self.tokens}
        self.model = SeqVAE(
            vocab=N_TOKENS, length=seq_len, latent_dim=latent_dim
        )
        key = jax.random.PRNGKey(seed)
        self._params = self.model.init(
            {"params": key}, jnp.asarray(self.tokens[:1]), key
        )["params"]
        self._iter = 0
        self._retrain()

    # ---------------------------------------------------------------- VAE
    def _retrain(self):
        import jax
        import jax.numpy as jnp

        from .decoders import train_seq_vae
        from .vae import rank_weights

        w = rank_weights(-self.y, k=self.rank_k)  # maximize → rank by -y
        key = jax.random.PRNGKey(self.seed + self._iter)
        self._params, _losses = train_seq_vae(
            self.model, self._params, key,
            jnp.asarray(self.tokens, jnp.int32),
            jnp.asarray(-self.y.reshape(-1, 1), jnp.float32),
            jnp.asarray(w, jnp.float32),
            n_steps=self.vae_steps,
        )

    def _encode(self, tokens):
        from .decoders import seq_encode

        return seq_encode(self.model, self._params, tokens)

    def _decode(self, Z):
        from .decoders import seq_decode

        return seq_decode(self.model, self._params, Z)

    # ----------------------------------------------------------------- BO
    def step(self, batch: int = 4) -> float:
        """One weighted-retraining BO iteration; returns current best."""
        from ..acquisitions.acq import EI, AcqParams
        from ..acq_optimizers.evolution import EvolutionOpt
        from ..design_space import DesignSpace
        from ..models import get_model

        import jax
        import jax.numpy as jnp

        self._iter += 1
        if self._iter % self.retrain_every == 0:
            self._retrain()

        Z = self._encode(self.tokens)
        lo, hi = Z.min(0) - 0.5, Z.max(0) + 0.5
        space = DesignSpace().parse([
            {"name": f"z{i}", "type": "num", "lb": float(lo[i]), "ub": float(hi[i])}
            for i in range(self.latent_dim)
        ])
        gp = get_model("gp", space, num_out=1, num_epochs=30, n_restarts=1)
        yv = -self.y.reshape(-1, 1)  # minimize -objective
        gp.fit(Z.astype(np.float32), yv)
        tau = float(yv.min())
        params = AcqParams(
            tau=jnp.float32(tau), key=jax.random.PRNGKey(self._iter)
        )
        evo = EvolutionOpt(space, EI(), pop=64, iters=32)
        Zc, _ = evo.optimize(
            model=gp, acq_params=params, return_pop=True, seed=self._iter
        )
        # decode top candidates, dedupe, score
        new_tok, new_y = [], []
        for z in Zc:
            t = self._decode(z[None, :])[0]
            s = canonical_string(decode_tokens(t))
            if s in self._seen:
                continue
            self._seen.add(s)
            new_tok.append(t)
            new_y.append(penalized_logp_proxy(decode_tokens(t)))
            if len(new_tok) >= batch:
                break
        if new_tok:
            self.tokens = np.vstack([self.tokens, np.stack(new_tok)])
            self.y = np.concatenate([self.y, np.asarray(new_y)])
        return float(self.y.max())

    @property
    def best_y(self) -> float:
        return float(self.y.max())
