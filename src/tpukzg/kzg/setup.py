"""SRS / trusted setup (SURVEY.md component 17).

A `Setup` owns everything the protocol layer needs on-device:

* ``lagrange_g1`` / ``monomial_g1`` — batched G1 point tuples, leading axis
  of length n (SoA limbs, Montgomery form),
* the two fixed G2 points ``[1]_2`` and ``[tau]_2`` — stored as their
  **precomputed Miller-loop line coefficients**, so the fixed-argument
  pairings of every verify reuse one setup-time G2 precomputation
  (pairing/lines.py); verification then never touches G2 arithmetic,
* the `NttPlan` for the evaluation domain.

Generation of the insecure dev SRS (explicit tau) runs the batched
branch-free scalar ladder on device — n scalar muls execute as ONE
256-iteration fori_loop over an n-wide batch, the TPU-native shape for
this job.  Results are cached as .npz keyed by (tau, n, layout version)
(SURVEY.md section 5.4 checkpoint/resume).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from tpukzg.field.mont import FP, FR, R_MOD
from tpukzg.curve.g1 import G1, points_from_ints as g1_points_from_ints
from tpukzg.curve import g2 as g2m
from tpukzg.curve.g2 import G2
from tpukzg.ntt.ntt import NttPlan, get_plan
from tpukzg.pairing.lines import precompute_lines

_LAYOUT_VERSION = 2  # v2: Miller-loop line precompute persisted in the npz


def _lagrange_scalars(tau: int, n: int, roots) -> list[int]:
    """[L_i(tau)]_{i<n} over Fr with known tau (golden/model.py:853)."""
    if tau % R_MOD in roots:
        return [1 if r == tau % R_MOD else 0 for r in roots]
    zn = (pow(tau, n, R_MOD) - 1) % R_MOD
    ninv = pow(n, -1, R_MOD)
    return [zn * ninv % R_MOD * roots[i] % R_MOD
            * pow((tau - roots[i]) % R_MOD, -1, R_MOD) % R_MOD
            for i in range(n)]


def _gen_multiples(scalars: list[int]):
    """[k_i] G1 for a list of scalars — one batched device ladder."""
    ks = FR.from_int(list(scalars))  # (n, 16) canonical
    pts = G1.scalar_mul(G1.gen((len(scalars),)), ks)
    return tuple(np.asarray(c) for c in pts)


class Setup:
    """Loaded SRS + derived device-side precomputation."""

    def __init__(self, n: int, lagrange_g1, monomial_g1, g2_gen, g2_tau,
                 lines_gen=None, lines_tau=None):
        assert n & (n - 1) == 0
        self.n = n
        self.plan: NttPlan = get_plan(n)
        self.lagrange_g1 = lagrange_g1      # G1 point tuple, (n, ...) axes
        self.monomial_g1 = monomial_g1      # G1 point tuple, (n, ...) axes
        self.g2_gen = g2_gen                # projective G2 point tuple
        self.g2_tau = g2_tau
        # Fixed-argument pairing precomputation: line coefficients for the
        # Miller loops of e(. , [1]_2) and e(. , [tau]_2).  Persisted in
        # the npz cache (layout v2) so `load` costs no device compile —
        # round 1's driver bench spent most of its 487 s cold-compiling
        # exactly this path.
        if lines_gen is None:
            lines_gen = precompute_lines(g2_gen)
        if lines_tau is None:
            lines_tau = precompute_lines(g2_tau)
        self.lines_gen = tuple(np.asarray(c) for c in lines_gen)
        self.lines_tau = tuple(np.asarray(c) for c in lines_tau)

    # ------------------------------------------------------------------
    # dev-setup generation + npz cache
    # ------------------------------------------------------------------

    @staticmethod
    def _cache_path(cache_dir: str, tau: int, n: int) -> str:
        key = hashlib.sha256(
            f"v{_LAYOUT_VERSION}:{tau % R_MOD}:{n}".encode()).hexdigest()[:16]
        return os.path.join(cache_dir, f"srs_{n}_{key}.npz")

    @classmethod
    def generate_insecure(cls, tau: int, n: int, cache_dir: str | None = None):
        """Dev SRS from explicit tau.  INSECURE — testing/benching only."""
        if cache_dir is None:
            cache_dir = os.environ.get(
                "TPUKZG_CACHE_DIR",
                os.path.join(os.path.expanduser("~"), ".cache", "tpukzg"))
        path = cls._cache_path(cache_dir, tau, n)
        if os.path.exists(path):
            return cls.load(path)

        plan = get_plan(n)
        tau = tau % R_MOD
        mono = _gen_multiples([pow(tau, i, R_MOD) for i in range(n)])
        lag = _gen_multiples(_lagrange_scalars(tau, n, plan.roots_int))
        g2_gen = G2.gen()
        g2_tau = G2.scalar_mul(g2_gen, FR.from_int(tau))
        setup = cls(n, lag, mono,
                    tuple(np.asarray(c) for c in g2_gen),
                    tuple(np.asarray(c) for c in g2_tau))
        try:
            setup.save(path)
        except OSError:
            pass  # cache is best-effort
        return setup

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        arrs = {"n": np.asarray(self.n)}
        for name, pt in (("lag", self.lagrange_g1), ("mono", self.monomial_g1),
                         ("g2g", self.g2_gen), ("g2t", self.g2_tau),
                         ("lng", self.lines_gen), ("lnt", self.lines_tau)):
            for i, c in enumerate(pt):
                arrs[f"{name}_{i}"] = np.asarray(c)
        tmp = path + ".tmp"
        np.savez_compressed(tmp, **arrs)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)

    @classmethod
    def load(cls, path: str):
        z = np.load(path)
        n = int(z["n"])
        pts = {name: tuple(z[f"{name}_{i}"] for i in range(3))
               for name in ("lag", "mono", "g2g", "g2t")}
        lines = {}
        for name in ("lng", "lnt"):  # (dbl_lines, add_lines) pairs, v2+
            if f"{name}_0" in z:
                lines[name] = tuple(z[f"{name}_{i}"] for i in range(2))
        return cls(n, pts["lag"], pts["mono"], pts["g2g"], pts["g2t"],
                   lines_gen=lines.get("lng"), lines_tau=lines.get("lnt"))

    # ------------------------------------------------------------------
    # production loader: c-kzg-style trusted-setup from compressed bytes
    # ------------------------------------------------------------------

    @classmethod
    def from_compressed(cls, g1_monomial_bytes: list[bytes],
                        g1_lagrange_bytes: list[bytes],
                        g2_tau_bytes: bytes, validate: bool = True):
        """Build a Setup from serialized SRS points (the shape of
        c-kzg-4844's ``load_trusted_setup``); validates encodings, and
        (by default) subgroup membership: [tau]_2 via the host psi-
        endomorphism check (curve/g2.py in_subgroup_host — SURVEY.md
        component 7), the G1 arrays via one batched device GLV check."""
        from tpukzg.curve import g1 as g1m
        n = len(g1_lagrange_bytes)
        mono_i = [g1m.decompress(b) for b in g1_monomial_bytes]
        lag_i = [g1m.decompress(b) for b in g1_lagrange_bytes]
        mono = g1_points_from_ints(*zip(*mono_i))
        lag = g1_points_from_ints(*zip(*lag_i))
        x0, x1, y0, y1, inf = g2m.decompress(g2_tau_bytes)
        if validate:
            if inf or not g2m.in_subgroup_host(x0, x1, y0, y1, inf):
                raise ValueError("[tau]_2 not in the G2 subgroup")
            both = tuple(np.concatenate([np.asarray(a), np.asarray(b)], 0)
                         for a, b in zip(mono, lag))
            if not bool(np.all(np.asarray(g1m.in_subgroup_fast(both)))):
                raise ValueError("G1 SRS point not in subgroup")
        g2_tau = g2m.point_from_ints(x0, x1, y0, y1, inf)
        g2_gen = tuple(np.asarray(c) for c in G2.gen())
        return cls(n, lag, mono, g2_gen, tuple(np.asarray(c) for c in g2_tau))
