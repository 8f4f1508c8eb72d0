"""Radix-2 NTT / iNTT over Fr (SURVEY.md component 11).

TPU-shaped design: bit-reversal as one static gather, then log2(n) fully
vectorized butterfly stages.  Each stage is a reshape to (n/len, len), one
batched Montgomery mul by a precomputed per-stage twiddle table, and an
add/sub — no data-dependent control flow, static shapes throughout, so XLA
fuses each stage into a couple of VPU loops.

Twiddle tables are host-precomputed in Montgomery form from
omega_n = omega_{2^32}^(2^32/n)  (SURVEY.md section 2.1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpukzg.field.mont import FR, R_MOD

TWO_ADICITY = 32
OMEGA_2_32 = 0x16A2A19EDFE81F20D09B681922C813B4B63683508C2280B93829971F439F0D2B
COSET_GEN = 7  # multiplicative generator of Fr* (SURVEY.md 2.1)


def omega_for(n: int) -> int:
    assert n & (n - 1) == 0 and 0 < n <= (1 << TWO_ADICITY)
    w = OMEGA_2_32
    m = 1 << TWO_ADICITY
    while m > n:
        w = (w * w) % R_MOD
        m >>= 1
    return w


def bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    out = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


class NttPlan:
    """Precomputed NTT over the size-n subgroup of Fr (n a power of two).

    Inputs/outputs are (..., n, L) Montgomery-form Fr limb arrays with the
    polynomial axis second-to-last.  `ntt` maps coefficients -> evaluations
    at [w^0..w^(n-1)] (natural order); `intt` inverts.
    """

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n >= 2
        self.n = n
        self.omega = omega_for(n)
        self.log_n = n.bit_length() - 1
        # roots (natural order), Montgomery form: (n, L)
        r = []
        w = 1
        for _ in range(n):
            r.append(w)
            w = (w * self.omega) % R_MOD
        self.roots_int = r
        # Host-side Montgomery conversion throughout plan construction:
        # jitted to_mont calls here were ~30 device dispatches costing
        # ~4 min over the tunneled TPU (VERDICT r4 weak #7).
        self.roots = FR.to_mont_host(r)
        self.brp = bit_reverse_indices(n)
        # per-stage twiddles (Montgomery): stage s has block length 2^(s+1)
        # and uses w_n^(j * n / 2^(s+1)) for j < 2^s
        self._tw_fwd = []
        self._tw_inv = []
        w_inv = pow(self.omega, R_MOD - 2, R_MOD)
        for s in range(self.log_n):
            half = 1 << s
            step = n // (half * 2)
            tf = [pow(self.omega, j * step, R_MOD) for j in range(half)]
            ti = [pow(w_inv, j * step, R_MOD) for j in range(half)]
            self._tw_fwd.append(FR.to_mont_host(tf) if half > 1
                                else FR.to_mont_host(tf[0])[None])
            self._tw_inv.append(FR.to_mont_host(ti) if half > 1
                                else FR.to_mont_host(ti[0])[None])
        self.n_inv = FR.to_mont_host(pow(n, R_MOD - 2, R_MOD))
        # Coset shift g^i / g^-i tables (g = 7, the Fr* generator behind
        # omega_{2^32} — SURVEY.md 2.1).  Evaluating on the coset g<w>
        # keeps the vanishing polynomial Z_H(g w^i) = g^n - 1 nonzero,
        # which is what quotient-by-vanishing division needs (comp. 11).
        g = COSET_GEN
        g_inv = pow(g, R_MOD - 2, R_MOD)
        self.coset_pow = FR.to_mont_host([pow(g, i, R_MOD) for i in range(n)])
        self.coset_pow_inv = FR.to_mont_host(
            [pow(g_inv, i, R_MOD) for i in range(n)])
        self._pallas = None  # lazy NttPallas (TPU dispatch, comp. 12)
        self.ntt = jax.jit(self._ntt)
        self.intt = jax.jit(self._intt)
        self.coset_ntt = jax.jit(self._coset_ntt)
        self.coset_intt = jax.jit(self._coset_intt)

    def _maybe_pallas(self):
        """Fused-stage Pallas butterfly (pallas/ntt.py) when configured
        (default on TPU) and the size fits VMEM; None -> XLA stages."""
        from tpukzg.utils.config import NttConfig
        if NttConfig.from_env().impl != "pallas" or not (128 <= self.n <= 8192):
            return None
        if self._pallas is None:
            from tpukzg.pallas.ntt import NttPallas
            interpret = jax.default_backend() == "cpu"
            self._pallas = NttPallas(self, interpret=interpret)
        return self._pallas

    def _butterflies(self, a, twiddles):
        """a: (..., n, L) bit-reversed input -> natural-order output."""
        n, L = self.n, a.shape[-1]
        batch = a.shape[:-2]
        for s in range(self.log_n):
            half = 1 << s
            blocks = n // (2 * half)
            x = a.reshape(batch + (blocks, 2, half, L))
            u = x[..., 0, :, :]
            v = FR.mul(x[..., 1, :, :], jnp.asarray(twiddles[s]))
            out = jnp.stack([FR.add(u, v), FR.sub(u, v)], axis=-3)
            a = out.reshape(batch + (n, L))
        return a

    def _ntt(self, coeffs):
        p = self._maybe_pallas()
        if p is not None:
            return p.ntt(coeffs)
        a = jnp.take(coeffs, jnp.asarray(self.brp), axis=-2)
        return self._butterflies(a, self._tw_fwd)

    def _intt(self, evals):
        p = self._maybe_pallas()
        if p is not None:
            return p.intt(evals)
        a = jnp.take(evals, jnp.asarray(self.brp), axis=-2)
        a = self._butterflies(a, self._tw_inv)
        return FR.mul(a, jnp.asarray(self.n_inv))

    def _coset_ntt(self, coeffs):
        """Evaluations of the polynomial on the coset {g w^i}: scale
        coefficient i by g^i, then a plain NTT."""
        return self._ntt(FR.mul(coeffs, jnp.asarray(self.coset_pow)))

    def _coset_intt(self, evals):
        """Inverse of _coset_ntt: plain iNTT, then un-scale by g^-i."""
        return FR.mul(self._intt(evals), jnp.asarray(self.coset_pow_inv))


_plan_cache: dict[int, NttPlan] = {}


def get_plan(n: int) -> NttPlan:
    if n not in _plan_cache:
        _plan_cache[n] = NttPlan(n)
    return _plan_cache[n]
