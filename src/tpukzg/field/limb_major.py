"""Limb-major field ops: arrays are (L, *batch) — limbs on sublanes,
batch on the 128-wide lane axis (SURVEY.md hard part 1; layout decision
from the 2026-08-16 TPU microbench: limb-major montmul is ~2x the public
trailing layout, because (N, 24) arrays waste ~80% of every vector
register's lanes).

Carry/borrow chains here use compact `lax.scan`s over the leading limb
axis — ONE HLO op per chain, which keeps XLA graphs small (the
Kogge-Stone expansion used inside the Pallas kernel bodies is faster on
device but multiplies CPU-backend compile times by ~5x; scans and KS are
bit-identical, so the differential tests pin both).

Interface mirrors FieldParams where it matters (add/sub/mul/neg/double/
mul_small/select/eq/is_zero) so the limb-major curve layer reads the same
as curve/weierstrass.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from tpukzg.field.mont import B, MASK, FieldParams


def _prod_cols_lead(a, b, L: int, n_cols: int):
    """Column sums of a*b, limb-major: a, b (L, *batch) -> (n_cols, *batch).
    Products split lo/hi before accumulation (sums < 2^22 — see
    field/mont.py bounds)."""
    cols = jnp.zeros((n_cols,) + a.shape[1:], jnp.uint32)
    pad0 = [(0, 0)] * (a.ndim - 1)
    for i in range(L):
        o = a[i][None] * b
        lo = o & MASK
        hi = o >> B
        if i < n_cols:
            w = min(L, n_cols - i)
            cols = cols + jnp.pad(lo[:w], [(i, n_cols - i - w)] + pad0)
        if i + 1 < n_cols:
            w = min(L, n_cols - i - 1)
            cols = cols + jnp.pad(hi[:w], [(i + 1, n_cols - i - 1 - w)] + pad0)
    return cols


def _carry_scan(x):
    """Canonicalize (K, *batch) u32 limbs (< 2^23) to base 2^16 via one
    lax.scan over the leading limb axis.  -> (canonical, carry_out)."""
    def step(c, xi):
        t = xi + c
        return t >> B, t & MASK

    cout, y = lax.scan(step, jnp.zeros(x.shape[1:], jnp.uint32), x)
    return y, cout


def _shift_down_lead(x, d):
    """out[i] = x[i-d] along the LEADING axis (zero-fill at the bottom)."""
    pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[: x.shape[0]]


def _carry_ks(x):
    """Kogge-Stone twin of _carry_scan (leading-axis port of the proven
    pallas/montmul._carry_resolve): ~log2(K) wide rounds instead of K
    sequential scan steps.  Bit-exact for limb values < 2^23; carry_out
    includes the top limb's shifted-out high part so it matches
    _carry_scan at every call site."""
    k = x.shape[0]
    s = (x & MASK) + _shift_down_lead(x >> B, 1)
    g = s >> B
    s = s & MASK
    p = (s == MASK).astype(jnp.uint32)
    G, P = g, p
    d = 1
    while d < k:
        G = G | (P * _shift_down_lead(G, d))
        P = P * _shift_down_lead(P, d)
        d <<= 1
    out = (s + _shift_down_lead(G, 1)) & MASK
    return out, (x[-1] >> B) + G[-1]


def _sub_scan(a, b):
    """a - b over leading-axis limbs -> (diff mod 2^(16K), borrow)."""
    def step(borrow, ab):
        ai, bi = ab
        t = ai + (MASK + 1) - bi - borrow
        return 1 - (t >> B), t & MASK

    bout, y = lax.scan(step, jnp.zeros(a.shape[1:], jnp.uint32), (a, b))
    return y, bout


def _sub_ks(a, b):
    """Kogge-Stone twin of _sub_scan (pallas/montmul._sub_mod_lm port)."""
    k = a.shape[0]
    d0 = a + (MASK + 1) - b
    s = d0 & MASK
    g = 1 - (d0 >> B)
    p = (s == 0).astype(jnp.uint32)
    G, P = g, p
    d = 1
    while d < k:
        G = G | (P * _shift_down_lead(G, d))
        P = P * _shift_down_lead(P, d)
        d <<= 1
    diff = (s + (MASK + 1) - _shift_down_lead(G, 1)) & MASK
    return diff, G[-1]


class FieldLM:
    def __init__(self, params: FieldParams, carry_impl: str | None = None):
        if carry_impl is None:
            from tpukzg.utils.config import FieldConfig
            carry_impl = FieldConfig.from_env().carry_lm
        assert carry_impl in ("scan", "ks"), carry_impl
        # scan: compile-lean 1-HLO sweeps (2L sequential steps) — right
        # for the wide bucket-scan tensors.  ks: log-depth Kogge-Stone —
        # candidate for latency-bound narrow shapes (the window fold);
        # measured before any default flip (VERDICT r3 lesson).
        self._carry = _carry_ks if carry_impl == "ks" else _carry_scan
        self._subc = _sub_ks if carry_impl == "ks" else _sub_scan
        self.params = params
        self.L = params.L
        self.modulus = params.modulus
        self.mod_col = np.asarray(params.mod_limbs, np.uint32)[:, None]
        self.mu_col = np.asarray(params.mu_limbs, np.uint32)[:, None]
        self.one_np = np.asarray(params.one_mont, np.uint32)[:, None]
        self.zero_np = np.zeros((params.L, 1), np.uint32)

    # -- layout converters --

    @staticmethod
    def to_lm(a):
        return jnp.moveaxis(a, -1, 0)

    @staticmethod
    def from_lm(a):
        return jnp.moveaxis(a, 0, -1)

    def _const(self, col, like):
        return jnp.broadcast_to(
            jnp.asarray(col).reshape((self.L,) + (1,) * (like.ndim - 1)),
            like.shape)

    def _cond_sub_mod(self, s, carry):
        diff, borrow = self._subc(s, self._const(self.mod_col, s))
        ge = (carry > 0) | (borrow == 0)
        return jnp.where(ge[None], diff, s)

    # -- field ops --

    def add(self, a, b):
        s, carry = self._carry(a + b)
        return self._cond_sub_mod(s, carry)

    def sub(self, a, b):
        d, borrow = self._subc(a, b)
        dp, _ = self._carry(d + self._const(self.mod_col, d))
        return jnp.where((borrow > 0)[None], dp, d)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Separated Montgomery product, limb-major (see field/mont.py).
        TPUKZG_MONTMUL=pallas routes through the VMEM kernel
        (pallas/montmul.py montmul_lm_pallas) — the per-op dispatch for
        XLA-level callers; the fused Pallas kernels (bucket/ntt/ec)
        embed the same core directly."""
        from tpukzg.utils.config import FieldImplConfig
        if FieldImplConfig.from_env().montmul == "pallas":
            import jax
            if jax.default_backend() != "cpu":  # TPU-only dispatch: the
                # interpret path traced into callers' jits explodes
                # XLA:CPU compiles (see pallas/bucket.py)
                from tpukzg.pallas.montmul import montmul_lm_pallas
                return montmul_lm_pallas(a, b, self.params)
        L = self.L
        t_cols = _prod_cols_lead(a, b, L, 2 * L)
        t, _ = self._carry(t_cols)
        m_cols = _prod_cols_lead(t[:L], self._const(self.mu_col, a), L, L)
        m, _ = self._carry(m_cols)
        mp = _prod_cols_lead(m, self._const(self.mod_col, a), L, 2 * L)
        s, carry = self._carry(t + mp)
        return self._cond_sub_mod(s[L:], carry)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        assert k > 0
        result = None
        doubled = a
        while k:
            if k & 1:
                result = doubled if result is None else self.add(result, doubled)
            k >>= 1
            if k:
                doubled = self.add(doubled, doubled)
        return result

    # -- predicates / select (mask has the batch shape a.shape[1:]) --

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)


from tpukzg.field.mont import FP, FR

FP_LM = FieldLM(FP)
FR_LM = FieldLM(FR)
