"""Fused limb-major EC group law for use INSIDE Pallas kernel bodies.

The XLA path (curve/weierstrass_lm.py) issues each complete-add as ~12
separate montmul dispatches whose ~30 intermediate (L, N) tensors round-
trip HBM.  Here the whole RCB15 formula runs on VMEM-resident values —
the promised `pallas/ec.py` (weierstrass_lm.py:10-13, SURVEY comp. 10).

All helpers are PURE functions over (L, N) u32 arrays: usable directly
inside any Pallas kernel body (pallas/bucket.py) and — identically — in
interpret mode for differential tests.  Field core shared with
pallas/montmul.py (same carry bounds, proven there).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpukzg.pallas.montmul import _montmul_lm_core, _carry_resolve, _sub_mod_lm
from tpukzg.field.mont import B, MASK


def _add_mod(a, b, pm):
    """(a + b) mod p, limb-major (L, N), canonical inputs."""
    s, carry = _carry_resolve(a + b)
    return _sub_mod_lm(s, carry, pm[:, 0])


def sub_mod(a, b, pm):
    """(a - b) mod p, limb-major canonical: single borrow-sweep then
    conditional +p.  Mirrors field/mont.py _sub with the Kogge-Stone
    resolve of pallas/montmul.py."""
    from tpukzg.pallas.montmul import _shift_down
    L = a.shape[0]
    d = a + (MASK + 1) - b                   # per-limb, no underflow
    s = d & MASK
    g = 1 - (d >> B)                         # borrow generated at i
    p = (s == 0).astype(jnp.uint32)          # borrow propagates
    G, P = g, p
    dd = 1
    while dd < L:
        G = G | (P * _shift_down(G, dd))
        P = P * _shift_down(P, dd)
        dd <<= 1
    bin_ = _shift_down(G, 1)
    diff = (s + (MASK + 1) - bin_) & MASK
    borrow = G[L - 1]                        # 1 iff a < b
    pmb = jnp.broadcast_to(pm, a.shape)
    fixed, _ = _carry_resolve(diff + pmb)
    return jnp.where((borrow > 0)[None], fixed, diff)


def add_mod(a, b, pm):
    return _add_mod(a, b, pm)


def mul_small_mod(a, k: int, pm):
    """a * k mod p for tiny static k via doubling chain."""
    assert k > 0
    result = None
    doubled = a
    kk = k
    while kk:
        if kk & 1:
            result = doubled if result is None else _add_mod(result, doubled, pm)
        kk >>= 1
        if kk:
            doubled = _add_mod(doubled, doubled, pm)
    return result


def ec_add(p, q, mu, pm, L, b3_small: int = 12):
    """Complete projective add (RCB15 Alg. 7, a=0) on limb-major coords.
    p, q: (X, Y, Z) tuples of (L, N) u32 (Montgomery); -> same."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q

    def mul(a, b):
        return _montmul_lm_core(a, b, mu, pm, L)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add_mod(X1, Y1, pm), add_mod(X2, Y2, pm))
    t4 = mul(add_mod(Y1, Z1, pm), add_mod(Y2, Z2, pm))
    t5 = mul(add_mod(X1, Z1, pm), add_mod(X2, Z2, pm))
    t3 = sub_mod(t3, add_mod(t0, t1, pm), pm)
    t4 = sub_mod(t4, add_mod(t1, t2, pm), pm)
    t5 = sub_mod(t5, add_mod(t0, t2, pm), pm)
    t0 = mul_small_mod(t0, 3, pm)
    t2 = mul_small_mod(t2, b3_small, pm)
    z3 = add_mod(t1, t2, pm)
    t1 = sub_mod(t1, t2, pm)
    y3 = mul_small_mod(t5, b3_small, pm)
    m0 = mul(t4, y3)
    m1 = mul(t3, t1)
    m2 = mul(y3, t0)
    m3 = mul(t1, z3)
    m4 = mul(t0, t3)
    m5 = mul(z3, t4)
    return (sub_mod(m1, m0, pm), add_mod(m3, m2, pm), add_mod(m5, m4, pm))


def ec_double(p, mu, pm, L, b3_small: int = 12):
    """Complete projective double (RCB15 Alg. 9, a=0), limb-major."""
    X, Y, Z = p

    def mul(a, b):
        return _montmul_lm_core(a, b, mu, pm, L)

    t0 = mul(Y, Y)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t3 = mul(X, Y)
    z8 = mul_small_mod(t0, 8, pm)
    t2 = mul_small_mod(t2, b3_small, pm)
    t6 = sub_mod(t0, mul_small_mod(t2, 3, pm), pm)
    y3t = add_mod(t0, t2, pm)
    m0 = mul(t2, z8)
    m1 = mul(t1, z8)
    m2 = mul(t6, y3t)
    m3 = mul(t6, t3)
    return (add_mod(m3, m3, pm), add_mod(m2, m0, pm), m1)
