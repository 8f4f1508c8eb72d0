"""TPUKZG_CHECKED mode — limb-overflow shadow checking (SURVEY.md 5.2).

JAX's pure-functional model rules out data races; the analogous hazard
in this library is *limb overflow under lazy carrying* inside the
Montgomery kernels.  This module provides:

* ``enabled()`` — gate, from env ``TPUKZG_CHECKED=1``.
* ``check_limbs(name, arr, bits)`` — host-side boundary assert that every
  u32 lane is a valid ``bits``-bit limb.  Called at Python API edges when
  the mode is on; costs a device sync, so it is strictly a debug mode.
* ``montmul_golden(a, b, params)`` — exact bignum Montgomery product, the
  oracle the device kernels are differential-tested against (including
  the all-limbs-0xFFFF stress operands of SURVEY.md 4.6).
* ``cios_bound_certificate(limb_bits)`` — executable static proof that
  every CIOS intermediate fits the accumulator width for the chosen limb
  size; fails loudly if a future limb-width change breaks the invariant.
"""

from __future__ import annotations

import os

import numpy as np


def enabled() -> bool:
    return os.environ.get("TPUKZG_CHECKED", "0") == "1"


def check_limbs(name: str, arr, bits: int = 16) -> None:
    """Boundary assert: every lane of `arr` is a canonical `bits`-bit
    limb.  No-op unless TPUKZG_CHECKED=1."""
    if not enabled():
        return
    a = np.asarray(arr)
    hi = int(a.max()) if a.size else 0
    if hi >> bits:
        raise AssertionError(
            f"TPUKZG_CHECKED: {name}: limb value {hi:#x} exceeds "
            f"{bits}-bit bound")


def montmul_golden(a, b, params):
    """Exact Montgomery product a*b*R^-1 mod p via host bignums.
    a, b: (L,) u32 limb arrays (16-bit limbs, little-endian).
    The differential oracle for the device kernels."""
    L = params.L
    ai = sum(int(x) << (16 * i) for i, x in enumerate(np.asarray(a)))
    bi = sum(int(x) << (16 * i) for i, x in enumerate(np.asarray(b)))
    r_inv = pow(1 << (16 * L), params.modulus - 2, params.modulus)
    v = (ai * bi * r_inv) % params.modulus
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(L)],
                    dtype=np.uint32)


def shadow_montmul_lm(a_lm, b_lm, params):
    """int64 SHADOW of the limb-major Montgomery core (pallas/montmul.py
    `_montmul_lm_core`): replays the exact same column-sum / carry /
    reduction structure in numpy int64 and ASSERTS every intermediate
    stays below 2^32 (the u32 lane width) — the interpret-mode overflow
    audit SURVEY.md section 5.2 calls for.  Returns (result, bounds).

    a_lm, b_lm: (L, N) u32 16-bit limbs.  Differential equality with the
    device kernel is asserted by the caller (tests/test_pallas.py)."""
    a = np.asarray(a_lm, np.int64)
    b = np.asarray(b_lm, np.int64)
    L = params.L
    bounds: dict[str, int] = {}

    def track(name, arr):
        m = int(arr.max()) if arr.size else 0
        bounds[name] = max(bounds.get(name, 0), m)
        assert m < (1 << 32), (
            f"TPUKZG_CHECKED shadow: {name} intermediate {m:#x} overflows "
            f"u32 (limb layout L={L})")
        return arr

    def prod_cols(x, y, n_cols):
        cols = np.zeros((n_cols,) + x.shape[1:], np.int64)
        for i in range(L):
            o = track("product", x[i][None] * y)
            lo, hi = o & 0xFFFF, o >> 16
            w = min(L, n_cols - i)
            if w > 0:
                cols[i:i + w] += lo[:w]
            w = min(L, n_cols - i - 1)
            if w > 0:
                cols[i + 1:i + 1 + w] += hi[:w]
            track("column_sum", cols)
        return cols

    def carry(x):
        out = np.zeros_like(x)
        c = np.zeros(x.shape[1:], np.int64)
        for i in range(x.shape[0]):
            t = track("carry_add", x[i] + c)
            out[i] = t & 0xFFFF
            c = t >> 16
        return out, c

    mu = np.asarray(params.mu_limbs, np.int64)[:, None]
    pm = np.asarray(params.mod_limbs, np.int64)[:, None]
    t, _ = carry(prod_cols(a, b, 2 * L))
    m, _ = carry(prod_cols(t[:L], np.broadcast_to(mu, (L,) + a.shape[1:]), L))
    mp = prod_cols(m, np.broadcast_to(pm, (L,) + a.shape[1:]), 2 * L)
    s, cout = carry(track("t_plus_mp", t + mp))
    res = s[L:]
    # conditional subtract
    val = np.zeros(a.shape[1:], dtype=object)
    for i in reversed(range(L)):
        val = val * 65536 + res[i]
    ge = (cout > 0) | (val >= params.modulus)
    val2 = np.where(ge, val - params.modulus, val)
    out = np.zeros((L,) + a.shape[1:], np.uint32)
    for i in range(L):
        out[i] = (val2 % 65536).astype(np.uint32)
        val2 = val2 // 65536
    return out, bounds


def cios_bound_certificate(limb_bits: int = 16,
                           acc_bits: int = 32) -> dict:
    """Executable static proof of the CIOS accumulator bound: with
    b-bit limbs, every inner-loop intermediate is
        a_j * b_i + t_j + c  <=  (2^b-1)^2 + (2^b-1) + (2^b-1)
                              =  2^(2b) - 1  <  2^acc_bits,
    so the product scan never overflows a 2^acc_bits accumulator
    (here: int32 lanes holding u32 values).  Returns the bound facts;
    raises AssertionError if the invariant fails for the given widths."""
    m = (1 << limb_bits) - 1
    worst = m * m + m + m
    assert worst < (1 << acc_bits), (
        f"CIOS bound violated: {worst:#x} >= 2^{acc_bits} "
        f"for {limb_bits}-bit limbs")
    carry_max = worst >> limb_bits
    assert carry_max <= m + 1, "carry bound exceeds one limb + 1"
    return {"limb_bits": limb_bits, "acc_bits": acc_bits,
            "worst_intermediate": worst, "carry_max": carry_max}
