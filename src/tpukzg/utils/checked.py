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
