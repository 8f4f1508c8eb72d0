"""MXU-assisted Montgomery multiplication (SURVEY.md section 7 hard-part 1).

The separated-REDC montmul (field/mont.py `_mul`) runs three limb
convolutions on the VPU:

    T  = a * b            both operands VARY        -> stays on the VPU
    m  = (T mod R) * mu   mu = -p^-1 mod R CONSTANT -> MXU matmul
    mp = m * p            p CONSTANT                -> MXU matmul

A convolution with a constant operand IS a matmul: with x in base-256
sub-limbs (bytes),  (x * c)_cols[t] = sum_i x_i * c_{t-i} = x @ Toeplitz(c).
Bytes are exact in bfloat16, products are <= 255^2, and a column sums at
most 48 of them, so f32 accumulation (< 2^24) is EXACT — the MXU becomes a
bit-exact u8 convolution engine at ~100x the VPU's multiply throughput.

Numeric bounds (checked in tests/test_field.py):
  * byte-column sums  <= 48 * 255^2           = 3,121,200  < 2^22  (f32 exact)
  * 16-bit refold     <= col + 256*col        < 2^30       (u32 ok)
  * final T + m*p     adds canonical limbs    < 2^30 + 2^16 (u32 ok)

This module is the go/no-go PROTOTYPE: `montmul_mxu` is differentially
tested bit-exact vs FP.mul, and bench/run.py `--kernels montmul_mxu` gives
the Mmul/s comparison.

GO/NO-GO VERDICT (2026-08-20, real v5e, n=131072 — bench/results.jsonl):
**NO-GO.**  montmul_fp (VPU separated-REDC) 4.68M mul/s vs
montmul_fp_mxu 3.71M mul/s: the u16->byte split, bf16 cast and the
32->16-bit column refold around the two constant matmuls cost more than
the matmuls save, and the first (variable x variable) convolution stays
on the VPU either way.  The prototype is kept as the measured answer to
SURVEY.md section 7 hard-part 1; production stays on the VPU path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpukzg.field.mont import FieldParams, FP, B, MASK


def _toeplitz_bytes(c_int: int, in_bytes: int, out_bytes: int) -> np.ndarray:
    """(in_bytes, out_bytes) bf16 matrix M[i, t] = byte_{t-i}(c)."""
    cb = [(c_int >> (8 * k)) & 0xFF for k in range(out_bytes)]
    m = np.zeros((in_bytes, out_bytes), np.float32)
    for i in range(in_bytes):
        for t in range(i, out_bytes):
            if t - i < len(cb):
                m[i, t] = cb[t - i]
    return m.astype(jnp.bfloat16)


class MxuRedc:
    """Per-field precomputed constant matrices + the MXU montmul."""

    def __init__(self, field: FieldParams):
        self.f = field
        L = field.L
        self.nb = 2 * L                       # bytes per element
        mu_int = field.mu_int if hasattr(field, "mu_int") else None
        if mu_int is None:
            mu_int = 0
            for i, v in enumerate(np.asarray(field.mu_limbs).tolist()):
                mu_int |= int(v) << (16 * i)
        self.MU = jnp.asarray(_toeplitz_bytes(mu_int, self.nb, self.nb))
        self.P = jnp.asarray(_toeplitz_bytes(field.modulus, self.nb, 2 * self.nb))

    # -- helpers ----------------------------------------------------------

    def _to_bytes(self, x16):
        """(..., L) u32 16-bit limbs -> (..., 2L) byte values (f32-ready)."""
        lo = (x16 & 0xFF).astype(jnp.float32)
        hi = (x16 >> 8).astype(jnp.float32)
        return jnp.stack([lo, hi], axis=-1).reshape(x16.shape[:-1] + (-1,))

    def _fold16(self, bcols):
        """(..., 2K) f32 byte columns -> (..., K) u32 16-bit columns."""
        u = bcols.astype(jnp.uint32)
        return u[..., 0::2] + (u[..., 1::2] << 8)

    def _conv_const(self, x16, mat, out16: int):
        """x (..., L16) times constant via MXU; returns (..., out16) u32
        16-bit column sums (NOT carried)."""
        xb = self._to_bytes(x16).astype(jnp.bfloat16)
        cols = jax.lax.dot_general(
            xb, mat, (((xb.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return self._fold16(cols[..., : 2 * out16])

    # -- the kernel -------------------------------------------------------

    def montmul(self, a, b):
        """Montgomery product a*b*R^-1 mod p, bit-exact vs FieldParams._mul.
        a, b: (..., L) u32 canonical-ish (< p) 16-bit limbs."""
        f = self.f
        L = f.L
        a = jnp.asarray(a, jnp.uint32)
        b = jnp.asarray(b, jnp.uint32)
        t_cols = f._prod_cols(a, b, 2 * L)          # VPU: both operands vary
        t, _ = f._carry_sweep(t_cols)               # canonical T, 2L limbs
        m_cols = self._conv_const(t[..., :L], self.MU, L)   # MXU
        m, _ = f._carry_sweep(m_cols)               # m = T*mu mod R
        mp_cols = self._conv_const(m, self.P, 2 * L)        # MXU
        s, carry = f._carry_sweep(t + mp_cols)      # T + m*p
        return f._cond_sub_mod(s[..., L:], carry)


_REDC_CACHE: dict = {}


def get_redc(field: FieldParams = FP) -> MxuRedc:
    if field.name not in _REDC_CACHE:
        _REDC_CACHE[field.name] = MxuRedc(field)
    return _REDC_CACHE[field.name]


def montmul_mxu(a, b, field: FieldParams = FP):
    return get_redc(field).montmul(a, b)
