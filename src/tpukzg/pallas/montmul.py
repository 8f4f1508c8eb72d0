"""Pallas TPU kernel: batched Montgomery multiplication (SURVEY comp. 4).

Layout: **limb-major** (L, N) u32 tiles — batch on the 128-wide lane axis,
limbs on sublanes — so every VPU op runs fully dense lanes, unlike the
library's public (N, L) layout which pads 24 limbs onto 128 lanes
(~5x lane waste).  The pallas_call wrapper transposes at the boundary;
the intended end-state is whole fused pipelines (EC ladder steps, NTT
stages) living in this layout so the transpose amortizes away.

Carry handling: column sums stay < 2^23 (see field/mont.py bounds), and
carries are resolved with ONE ripple sweep turned parallel:
  split x = s + c*2^16, add the shifted low carries (values < 2^7),
  re-split, then a Kogge-Stone generate/propagate prefix resolves the
  remaining {0,1} ripple in log2(K) vector steps — no sequential
  lax.scan over 48 limbs.  Exactness argument in _carry_resolve.

Same separated Montgomery reduction as field/mont.py _mul:
  T = a*b;  m = (T mod R) * mu mod R;  t = (T + m*p) / R;  t -= p if >= p.
Differentially tested against FieldParams.mul in tests/test_pallas.py
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukzg.field.mont import B, MASK, FieldParams, FP, FR


def _shift_down(x, d):
    """x[i - d] along axis 0 (zeros shifted in at the top rows)."""
    if d == 0:
        return x
    pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[: x.shape[0]]


def _carry_resolve(x):
    """Canonicalize limb-major (K, N) u32 with values < 2^23 to base 2^16.

    Step 1: one split-and-add — low parts < 2^16, carries < 2^7 shift up
            one row; sums < 2^16 + 2^7 - 2.
    Step 2: re-split; now carries are in {0, 1} and low parts < 2^16.
    Step 3: Kogge-Stone prefix over (generate=carry, propagate=(s==MASK))
            resolves the remaining ripple exactly in log2(K) steps:
            cin_{i+1} = g_i | (p_i & cin_i).
    Returns (canonical (K, N), carry_out (N,) in {0, 1})."""
    k = x.shape[0]
    s = (x & MASK) + _shift_down(x >> B, 1)      # step 1
    g = s >> B                                    # step 2: {0,1} carries
    s = s & MASK
    p = (s == MASK).astype(jnp.uint32)            # step 3: KS prefix
    G, P = g, p
    d = 1
    while d < k:
        G = G | (P * _shift_down(G, d))
        P = P * _shift_down(P, d)
        d <<= 1
    cin = _shift_down(G, 1)
    out = (s + cin) & MASK
    # Carry past the top row is provably zero at every call site (the
    # value is bounded below 2^(16K)); G[k-1] is returned for the
    # conditional-subtract predicate where the bound is < 2p < 2^(16K).
    return out, G[k - 1]


def _prod_cols_lm(a, b, L, n_cols):
    """Column sums of a*b in limb-major layout: a, b (L, N) ->
    (n_cols, N); products split lo/hi before accumulation (sums < 2^22)."""
    cols = jnp.zeros((n_cols,) + a.shape[1:], jnp.uint32)
    pad0 = [(0, 0)] * (a.ndim - 1)
    for i in range(L):
        o = a[i][None] * b                       # (L, N)
        lo = o & MASK
        hi = o >> B
        if i < n_cols:
            w = min(L, n_cols - i)
            cols = cols + jnp.pad(lo[:w], [(i, n_cols - i - w)] + pad0)
        if i + 1 < n_cols:
            w = min(L, n_cols - i - 1)
            cols = cols + jnp.pad(hi[:w], [(i + 1, n_cols - i - 1 - w)] + pad0)
    return cols


def _sub_mod_lm(res, carry, p_limbs):
    """res (L, *batch) canonical, carry (*batch) in {0,1}: subtract p if
    >= p.  Borrow chain resolved with the same KS trick on (diff, borrow)."""
    L = res.shape[0]
    pm = p_limbs.reshape((L,) + (1,) * (res.ndim - 1))
    d = res + (MASK + 1) - pm                    # (L, N): no underflow
    s = d & MASK
    g = 1 - (d >> B)                             # borrow out of position i
    p = (s == 0).astype(jnp.uint32)              # propagates borrow
    G, P = g, p
    dd = 1
    while dd < L:
        G = G | (P * _shift_down(G, dd))
        P = P * _shift_down(P, dd)
        dd <<= 1
    bin_ = _shift_down(G, 1)
    diff = (s + (MASK + 1) - bin_) & MASK
    borrow_out = G[L - 1]
    ge = (carry > 0) | (borrow_out == 0)
    return jnp.where(ge[None], diff, res)


def _montmul_lm_core(a, b, mu, pm, L):
    """Limb-major Montgomery product core.  a, b (L, N); mu, pm (L, 1)."""
    t_cols = _prod_cols_lm(a, b, L, 2 * L)
    t, _ = _carry_resolve(t_cols)
    m_cols = _prod_cols_lm(t[:L], jnp.broadcast_to(mu, (L,) + a.shape[1:]), L, L)
    m, _ = _carry_resolve(m_cols)
    mp = _prod_cols_lm(m, jnp.broadcast_to(pm, (L,) + a.shape[1:]), L, 2 * L)
    s, carry = _carry_resolve(t + mp)
    return _sub_mod_lm(s[L:], carry, pm[:, 0])


def montmul_lm(a, b, params: FieldParams):
    """Limb-major Montgomery product: a, b (L, N) u32 -> (L, N).
    Pure-JAX body — used directly AND as the Pallas kernel body."""
    mu = jnp.asarray(params.mu_limbs)[:, None]
    pm = jnp.asarray(params.mod_limbs)[:, None]
    return _montmul_lm_core(a, b, mu, pm, params.L)


def _montmul_kernel(a_ref, b_ref, mu_ref, pm_ref, out_ref, *, L):
    out_ref[:] = _montmul_lm_core(a_ref[:], b_ref[:], mu_ref[:], pm_ref[:], L)


@functools.partial(jax.jit, static_argnames=("L", "tile", "interpret"))
def _montmul_lm_call(a, b, mu, pm, *, L, tile, interpret):
    """a, b (L, M) u32 with M % tile == 0 -> (L, M)."""
    M = a.shape[1]
    kernel = functools.partial(_montmul_kernel, L=L)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(M // tile,),
        in_specs=[spec, spec, cspec, cspec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, M), jnp.uint32),
        interpret=interpret,
    )(a, b, mu, pm)


def montmul_lm_pallas(a, b, params: FieldParams, tile: int = 2048,
                      interpret: bool = False):
    """Limb-major Montgomery product through the Pallas kernel with NO
    layout change: a, b (L, *batch) u32 -> (L, *batch).  Batch dims are
    flattened onto the lane axis and padded to the tile width (garbage
    pad lanes compute garbage and are sliced away).  This is the
    production dispatch target of FieldLM.mul (TPUKZG_MONTMUL=pallas,
    SURVEY comp. 4 / VERDICT r2 next-round #4)."""
    L = params.L
    batch = a.shape[1:]
    M = 1
    for d in batch:
        M *= int(d)
    a2 = a.reshape(L, M)
    b2 = jnp.broadcast_to(b, a.shape).reshape(L, M)
    Mp = -(-M // 128) * 128
    t = min(tile, Mp)
    Mp = -(-Mp // t) * t
    if Mp != M:
        a2 = jnp.pad(a2, ((0, 0), (0, Mp - M)))
        b2 = jnp.pad(b2, ((0, 0), (0, Mp - M)))
    mu = jnp.asarray(np.asarray(params.mu_limbs, np.uint32)[:, None])
    pm = jnp.asarray(np.asarray(params.mod_limbs, np.uint32)[:, None])
    out = _montmul_lm_call(a2, b2, mu, pm, L=L, tile=t, interpret=interpret)
    return out[:, :M].reshape((L,) + batch)


def make_montmul_pallas(params: FieldParams, tile: int = 512,
                        interpret: bool = False):
    """Returns f(a, b) on the PUBLIC (N, L) layout, computing through the
    limb-major Pallas kernel with a grid over N//tile lane-tiles."""
    L = params.L
    kernel = functools.partial(_montmul_kernel, L=L)
    mu = np.asarray(params.mu_limbs, dtype=np.uint32)[:, None]
    pm = np.asarray(params.mod_limbs, dtype=np.uint32)[:, None]

    @jax.jit
    def mul(a, b):
        n = a.shape[0]
        assert n % tile == 0, f"batch {n} must be a multiple of tile {tile}"
        a_lm = a.T  # (L, N)
        b_lm = b.T
        out = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((L, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            interpret=interpret,
        )(a_lm, b_lm, mu, pm)
        return out.T

    return mul
