"""Pallas TPU kernel: fully-fused radix-2 NTT butterfly stages
(SURVEY.md component 12; BASELINE.json:5 "NTT butterfly" kernel).

The XLA lowering (ntt/ntt.py `_butterflies`) issues log2(n) separate
stage dispatches whose (n, 16) intermediates round-trip HBM.  Here ALL
stages run on one VMEM-resident limb-major tile: HBM traffic drops from
log2(n) passes to one read + one write per blob.

Layout: (L=16, n) u32 — the polynomial axis on lanes, limbs on
sublanes.  Twiddles are pre-tiled per stage to (log_n, L, n/2) so every
stage is one montmul + add/sub over dense n/2-wide lanes with NO gathers:
the pair structure is pure static reshapes.  Field core shared with
pallas/montmul.py (carry bounds proven there).

The public wrapper keeps the library's (..., n, L) layout and performs
the bit-reversal permutation outside the kernel (one XLA gather).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukzg.field.mont import FR
from tpukzg.pallas.montmul import _montmul_lm_core
from tpukzg.pallas.ec import add_mod, sub_mod


def _tiled_twiddles(plan, inverse: bool) -> np.ndarray:
    """(log_n, L, n/2) stage-s twiddle tiled over blocks; pairs are
    flattened (block, j) with u = a[blk*2h + j], v = a[blk*2h + h + j]."""
    n, log_n, L = plan.n, plan.log_n, 16
    tabs = plan._tw_inv if inverse else plan._tw_fwd
    out = np.zeros((log_n, L, n // 2), np.uint32)
    for s in range(log_n):
        half = 1 << s
        blocks = n // (2 * half)
        tw = np.asarray(tabs[s]).reshape(half, L)      # (half, L)
        out[s] = np.tile(tw.T, (1, blocks))            # (L, half*blocks)
    return out


def _ntt_kernel(x_ref, tw_ref, scale_ref, mu_ref, pm_ref, out_ref,
                *, L, n, log_n, apply_scale):
    X = x_ref[0]                                       # (L, n)
    mu = mu_ref[:]
    pm = pm_ref[:]

    def mul(a, b):
        return _montmul_lm_core(a, b, mu, pm, L)

    for s in range(log_n):
        half = 1 << s
        blocks = n // (2 * half)
        x = X.reshape(L, blocks, 2, half)
        u = x[:, :, 0, :].reshape(L, n // 2)
        v = x[:, :, 1, :].reshape(L, n // 2)
        wv = mul(v, tw_ref[s])
        a = add_mod(u, wv, pm)
        b = sub_mod(u, wv, pm)
        X = jnp.stack([a.reshape(L, blocks, half),
                       b.reshape(L, blocks, half)], axis=2).reshape(L, n)
    if apply_scale:
        X = mul(X, jnp.broadcast_to(scale_ref[:], (L, n)))
    out_ref[0] = X


@functools.partial(jax.jit,
                   static_argnames=("log_n", "apply_scale", "interpret"))
def _ntt_call(x_lm, tw, scale, mu, pm, *, log_n, apply_scale, interpret):
    k, L, n = x_lm.shape
    kernel = functools.partial(_ntt_kernel, L=L, n=n, log_n=log_n,
                               apply_scale=apply_scale)
    return pl.pallas_call(
        kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, L, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((log_n, L, n // 2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, L, n), jnp.uint32),
        interpret=interpret,
    )(x_lm, tw, scale, mu, pm)


class NttPallas:
    """Pallas twin of NttPlan._ntt/_intt: (..., n, 16) Montgomery in/out."""

    def __init__(self, plan, interpret: bool = False):
        self.plan = plan
        self.interpret = interpret
        self._tw_f = jnp.asarray(_tiled_twiddles(plan, inverse=False))
        self._tw_i = jnp.asarray(_tiled_twiddles(plan, inverse=True))
        self._scale = jnp.asarray(np.asarray(plan.n_inv)[:, None])
        self._mu = jnp.asarray(np.asarray(FR.mu_limbs, np.uint32)[:, None])
        self._pm = jnp.asarray(np.asarray(FR.mod_limbs, np.uint32)[:, None])

    def _run(self, a, tw, apply_scale):
        plan = self.plan
        n, L = plan.n, 16
        batch = a.shape[:-2]
        a = jnp.take(a, jnp.asarray(plan.brp), axis=-2)
        x_lm = jnp.moveaxis(a.reshape((-1, n, L)), -1, -2)  # (k, L, n)
        out = _ntt_call(x_lm, tw, self._scale, self._mu, self._pm,
                        log_n=plan.log_n, apply_scale=apply_scale,
                        interpret=self.interpret)
        return jnp.moveaxis(out, -2, -1).reshape(batch + (n, L))

    def ntt(self, coeffs):
        return self._run(coeffs, self._tw_f, apply_scale=False)

    def intt(self, evals):
        return self._run(evals, self._tw_i, apply_scale=True)
