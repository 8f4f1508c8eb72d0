"""Pallas TPU kernel: segmented EC-sum scan for Pippenger buckets.

SURVEY.md component 10 / BASELINE.json:5 "bucket accumulation in Pallas".

The bucket pass is sort-by-digit + inclusive segmented scan whose
combiner is the complete EC add.  The XLA lowering (msm/scan.py loop
mode) runs log2(n) Hillis-Steele steps, each a separate dispatch whose
~30 intermediate (L, N) tensors round-trip HBM.  This kernel keeps the
three coordinate planes in VMEM for ALL log2(n) steps: HBM traffic
drops from ~log2(n) full passes to exactly one read + one write of the
coords.

Layout: limb-major (L, g, n) coords — n (the sorted-points axis) on
lanes, one window-row g per grid step.  Shifts are static (the step
loop is unrolled: log2(n) <= 12 for the verify path), so they lower to
plain vector slices.  The EC formula is pallas/ec.py, sharing the
proven carry bounds of pallas/montmul.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukzg.field.mont import FP
from tpukzg.pallas.ec import ec_add

_SENTINEL = np.int32(0x7FFFFFF0)


def _shift_lanes(x, d):
    """x[..., i - d] along the last axis, zero-filled (static d)."""
    if d == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def _seg_scan_kernel(k_ref, x_ref, y_ref, z_ref, mu_ref, pm_ref,
                     ox_ref, oy_ref, oz_ref, *, L, n, steps, b3_small):
    X = x_ref[:, 0, :]
    Y = y_ref[:, 0, :]
    Z = z_ref[:, 0, :]
    keys = k_ref[:]                       # (1, n) int32
    mu = mu_ref[:]
    pm = pm_ref[:]
    pos = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    for j in range(steps):
        d = 1 << j
        Xs, Ys, Zs = (_shift_lanes(c, d) for c in (X, Y, Z))
        valid = (pos >= d) & (keys == _shift_lanes(keys, d))
        Xa, Ya, Za = ec_add((X, Y, Z), (Xs, Ys, Zs), mu, pm, L,
                            b3_small=b3_small)
        X = jnp.where(valid, Xa, X)
        Y = jnp.where(valid, Ya, Y)
        Z = jnp.where(valid, Za, Z)

    ox_ref[:, 0, :] = X
    oy_ref[:, 0, :] = Y
    oz_ref[:, 0, :] = Z


@functools.partial(jax.jit, static_argnames=("interpret", "steps"))
def _seg_scan_call(pts, seg, mu, pm, *, steps, interpret):
    L, g, n = pts[0].shape
    kernel = functools.partial(_seg_scan_kernel, L=L, n=n, steps=steps,
                               b3_small=12)
    coord_spec = pl.BlockSpec((L, 1, n), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(coord_spec, coord_spec, coord_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((L, g, n), jnp.uint32)
                        for _ in range(3)),
        interpret=interpret,
    )(seg, *pts, mu, pm)
    return out


def seg_scan_pallas(pts, seg, *, interpret: bool = False):
    """Drop-in for msm/scan.py seg_scan on G1 limb-major coords.

    pts: (X, Y, Z) of (L, g, n) u32; seg: (g, n) int32 sorted keys.
    n is padded to a multiple of 128 with sentinel-keyed garbage lanes
    (their scan stays confined to the sentinel segment) and sliced back.
    The step count covers the PRE-pad length only: the sentinel segment's
    scan may be incomplete, but it is sliced away.
    """
    L, g, n = pts[0].shape
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))))
    npad = -(-n // 128) * 128
    if npad != n:
        pts = tuple(jnp.pad(c, ((0, 0), (0, 0), (0, npad - n))) for c in pts)
        seg = jnp.pad(seg, ((0, 0), (0, npad - n)),
                      constant_values=int(_SENTINEL))
    mu = jnp.asarray(np.asarray(FP.mu_limbs, np.uint32)[:, None])
    pm = jnp.asarray(np.asarray(FP.mod_limbs, np.uint32)[:, None])
    out = _seg_scan_call(pts, seg.astype(jnp.int32), mu, pm,
                         steps=steps, interpret=interpret)
    if npad != n:
        out = tuple(c[..., :n] for c in out)
    return out
