"""Pippenger bucket MSM (SURVEY.md components 9-10, pure-JAX path).

TPU shape of the classic windowed bucket method (BASELINE.json:5
"Pippenger-style MSM ... bucket accumulation"):

* TPUs have no efficient random scatter, so bucket accumulation is
  **sort-by-digit + segmented EC scan** (SURVEY.md section 7 hard-part 2):
  for every window, points are permuted into digit order with one
  `lax.sort_key_val`, reduced with a segmented `lax.associative_scan`
  (the complete projective add is the combiner, so bucket collisions and
  infinities need no branches), and each bucket total is one static
  gather at the segment's last slot.
* All windows process as ONE leading batch axis — every EC add in the
  scan runs 256-lane-wide across (windows x points), exactly what the
  VPU wants.  `window_chunk` bounds peak memory (the gathered per-window
  point copies) without changing results.
* Window combine is the usual suffix-sum identity
  sum_b b*S_b = sum_b (sum_{b'>=b} S_b'), one more associative scan over
  the bucket axis, then a Horner fold R = [2^c] R + R_w over windows.

Work: ~2*ceil(256/c)*n batched adds vs 512*n for the double-and-add
ladder — ~8-16x fewer, at log-depth.  The Pallas montmul underneath is a
separate milestone; this module is already the algorithmic win.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def default_window(n: int) -> int:
    """Pippenger-optimal-ish window c ~ log2(n) - log2(log2(n)), clamped
    to the 16-bit limb width and to sane bucket counts."""
    if n <= 32:
        return 4
    ln = max(int(np.log2(n)), 1)
    return int(min(16, max(4, ln - max(int(np.log2(ln)), 1) + 2)))


def _digits(scalars, c: int):
    """(n, 16) canonical 16-bit limbs -> (W, n) int32 window digits."""
    n_windows = -(-256 // c)
    starts = np.arange(n_windows) * c
    limb_idx = starts // 16
    shifts = starts % 16
    padded = jnp.concatenate(
        [scalars, jnp.zeros(scalars.shape[:-1] + (2,), scalars.dtype)], -1)
    lo = padded[..., limb_idx]            # (n, W)
    hi = padded[..., limb_idx + 1]
    sh = jnp.asarray(shifts, jnp.uint32)
    d = (lo >> sh) | jnp.where(sh > 0, hi << (16 - sh), 0)
    d = d & jnp.uint32((1 << c) - 1)
    return jnp.moveaxis(d, -1, 0).astype(jnp.int32)  # (W, n)


def _segmented_sum_scan(curve, pts, seg):
    """Inclusive segmented EC-sum scan along axis 1 of (W, n) points.
    Lowering picked by ScanConfig (msm/scan.py): loop (compile-lean,
    default) or assoc."""
    from tpukzg.msm.scan import seg_scan
    return seg_scan(curve._add, curve.select, pts, seg,
                    coord_axis=1, seg_axis=1)


def _take_points(curve, pts, idx, axis=0):
    """Gather a point tuple along a leading batch axis with index array."""
    return tuple(jnp.take(c_, idx, axis=axis) for c_ in pts)


def _bucket_totals(curve, scanned, sorted_digits, c: int):
    """Last element of each digit-segment -> bucket sums S_1..S_{B-1}.

    scanned: points (W, n, ...); sorted_digits: (W, n).
    Returns points (W, B-1, ...).
    """
    B = 1 << c
    bucket_vals = jnp.arange(1, B, dtype=jnp.int32)

    pos = jax.vmap(lambda sd: jnp.searchsorted(sd, bucket_vals, side="right"))(
        sorted_digits)                                   # (W, B-1)
    last = jnp.clip(pos - 1, 0, sorted_digits.shape[1] - 1)
    hit = jnp.take_along_axis(sorted_digits, last, axis=1) == bucket_vals[None]
    hit &= pos > 0

    def gather_rows(coord):
        # coord: (W, n, ...) -> (W, B-1, ...)
        return jax.vmap(lambda c_, i: jnp.take(c_, i, axis=0))(coord, last)

    picked = tuple(gather_rows(c_) for c_ in scanned)
    inf = curve.inf(hit.shape)
    return curve.select(hit, picked, inf)


def _window_sums(curve, buckets):
    """R_w = sum_b b * S_b via suffix-scan + tree reduction.
    buckets: points (W, B-1, ...) for b = 1..B-1 -> points (W, ...)."""
    from tpukzg.msm.scan import suffix_scan
    suffix = suffix_scan(curve._add, curve.select, buckets, coord_axis=1,
                         batch_shape=buckets[0].shape[:2],
                         scan_axis_in_batch=1)
    return curve._reduce_sum(suffix, axis=1)


class Pippenger:
    """MSM engine bound to one CurveOps; jitted per (n, c) shape."""

    def __init__(self, curve, window: int | None = None,
                 window_chunk: int | None = None,
                 chunk_budget_bytes: int = 1 << 28):
        self.curve = curve
        self.window = window
        self.window_chunk = window_chunk      # None -> adaptive
        self.chunk_budget_bytes = chunk_budget_bytes
        self._jit = jax.jit(self._msm, static_argnames=("c",))

    def _chunk(self, n: int, W: int) -> int:
        """Windows per lax.map step: as many as the memory budget allows
        (fewer sequential steps = lower latency), floor 1."""
        if self.window_chunk is not None:
            return min(self.window_chunk, W)
        per_window = n * 3 * 24 * 4 * 3   # gathered+scanned point copies
        return max(1, min(W, self.chunk_budget_bytes // max(per_window, 1)))

    def msm(self, points, scalars, c: int | None = None):
        """sum_i [k_i] P_i.  points: tuple with leading n axis;
        scalars: (n, 16) canonical Fr limbs."""
        n = scalars.shape[0]
        if c is None:
            c = self.window or default_window(n)
        return self._jit(points, scalars, c=c)

    def _msm_grouped(self, points, scalars, *, groups, c: int):
        """Split the point axis at the static `groups` lengths and MSM each
        slice (e.g. the pi-aggregate and lhs terms of a batch verify)."""
        out, start = [], 0
        for g in groups:
            pts = tuple(c_[start:start + g] for c_ in points)
            out.append(self._msm(pts, scalars[start:start + g], c=c))
            start += g
        return tuple(out)

    def _msm(self, points, scalars, *, c: int):
        curve = self.curve
        digits = _digits(scalars, c)                 # (W, n)
        W, n = digits.shape

        # Chunk windows with lax.map: bounds peak memory AND keeps the
        # traced graph one-chunk-sized (compile time matters as much as
        # run time for these op-heavy bodies).
        g = self._chunk(n, W)
        Wp = -(-W // g) * g
        # Padded windows read digit 0 everywhere -> all-infinity window
        # sums -> no effect on the Horner fold.
        dchunks = jnp.pad(digits, ((0, Wp - W), (0, 0))).reshape(Wp // g, g, n)

        def chunk_fn(dg):
            idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (g, n))
            sorted_dg, perm = lax.sort_key_val(dg, idx, dimension=1)
            pts = _take_points(curve, points, perm)  # (g, n, ...)
            scanned = _segmented_sum_scan(curve, pts, sorted_dg)
            buckets = _bucket_totals(curve, scanned, sorted_dg, c)
            return _window_sums(curve, buckets)      # (g, ...)

        wres = lax.map(chunk_fn, dchunks)            # (Wp//g, g, ...)
        wres = tuple(c_.reshape((Wp,) + c_.shape[2:]) for c_ in wres)

        # Horner fold over windows, MSB window first: R = [2^c] R + R_w.
        def fold(i, acc):
            for _ in range(c):
                acc = curve._double(acc)
            wi = tuple(jnp.take(c_, Wp - 1 - i, axis=0) for c_ in wres)
            return curve._add(acc, wi)

        return lax.fori_loop(0, Wp, fold, curve.inf(()))
