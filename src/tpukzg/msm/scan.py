"""Compile-lean segmented/suffix EC scans for the Pippenger bucket pass.

Two interchangeable implementations of the inclusive (optionally
segmented) scan whose combiner is the complete EC add (SURVEY.md
component 10 context — sort + segmented-scan bucket accumulation):

* ``assoc`` — `lax.associative_scan`.  Work-efficient (~2n combiner
  applications) but the recursive lowering instantiates the combiner
  graph ~2*log2(n) times, which made the round-1 executables ~100 MB
  and pushed cold CPU compiles past the driver timeouts
  (VERDICT.md Weak #1-#3).
* ``loop`` — Hillis-Steele inside ONE `lax.fori_loop`: the graph holds
  exactly one combiner instance; runtime does log2(n) full-width
  passes.  On a 128-lane VPU the full-width passes pipeline well, and
  graph size (compile time, executable size, stack depth) drops ~20x.

Selection: `TPUKZG_SCAN_IMPL` env = ``loop`` (default) | ``assoc``
(utils/config.py `ScanConfig` — SURVEY.md section 5.6 wiring).
Both are bit-exact (differential-tested in tests/test_msm.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpukzg.utils.config import ScanConfig


def _ceil_log2(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


def seg_scan(add_fn, select_fn, pts, seg, *, coord_axis: int, seg_axis: int,
             impl: str | None = None):
    """Inclusive segmented scan of a point coord tuple.

    pts: tuple of arrays, scan runs along `coord_axis` of each;
    seg: segment-id array (sorted — equal ids are contiguous), scanned
    along `seg_axis`; select_fn(mask, a, b) must broadcast a seg-shaped
    mask over the coord arrays.
    """
    impl = impl or ScanConfig.from_env().impl
    if impl == "pallas":
        # VMEM-fused kernel (pallas/bucket.py): limb-major G1 coords
        # (L, g, n) only; anything else falls back to loop mode.
        if (len(pts) == 3 and pts[0].ndim == 3 and coord_axis == 2
                and seg_axis == 1 and pts[0].shape[0] == 24):
            from tpukzg.pallas.bucket import seg_scan_pallas
            interpret = jax.default_backend() == "cpu"
            return seg_scan_pallas(pts, seg, interpret=interpret)
        impl = "loop"
    if impl == "assoc":
        # associative_scan applies ONE axis index to every pytree leaf:
        # expand seg to the coord rank, placing its scan axis at
        # coord_axis (leading pads for limb-major (L, g, n) coords,
        # trailing pads for public (g, n, L) coords).
        ca = coord_axis % pts[0].ndim
        sa_ = seg_axis % seg.ndim
        lead = ca - sa_
        trail = pts[0].ndim - seg.ndim - lead
        assert lead >= 0 and trail >= 0, (coord_axis, seg_axis)
        seg_x = seg.reshape((1,) * lead + seg.shape + (1,) * trail)
        mask_squeeze = tuple(range(lead)) + tuple(
            range(pts[0].ndim - trail, pts[0].ndim))

        def combine(a, b):
            (pa, sa), (pb, sb) = a, b
            merged = add_fn(pa, pb)
            m = sa == sb
            if mask_squeeze:
                m = jnp.squeeze(m, axis=mask_squeeze)
            out = select_fn(m, merged, pb)
            return (out, sb)

        (scanned, _) = lax.associative_scan(combine, (pts, seg_x),
                                            axis=ca)
        return scanned

    n = seg.shape[seg_axis]
    steps = _ceil_log2(n)
    pos = lax.broadcasted_iota(jnp.int32, seg.shape,
                               seg_axis % seg.ndim)

    def body(j, cur):
        d = jnp.int32(1) << j
        shifted = tuple(jnp.roll(c_, d, axis=coord_axis) for c_ in cur)
        seg_sh = jnp.roll(seg, d, axis=seg_axis)
        valid = (pos >= d) & (seg == seg_sh)
        merged = add_fn(cur, shifted)
        return select_fn(valid, merged, cur)

    return lax.fori_loop(0, steps, body, pts)


def suffix_scan(add_fn, select_fn, pts, *, coord_axis: int,
                batch_shape, scan_axis_in_batch: int,
                impl: str | None = None):
    """Inclusive suffix-sum scan (no segmentation): out[i] = sum_{j>=i}.

    batch_shape: the coord arrays' batch shape (what select_fn masks
    over); scan_axis_in_batch: position of the scan axis within it.
    """
    impl = impl or ScanConfig.from_env().impl
    if impl == "pallas":
        # Same VMEM-fused kernel, single-segment over flipped lanes
        # (pallas/bucket.py suffix_scan_pallas); non-G1-LM shapes fall
        # back to loop mode like seg_scan above.
        if (len(pts) == 3 and pts[0].ndim == 3 and coord_axis == 2
                and scan_axis_in_batch == 1 and pts[0].shape[0] == 24):
            from tpukzg.pallas.bucket import suffix_scan_pallas
            interpret = jax.default_backend() == "cpu"
            return suffix_scan_pallas(pts, interpret=interpret)
        impl = "loop"
    rev = tuple(jnp.flip(c_, axis=coord_axis) for c_ in pts)
    if impl == "assoc":
        scanned = lax.associative_scan(add_fn, rev, axis=coord_axis)
        return tuple(jnp.flip(c_, axis=coord_axis) for c_ in scanned)

    n = batch_shape[scan_axis_in_batch]
    steps = _ceil_log2(n)
    pos = lax.broadcasted_iota(jnp.int32, tuple(batch_shape),
                               scan_axis_in_batch % len(batch_shape))

    def body(j, cur):
        d = jnp.int32(1) << j
        shifted = tuple(jnp.roll(c_, d, axis=coord_axis) for c_ in cur)
        valid = pos >= d
        merged = add_fn(cur, shifted)
        return select_fn(valid, merged, cur)

    out = lax.fori_loop(0, steps, body, rev)
    return tuple(jnp.flip(c_, axis=coord_axis) for c_ in out)
