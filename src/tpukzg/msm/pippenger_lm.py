"""Limb-major Pippenger MSM — the production G1 MSM path (SURVEY 9-10).

Identical algorithm to msm/pippenger.py (sort-by-digit + segmented
EC-scan buckets) re-laid for the limb-major layout: point coords are
(L, n) with the point index on the LANE axis, so every EC add in the
scan runs dense 128-wide lanes (TPU microbench 2026-08-16: ~2x from
layout alone, more once the fused Pallas EC kernel lands underneath).

Public boundary stays the library's (n, L) layout; transposes happen once
per MSM call and amortize to nothing against the O(W*n) adds.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpukzg.curve.weierstrass_lm import G1_LM, CurveLM
from tpukzg.msm.pippenger import _digits, default_window


def _fold_curve() -> CurveLM:
    """Curve ops for the Horner window fold (a ~256-step single/narrow-
    lane doubling chain — pure latency).  TPUKZG_FOLD_CARRY=ks swaps the
    48-step lax.scan carry sweeps for log-depth Kogge-Stone (bit-exact,
    tests/test_pallas.py); default stays "scan" until the TPU timing row
    is committed (VERDICT r3 lesson: defaults are earned, not guessed)."""
    import os
    from tpukzg.field.limb_major import FieldLM
    from tpukzg.field.mont import FP
    impl = os.environ.get("TPUKZG_FOLD_CARRY")
    if impl is None:
        # EARNED TPU default (committed 2026-08-20 rows: k=256 grouped
        # fold 0.414s -> 0.351s with KS); scan elsewhere (compile-lean).
        impl = "ks" if jax.default_backend() != "cpu" else "scan"
    assert impl in ("scan", "ks"), impl
    if impl == "scan":
        return G1_LM
    return CurveLM(FieldLM(FP, carry_impl="ks"), b3_small=12)


def _seg_scan(curve, pts, seg):
    """Segmented inclusive EC-sum scan along the last (lane) axis.
    pts coords (L, g, n); seg (g, n).  Lowering picked by ScanConfig
    (msm/scan.py): loop (compile-lean, default) or assoc."""
    from tpukzg.msm.scan import seg_scan
    return seg_scan(curve.add, curve.select, pts, seg,
                    coord_axis=2, seg_axis=1)


def _bucket_totals(curve, scanned, sorted_dg, c: int):
    B_ = 1 << c
    bucket_vals = jnp.arange(1, B_, dtype=jnp.int32)
    pos = jax.vmap(lambda sd: jnp.searchsorted(sd, bucket_vals, side="right"))(
        sorted_dg)                                    # (g, B-1)
    last = jnp.clip(pos - 1, 0, sorted_dg.shape[-1] - 1)
    hit = (jnp.take_along_axis(sorted_dg, last, axis=-1) == bucket_vals[None])
    hit &= pos > 0
    picked = tuple(jnp.take_along_axis(c_, last[None], axis=2)
                   for c_ in scanned)                 # (L, g, B-1)
    inf = curve.inf(hit.shape)
    return curve.select(hit, picked, inf)


def _window_sums(curve, buckets):
    """sum_b b*S_b via suffix scan over the bucket (lane) axis + reduce.
    buckets coords (L, g, B-1)."""
    from tpukzg.msm.scan import suffix_scan
    suffix = suffix_scan(curve.add, curve.select, buckets, coord_axis=2,
                         batch_shape=buckets[0].shape[1:3],
                         scan_axis_in_batch=1)
    return curve.reduce_sum_lanes(suffix, axis=1)     # over bucket axis


class PippengerLM:
    def __init__(self, window: int | None = None,
                 window_chunk: int | None = None,
                 chunk_budget_bytes: int = 1 << 28):
        from tpukzg.utils.config import MsmConfig
        env = MsmConfig.from_env()
        self.curve = G1_LM
        self.fold_curve = _fold_curve()
        self.window = window if window is not None else env.window
        self.window_chunk = (window_chunk if window_chunk is not None
                             else env.window_chunk)
        self.chunk_budget_bytes = chunk_budget_bytes
        self._acc_jit = None     # chunked-MSM partial-point reducer
        self._jit = jax.jit(self._msm_public, static_argnames=("c",))
        self._jit_batch = jax.jit(self._msm_batch_public,
                                  static_argnames=("c",))
        self._jit_fixed = jax.jit(self._msm_fixed_public,
                                  static_argnames=("c",))

    def _chunk(self, n: int, W: int) -> int:
        if self.window_chunk is not None:
            return min(self.window_chunk, W)
        per_window = n * 3 * 24 * 4 * 3
        return max(1, min(W, self.chunk_budget_bytes // max(per_window, 1)))

    def _msm_grouped(self, points, scalars, *, groups, c: int):
        """G independent MSMs over slices of the point axis, as ONE
        sort+scan program with a G-lane-batched window fold.

        The round-3 version ran one full program per group — two
        sequential device programs for the batch-verify fold, each with
        its own single-lane 256-step doubling chain (the chain is
        latency-bound: VERDICT r4 profile).  Here the G groups' digit
        rows share one chunked sort/scan pass (same W, same c) and the
        Horner window fold runs batched over G lanes, so the doubling
        chain is paid once.

        points: public (n_total, L) coord tuple; scalars (n_total, 16);
        `groups` static slice lengths summing to n_total.  Returns a
        tuple of G public-layout single points.  Bit-exact vs the
        per-group path (same per-group sort order and add order).
        """
        G = len(groups)
        nmax = max(groups)
        curve = self.curve
        # zero-pad each group to nmax: zero scalars -> digit 0 -> never
        # picked by bucket_vals (which start at 1), so pads are inert.
        pts_g, scal_g, start = [], [], 0
        for g in groups:
            sl = tuple(c_[start:start + g] for c_ in points)
            pts_g.append(tuple(
                jnp.pad(c_, ((0, nmax - g),) + ((0, 0),) * (c_.ndim - 1))
                for c_ in sl))
            scal_g.append(jnp.pad(scalars[start:start + g],
                                  ((0, nmax - g), (0, 0))))
            start += g
        pts_flat = tuple(                      # (L, G*nmax) limb-major
            jnp.concatenate([jnp.moveaxis(p[i], -1, 0) for p in pts_g],
                            axis=-1)
            for i in range(len(points)))
        scal = jnp.stack(scal_g)               # (G, nmax, 16)
        digits = _digits(scal.reshape(G * nmax, 16), c)  # (W, G*nmax)
        W = digits.shape[0]
        rows = digits.reshape(W, G, nmax).reshape(W * G, nmax)
        row_grp = np.arange(W * G, dtype=np.int32) % G   # group of row r
        gch = self._chunk(nmax, W * G)
        Rp = -(-(W * G) // gch) * gch
        rows_p = jnp.pad(rows, ((0, Rp - W * G), (0, 0))).reshape(
            Rp // gch, gch, nmax)
        offs_p = jnp.pad(jnp.asarray(row_grp * nmax, jnp.int32),
                         (0, Rp - W * G)).reshape(Rp // gch, gch)

        def chunk_fn(inp):
            dg, offs = inp                     # (gch, nmax), (gch,)
            idx = jnp.broadcast_to(jnp.arange(nmax, dtype=jnp.int32),
                                   (gch, nmax))
            sorted_dg, perm = lax.sort_key_val(dg, idx, dimension=1)
            flat_idx = perm + offs[:, None]    # into (L, G*nmax)
            pts = tuple(jnp.take(c_, flat_idx, axis=1) for c_ in pts_flat)
            scanned = _seg_scan(curve, pts, sorted_dg)
            buckets = _bucket_totals(curve, scanned, sorted_dg, c)
            return _window_sums(curve, buckets)            # (L, gch)

        wres = lax.map(chunk_fn, (rows_p, offs_p))         # (Rp//gch, L, gch)
        wres = tuple(jnp.moveaxis(c_, 1, 0).reshape(c_.shape[1], Rp)
                     [:, :W * G].reshape(-1, W, G)
                     for c_ in wres)                       # (L, W, G)

        fold_c = self.fold_curve

        def fold(i, acc):
            for _ in range(c):
                acc = fold_c.double(acc)
            wi = tuple(c_[:, W - 1 - i] for c_ in wres)    # MSB window first
            return fold_c.add(acc, wi)

        res = lax.fori_loop(0, W, fold, fold_c.inf((G,)))  # coords (L, G)
        return tuple(tuple(c_[:, i] for c_ in res) for i in range(G))

    # -- public-layout wrapper --

    # Largest single-program point count: the Hillis-Steele scan holds
    # ~30 live (L, g, n) u32 intermediates, so one 2^20-point window row
    # wants ~39 GB HBM (observed OOM, v5e 16 GB).  Above this the MSM
    # splits into equal point-chunks whose partial results EC-add — the
    # same group element by associativity (affine-checked in
    # tests/test_msm.py), one extra add per chunk.
    point_chunk = 1 << 17

    def msm(self, points, scalars, c: int | None = None):
        """points: (n, L)-layout coord tuple; scalars (n, 16) canonical.
        Returns a public-layout point (3 coords, (L,) arrays)."""
        n = scalars.shape[0]
        if c is None:
            c = self.window or default_window(n)
        if n <= self.point_chunk:
            return self._jit(points, scalars, c=c)
        import jax
        m = self.point_chunk
        npad = -(-n // m) * m
        if npad != n:   # zero scalars -> inert pad points (digit 0)
            points = tuple(jnp.pad(p, ((0, npad - n),) + ((0, 0),) *
                                   (p.ndim - 1)) for p in points)
            scalars = jnp.pad(scalars, ((0, npad - n), (0, 0)))
        acc = None
        if self._acc_jit is None:
            self._acc_jit = jax.jit(self.fold_curve.add)
        for i in range(0, npad, m):
            part = self._jit(tuple(p[i:i + m] for p in points),
                             scalars[i:i + m], c=c)
            part_lm = tuple(p for p in part)
            acc = part_lm if acc is None else self._acc_jit(acc, part_lm)
        return acc

    def _msm_public(self, points, scalars, *, c: int):
        pts_lm = tuple(jnp.moveaxis(p, -1, 0) for p in points)  # (L, n)
        out = self._msm_lm(pts_lm, scalars, c=c)
        return tuple(o for o in out)  # (L,) coords — public single point

    # Same trace-level call shape as msm.pippenger.Pippenger._msm, so the
    # Kzg engine can hold either implementation.
    _msm = _msm_public

    # -- fixed-base MSM with precomputed window tables (SURVEY comp. 17) --

    def build_fixed_table(self, points, c: int):
        """points: public (n, L) coord tuple -> window table, coords
        (W, L, n): table[w] = [2^(c*w)] P_i.  One 255-double chain on
        device, built once per SRS and kept in HBM (~30 MB at n=4096).
        Turns every subsequent MSM into a SINGLE bucket pass with no
        window-fold doubling chain."""
        curve = self.curve
        W = -(-256 // c)

        def build(pts):
            plm = tuple(jnp.moveaxis(p, -1, 0) for p in pts)

            def step(carry, _):
                nxt = carry
                for _ in range(c):
                    nxt = curve.double(nxt)
                return nxt, carry

            _, tabs = lax.scan(step, plm, None, length=W)
            return tabs                                    # (W, L, n) each

        return jax.jit(build)(points)

    def msm_fixed(self, table, scalars, c: int):
        """table from build_fixed_table (coords (W, L, n)); scalars
        (k, n, 16) canonical.  -> public-layout point batch ((k, L))."""
        return self._jit_fixed(table, scalars, c=c)

    def _msm_fixed_public(self, table, scalars, *, c: int):
        curve = self.curve
        digits = _digits(scalars, c)                       # (W, k, n)
        W, k, n = digits.shape
        keys = jnp.moveaxis(digits, 1, 0).reshape(k, W * n)
        pts_flat = tuple(jnp.moveaxis(t, 0, 1).reshape(t.shape[1], W * n)
                         for t in table)                   # (L, W*n)
        per_row = W * n * 3 * 24 * 4 * 3
        g = max(1, min(k, self.chunk_budget_bytes // max(per_row, 1)))
        kp = -(-k // g) * g
        keys_p = jnp.pad(keys, ((0, kp - k), (0, 0))).reshape(kp // g, g, W * n)

        def chunk_fn(dg):
            idx = jnp.broadcast_to(jnp.arange(W * n, dtype=jnp.int32),
                                   (g, W * n))
            sorted_dg, perm = lax.sort_key_val(dg, idx, dimension=1)
            pts = tuple(jnp.take(c_, perm, axis=1) for c_ in pts_flat)
            scanned = _seg_scan(curve, pts, sorted_dg)
            buckets = _bucket_totals(curve, scanned, sorted_dg, c)
            return _window_sums(curve, buckets)            # (L, g): one
            # full MSM per row — the table absorbed the window fold

        res = lax.map(chunk_fn, keys_p)                    # (kp//g, L, g)
        res = tuple(jnp.moveaxis(c_, 1, 0).reshape(c_.shape[1], kp)[:, :k]
                    for c_ in res)                         # (L, k)
        return tuple(jnp.moveaxis(c_, 0, -1) for c_ in res)  # (k, L)

    # -- batched MSM over SHARED points (k scalar vectors, one SRS) --

    def msm_batch(self, points, scalars, c: int | None = None):
        """points: shared (n, L)-layout coord tuple; scalars (k, n, 16)
        canonical.  Returns a public-layout point batch ((k, L) coords).

        One sort+scan over the (window x batch) axis — the whole batch
        of MSMs is a single device program, unlike mapping msm() over k
        (which unrolls k copies of the graph and compiles forever)."""
        k, n = scalars.shape[0], scalars.shape[1]
        if c is None:
            c = self.window or default_window(n)
        return self._jit_batch(points, scalars, c=c)

    def _msm_batch_public(self, points, scalars, *, c: int):
        pts_lm = tuple(jnp.moveaxis(p, -1, 0) for p in points)  # (L, n)
        out = self._msm_lm_shared(pts_lm, scalars, c=c)         # (L, k)
        return tuple(jnp.moveaxis(o, 0, -1) for o in out)       # (k, L)

    def _msm_lm_shared(self, pts_lm, scalars, *, c: int):
        curve = self.curve
        digits = _digits(scalars, c)                  # (W, k, n)
        W, k, n = digits.shape
        dflat = digits.reshape(W * k, n)
        g = self._chunk(n, W * k)
        Wp = -(-(W * k) // g) * g
        dchunks = jnp.pad(dflat, ((0, Wp - W * k), (0, 0))).reshape(
            Wp // g, g, n)

        def chunk_fn(dg):
            idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (g, n))
            sorted_dg, perm = lax.sort_key_val(dg, idx, dimension=1)
            pts = tuple(jnp.take(c_, perm, axis=1) for c_ in pts_lm)
            scanned = _seg_scan(curve, pts, sorted_dg)
            buckets = _bucket_totals(curve, scanned, sorted_dg, c)
            return _window_sums(curve, buckets)       # coords (L, g)

        wres = lax.map(chunk_fn, dchunks)             # (Wp//g, L, g)
        wres = tuple(jnp.moveaxis(c_, 1, 0).reshape(c_.shape[1], Wp)
                     [:, :W * k].reshape(-1, W, k)
                     for c_ in wres)                  # (L, W, k)

        fold_c = self.fold_curve

        def fold(i, acc):
            for _ in range(c):
                acc = fold_c.double(acc)
            wi = tuple(c_[:, W - 1 - i] for c_ in wres)   # MSB window first
            return fold_c.add(acc, wi)

        return lax.fori_loop(0, W, fold, fold_c.inf((k,)))

    # -- core --

    def _msm_lm(self, pts_lm, scalars, *, c: int):
        curve = self.curve
        digits = _digits(scalars, c)                  # (W, n)
        W, n = digits.shape
        g = self._chunk(n, W)
        Wp = -(-W // g) * g
        dchunks = jnp.pad(digits, ((0, Wp - W), (0, 0))).reshape(Wp // g, g, n)

        def chunk_fn(dg):
            idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (g, n))
            sorted_dg, perm = lax.sort_key_val(dg, idx, dimension=1)
            pts = tuple(jnp.take(c_, perm, axis=1) for c_ in pts_lm)  # (L,g,n)
            scanned = _seg_scan(curve, pts, sorted_dg)
            buckets = _bucket_totals(curve, scanned, sorted_dg, c)
            return _window_sums(curve, buckets)       # coords (L, g)

        wres = lax.map(chunk_fn, dchunks)             # (Wp//g, L, g)
        wres = tuple(jnp.moveaxis(c_, 1, 0).reshape(c_.shape[1], Wp)
                     for c_ in wres)                  # (L, Wp)

        fold_c = self.fold_curve

        def fold(i, acc):
            for _ in range(c):
                acc = fold_c.double(acc)
            wi = tuple(c_[:, Wp - 1 - i] for c_ in wres)
            return fold_c.add(acc, wi)

        return lax.fori_loop(0, Wp, fold, fold_c.inf(()))
