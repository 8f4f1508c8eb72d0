"""EIP-4844-shaped blob API over bytes (SURVEY.md component 19).

Blobs are n x 32-byte big-endian Fr elements storing evaluations on the
BIT-REVERSED root domain (golden/model.py:971).  This module owns the
bytes<->limb codecs and the host-side Fiat-Shamir sequencing; all math is
delegated to the jitted `Kzg` engine.  Batch entry points batch the device
work across all blobs (one barycentric eval, one ladder, two pairings for
the whole batch).
"""

from __future__ import annotations

import numpy as np

from tpukzg.field.mont import FR, R_MOD
from tpukzg.curve import g1 as g1m
from tpukzg.curve.g1 import G1
from tpukzg.kzg.core import Kzg
from tpukzg.kzg import transcript

BYTES_PER_FIELD_ELEMENT = 32


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


def blob_to_limbs(blob: bytes, n: int) -> np.ndarray:
    """n*32 big-endian bytes -> (n, 16) canonical Fr limbs (vectorized);
    raises ValueError if any element is >= r."""
    if len(blob) != n * BYTES_PER_FIELD_ELEMENT:
        raise ValueError(f"blob must be {n * BYTES_PER_FIELD_ELEMENT} bytes")
    a = np.frombuffer(blob, dtype=np.uint8).reshape(n, 32)
    limbs_be = (a[:, 0::2].astype(np.uint32) << 8) | a[:, 1::2]  # (n, 16) BE
    r_be = np.array([(R_MOD >> (16 * (15 - i))) & 0xFFFF for i in range(16)],
                    dtype=np.uint32)
    # lexicographic limbs_be < r_be, vectorized
    lt = limbs_be < r_be
    gt = limbs_be > r_be
    first_diff = np.argmax(lt | gt, axis=1)
    any_diff = (lt | gt)[np.arange(n), first_diff]
    ok = any_diff & lt[np.arange(n), first_diff]
    if not bool(np.all(ok)):
        raise ValueError("blob element out of Fr range")
    return limbs_be[:, ::-1].copy()  # little-endian limb order


def limbs_to_bytes(limbs) -> bytes:
    """(16,) canonical Fr limbs -> 32 big-endian bytes."""
    v = FR.to_int(np.asarray(limbs))
    return int(v).to_bytes(32, "big")


def fr_ints_from_limbs(limbs) -> list[int]:
    a = np.asarray(limbs)
    return [FR.to_int(row) for row in a.reshape(-1, 16)]


# ---------------------------------------------------------------------------
# blob protocol
# ---------------------------------------------------------------------------


class BlobKzg:
    """Byte-level EIP-4844 surface bound to one Setup (via Kzg engine)."""

    def __init__(self, kzg: Kzg):
        self.kzg = kzg
        self.n = kzg.n
        self.bytes_per_blob = self.n * BYTES_PER_FIELD_ELEMENT
        self._brp = kzg.plan.brp  # bit-reversal permutation indices
        self._stage = None        # lazily-built jitted device stager
        self._stage_eval = None   # fused stager + barycentric eval
        self._verdict_jit = None  # 3-way AND on device (one D2H sync)

    # -- helpers --
    #
    # Staging ships the blob BYTES (k, n, 32) u8 — the minimum possible
    # payload — via an async device_put.  A 2026-08-20 bisection
    # (bench/results.jsonl xfer/phase rows) first blamed layouts, but
    # the decisive experiment (cached input 0.068s, fresh-preblocked
    # 0.070s, device_put alone 0.02s..2.0s across runs) showed the
    # tunnel's throughput itself varies ~100x over time; the programs
    # are layout-stable.  Upload cost is weather — the pipelined API
    # overlaps it with the previous batch's device compute.

    def _stage_body(self, bytes_u8):
        """(k, n, 32) u8 big-endian blob bytes ->
        ((k, n, 16) Montgomery natural-order evals, all-in-range flag).
        The x < r check is an unrolled MSB-first fold over the static
        limb axis — no argmax/take gathers on the minor axis."""
        import jax.numpy as jnp
        brp = np.asarray(self._brp)
        a = bytes_u8.astype(jnp.uint32)
        limbs_be = (a[..., 0::2] << 8) | a[..., 1::2]   # (k, n, 16) MS-first
        r_be = [int((R_MOD >> (16 * (15 - i))) & 0xFFFF) for i in range(16)]
        ok = jnp.zeros(limbs_be.shape[:-1], bool)   # strictly less so far
        eq = jnp.ones(limbs_be.shape[:-1], bool)    # all equal so far
        for i in range(16):                          # index 0 is the MSB
            ok = ok | (eq & (limbs_be[..., i] < r_be[i]))
            eq = eq & (limbs_be[..., i] == r_be[i])
        all_ok = jnp.all(ok)
        natural = limbs_be[..., ::-1][:, brp]       # little-endian + brp
        return FR._to_mont(natural), all_ok

    def _build_stage(self):
        import jax
        return jax.jit(self._stage_body)

    def _build_stage_eval(self):
        """Staging + batched barycentric eval as TWO chained jits (each
        compiles to its own fast-layout program; chaining through device
        arrays costs one extra dispatch, ~ms)."""
        import jax
        from tpukzg.poly.poly import barycentric_eval

        if self._stage is None:
            self._stage = self._build_stage()
        ev = jax.jit(lambda mont, z: FR._from_mont(
            barycentric_eval(self.kzg.plan, mont, z)))

        def stage_eval(bytes_u8, z_mont):
            mont, ok = self._stage(bytes_u8)
            return ev(mont, z_mont), ok

        return stage_eval

    def _blob_natural_mont(self, blobs: list[bytes]) -> np.ndarray:
        """blobs -> (k, n, 16) Montgomery evals in NATURAL domain order.
        Raises ValueError if any element is >= r (checked on device)."""
        for b in blobs:
            if len(b) != self.bytes_per_blob:
                raise ValueError(f"blob must be {self.bytes_per_blob} bytes")
        if self._stage is None:
            self._stage = self._build_stage()
        raw = np.stack([np.frombuffer(b, dtype=np.uint8).reshape(self.n, 32)
                        for b in blobs])
        mont, ok = self._stage(raw)
        if not bool(np.asarray(ok)):
            raise ValueError("blob element out of Fr range")
        return mont

    def _verdict_fold(self, ok, ok_sub, ok_range):
        if self._verdict_jit is None:
            import jax
            import jax.numpy as jnp
            self._verdict_jit = jax.jit(
                lambda a, b, c: a & jnp.all(b) & c)
        return self._verdict_jit(ok, ok_sub, ok_range)

    def _decompress_g1_two_async(self, byte_list_a, byte_list_b):
        """Decompress + sqrt + on-curve + subgroup-check two point lists
        in ONE batched device program (g1.decompress_batch): the checks
        are latency-bound (fixed pow/double chains), so 2k points cost
        the wall time of k.  Returns (pts_a, pts_b, ok_device) WITHOUT
        syncing — the caller folds `ok_device` into its final verdict so
        the device work overlaps later dispatches and host hashing."""
        pts, ok = g1m.decompress_batch(list(byte_list_a) + list(byte_list_b))
        ka = len(byte_list_a)
        return (tuple(c[:ka] for c in pts), tuple(c[ka:] for c in pts), ok)

    def _decompress_g1_two(self, byte_list_a, byte_list_b):
        a, b, ok = self._decompress_g1_two_async(byte_list_a, byte_list_b)
        if not bool(np.all(np.asarray(ok))):
            raise ValueError("G1 point not in subgroup")
        return a, b

    # -- single-blob API --

    def blob_to_kzg_commitment(self, blob: bytes) -> bytes:
        evals = self._blob_natural_mont([blob])
        c = self.kzg.commit(evals)
        return g1m.compress_point(tuple(x[0] for x in c))

    def compute_kzg_proof(self, blob: bytes, z_bytes: bytes):
        """-> (proof_bytes, y_bytes)."""
        evals = self._blob_natural_mont([blob])[0]
        z = np.asarray(FR.to_mont(blob_to_limbs(z_bytes, 1)[0]))
        pi, y = self.kzg.open(evals, z)
        return g1m.compress_point(pi), limbs_to_bytes(FR.from_mont(y))

    def compute_blob_kzg_proof(self, blob: bytes, commitment_bytes: bytes) -> bytes:
        z = transcript.compute_challenge(blob, commitment_bytes, self.n)
        proof, _ = self.compute_kzg_proof(blob, transcript.fr_to_bytes(z))
        return proof

    def verify_kzg_proof(self, commitment_bytes: bytes, z_bytes: bytes,
                         y_bytes: bytes, proof_bytes: bytes) -> bool:
        c, pi = self._decompress_g1_two([commitment_bytes], [proof_bytes])
        z = blob_to_limbs(z_bytes, 1)
        y = blob_to_limbs(y_bytes, 1)
        ok = self.kzg.verify(tuple(x[0] for x in c), z[0], y[0],
                             tuple(x[0] for x in pi))
        return bool(np.asarray(ok))

    def verify_blob_kzg_proof(self, blob: bytes, commitment_bytes: bytes,
                              proof_bytes: bytes) -> bool:
        return self.verify_blob_kzg_proof_batch(
            [blob], [commitment_bytes], [proof_bytes])

    # -- batched prove/commit (TPU-native extensions: the EIP-4844
    #    surface is per-blob, but one batched MSM program beats k
    #    sequential ones by ~an order of magnitude on this hardware) --

    def blob_to_kzg_commitment_batch(self, blobs: list[bytes]) -> list[bytes]:
        """Commit every blob in ONE batched Lagrange-SRS MSM."""
        if not blobs:
            return []
        evals = self._blob_natural_mont(blobs)        # (k, n, 16)
        return g1m.compress_points(self.kzg.commit(evals))

    def compute_blob_kzg_proof_batch(self, blobs: list[bytes],
                                     commitment_bytes_list: list[bytes]
                                     ) -> list[bytes]:
        """Proofs for k blobs at their Fiat-Shamir challenge points in
        ONE batched open (barycentric + quotient + shared-SRS MSM)."""
        k = len(blobs)
        assert k == len(commitment_bytes_list)
        if k == 0:
            return []
        evals = self._blob_natural_mont(blobs)
        zs = [transcript.compute_challenge(blobs[i], commitment_bytes_list[i],
                                           self.n) for i in range(k)]
        z_mont = np.asarray(FR.from_int(
            [(zi << 256) % R_MOD for zi in zs])).reshape(k, 16)
        pi, _y = self.kzg.open(evals, z_mont)
        return g1m.compress_points(pi)

    # -- the namesake batch path --

    def verify_blob_kzg_proof_batch(self, blobs: list[bytes],
                                    commitment_bytes_list: list[bytes],
                                    proof_bytes_list: list[bytes]) -> bool:
        """Batched device pipeline (SURVEY.md section 3.1):
        host Fiat-Shamir -> one batched barycentric eval -> rho powers ->
        one 3k+1-point ladder + 2 pairings."""
        return self.verify_blob_kzg_proof_batch_async(
            blobs, commitment_bytes_list, proof_bytes_list)()

    def verify_blob_kzg_proof_batch_async(self, blobs: list[bytes],
                                          commitment_bytes_list: list[bytes],
                                          proof_bytes_list: list[bytes]):
        """Software-pipelined batch verify: dispatch the upload-bound
        front half (blob bytes upload + staging + barycentric eval +
        point decompression) NOW, without blocking, and return a
        `resolve() -> bool` closure that finishes the batch (y readback,
        rho transcript, fold MSM, pairings, verdict).

        A serving loop overlaps the tunnel/PCIe upload of batch i+1 with
        the device compute of batch i; the 3-stage
        verify_blob_kzg_proof_batch_pipeline schedule keeps the device
        queue full in addition.  The sync entry point resolves
        immediately; results are identical (same programs, same order) —
        pipelining only changes when the host blocks."""
        return _PendingBatch(self, blobs, commitment_bytes_list,
                             proof_bytes_list).result

    # -- 3-stage pipeline (VERDICT r4 next-round #2) --
    #
    # The 2-stage async API cannot overlap the fold-MSM + pairing with
    # anything: resolve() dispatches them and immediately blocks on the
    # verdict, so the driver bench measured sustained(1.657s) > block
    # (1.49s) — pipeline overhead without overlap.  The Fiat-Shamir
    # dependency (rho = H(..., y)) forces ONE sync point after the
    # barycentric eval, but the verdict sync is deferrable: stage2()
    # pulls y, hashes rho, dispatches the MSM/pairing programs and
    # returns WITHOUT blocking; result() syncs the single verdict
    # boolean.  A serving loop then keeps the device queue full:
    #
    #     pend[i+1] = batch_pipeline(batch_{i+1})   # upload+eval dispatch
    #     pend[i].stage2()                          # y sync, vb dispatch
    #     ok[i-1] = pend[i-1].result()              # free by now
    #
    # With this schedule the device runs back-to-back while the host
    # does its ~0.2 s of hashing/staging per batch in the gaps.

    def verify_blob_kzg_proof_batch_pipeline(self, blobs,
                                             commitment_bytes_list,
                                             proof_bytes_list):
        """Dispatch the front half now; returns a _PendingBatch with
        .stage2() (y sync + transcript + verify dispatch, non-blocking
        on the verdict) and .result() -> bool.  Calling .result() first
        runs stage2 implicitly (degenerates to the 2-stage API)."""
        return _PendingBatch(self, blobs, commitment_bytes_list,
                             proof_bytes_list)

    def verify_blob_kzg_proof_batch_chunked(self, blobs, commitment_bytes_list,
                                            proof_bytes_list,
                                            chunk: int = 64,
                                            retries: int = 1) -> bool:
        """Chunked driver for very large batches (SURVEY.md section 5.3):
        a failed/raising chunk is retried `retries` times before the whole
        call returns False, so one bad device step cannot poison an
        arbitrarily large run.  Chunking also pins the compiled batch
        shape, avoiding a recompile per distinct k."""
        k = len(blobs)
        for i in range(0, k, chunk):
            sl = slice(i, min(i + chunk, k))
            for attempt in range(retries + 1):
                try:
                    ok = self.verify_blob_kzg_proof_batch(
                        blobs[sl], commitment_bytes_list[sl],
                        proof_bytes_list[sl])
                    break
                except Exception:
                    if attempt == retries:
                        raise
            if not ok:
                return False
        return True


class _PendingBatch:
    """One in-flight batch verification (3-stage; see BlobKzg docstring).

    Stage 1 (constructor): host Fiat-Shamir z, blob-byte staging upload,
    barycentric-eval + decompress dispatch — returns without waiting for
    any device work.
    Stage 2 (`stage2()`): the one unavoidable sync (y feeds the rho
    transcript), then dispatches the fold-MSM + pairing + verdict-fold
    programs WITHOUT blocking on them.
    `result()`: syncs the single verdict boolean (runs stage2 first if
    the caller didn't).
    """

    def __init__(self, bk: BlobKzg, blobs, commitment_bytes_list,
                 proof_bytes_list):
        import os
        import time as _time
        self._timing = os.environ.get("TPUKZG_TIMING") == "1"
        self._marks = []
        self._clock = _time.perf_counter
        self._bk = bk
        self._failed = None       # early host-side reject -> fixed verdict
        self._ok_all = None       # device verdict array after stage2
        self._mark("begin")
        k = len(blobs)
        assert k == len(commitment_bytes_list) == len(proof_bytes_list)
        self._k = k
        if k == 0:
            self._failed = True
            return
        for b in blobs:
            if len(b) != bk.bytes_per_blob:
                self._failed = False
                return
        try:
            # async: subgroup-check verdict stays on device until the end
            self._c_pts, self._pi_pts, self._ok_sub = \
                bk._decompress_g1_two_async(commitment_bytes_list,
                                            proof_bytes_list)
        except ValueError:        # malformed encoding (host-side reject)
            self._failed = False
            return
        self._mark("decompress_dispatch")
        self._cs, self._pfs = commitment_bytes_list, proof_bytes_list

        # host Fiat-Shamir z = H(blob, C) runs while the device works
        zs = [transcript.compute_challenge(blobs[i], commitment_bytes_list[i],
                                           bk.n) for i in range(k)]
        self._zs = zs
        self._z_can = np.asarray(FR.from_int(zs)).reshape(k, 16)
        # Montgomery z computed HOST-SIDE (z * 2^256 mod r, bignum): a
        # device to_mont + readback costs a tunnel round trip per batch.
        z_mont_np = np.asarray(FR.from_int(
            [(zi << 256) % R_MOD for zi in zs])).reshape(k, 16)
        self._mark("host_fs_z")

        if bk._stage_eval is None:
            bk._stage_eval = bk._build_stage_eval()
        raw = np.stack([np.frombuffer(b, dtype=np.uint8).reshape(bk.n, 32)
                        for b in blobs])
        self._mark("np_stack")
        import jax
        # async row-major stream; dispatch chains on it without blocking.
        # (Tunnel throughput varies ~100x over time — 0.02s..2s for these
        # 32 MB — so upload cost is weather; the pipeline overlaps it
        # with the previous batch's device compute.)
        raw_dev = jax.device_put(raw)
        self._mark("device_put")
        self._y_dev, self._ok_range = bk._stage_eval(raw_dev, z_mont_np)
        self._mark("stage_eval_dispatch")

    def _mark(self, label):
        if self._timing:
            self._marks.append((label, self._clock()))

    def stage2(self) -> None:
        """y sync + rho transcript + verify dispatch (verdict NOT synced)."""
        if self._failed is not None or self._ok_all is not None:
            return
        bk, k = self._bk, self._k
        self._mark("stage2_begin")
        y_can = np.asarray(self._y_dev)  # sync: y feeds the rho transcript
        self._mark("y_sync")
        ys = fr_ints_from_limbs(y_can)
        _, rho_powers = transcript.compute_r_powers(
            self._cs, self._zs, ys, self._pfs, bk.n)
        rho_can = np.asarray(FR.from_int(rho_powers)).reshape(k, 16)
        self._mark("host_fs_rho")
        from tpukzg.utils import checked
        checked.check_limbs("verify_batch.z", self._z_can)
        checked.check_limbs("verify_batch.y", y_can)
        checked.check_limbs("verify_batch.rho", rho_can)
        ok = bk.kzg.verify_batch(self._c_pts, self._z_can, y_can,
                                 self._pi_pts, rho_can)
        self._mark("verify_batch_dispatch")
        # ONE device->host pull for all three verdicts at result() time:
        # each separate np.asarray sync pays a tunnel round trip
        self._ok_all = bk._verdict_fold(ok, self._ok_sub, self._ok_range)
        self._mark("verdict_dispatch")

    def result(self) -> bool:
        if self._failed is not None:
            return self._failed
        self.stage2()
        out = bool(np.asarray(self._ok_all))
        self._mark("verdict_sync")
        if self._timing:
            import sys as _sys
            prev = self._marks[0][1]
            parts = []
            for lbl, t in self._marks[1:]:
                parts.append(f"{lbl}={t - prev:.3f}")
                prev = t
            print("[timing]", " ".join(parts), file=_sys.stderr, flush=True)
        return out
