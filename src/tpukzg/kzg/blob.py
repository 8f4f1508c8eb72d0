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

    # -- helpers --

    def _stage_body(self, bytes_u8):
        """(k, n, 32) u8 big-endian blob bytes ->
        ((k, n, 16) Montgomery natural-order evals, all-in-range flag).
        Raw bytes upload (half the traffic of u32 limbs) + all limb
        work on device — the tunnel made host staging ~10% of batch
        verify wall time.  Traced inside a caller's jit."""
        import jax.numpy as jnp
        r_be = np.array([(R_MOD >> (16 * (15 - i))) & 0xFFFF
                         for i in range(16)], dtype=np.uint32)
        brp = np.asarray(self._brp)
        a = bytes_u8.astype(jnp.uint32)
        limbs_be = (a[..., 0::2] << 8) | a[..., 1::2]   # (k, n, 16)
        lt = limbs_be < r_be
        gt = limbs_be > r_be
        first = jnp.argmax(lt | gt, axis=-1)
        any_diff = jnp.take_along_axis(lt | gt, first[..., None], -1)[..., 0]
        ok = jnp.all(any_diff &
                     jnp.take_along_axis(lt, first[..., None], -1)[..., 0])
        natural = limbs_be[..., ::-1][:, brp]           # little-endian + brp
        return FR._to_mont(natural), ok

    def _build_stage(self):
        import jax
        return jax.jit(self._stage_body)

    def _build_stage_eval(self):
        """One fused jit: byte staging + batched barycentric eval.
        Merging the two dispatches matters because every device call
        rides the host<->chip tunnel (~100 ms round trip here)."""
        import jax
        from tpukzg.poly.poly import barycentric_eval

        def stage_eval(bytes_u8, z_mont):
            mont, ok = self._stage_body(bytes_u8)
            y = barycentric_eval(self.kzg.plan, mont, z_mont)
            return FR._from_mont(y), ok

        return jax.jit(stage_eval)

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
        z_mont = np.asarray(FR.to_mont(FR.from_int(zs))).reshape(k, 16)
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
        the device compute of batch i (the r4 profile: upload 0.88s of a
        2.9s rep at k=256):

            r1 = bk.verify_blob_kzg_proof_batch_async(*batch1)
            r2 = bk.verify_blob_kzg_proof_batch_async(*batch2)
            ok1, ok2 = r1(), r2()

        The sync entry point is resolve-immediately; results are
        identical (same programs, same order) — pipelining only changes
        when the host blocks.
        """
        k = len(blobs)
        assert k == len(commitment_bytes_list) == len(proof_bytes_list)
        if k == 0:
            return lambda: True
        for b in blobs:
            if len(b) != self.bytes_per_blob:
                return lambda: False
        try:
            # async: subgroup-check verdict stays on device until the end
            c_pts, pi_pts, ok_sub = self._decompress_g1_two_async(
                commitment_bytes_list, proof_bytes_list)
        except ValueError:          # malformed encoding (host-side reject)
            return lambda: False

        # host Fiat-Shamir z = H(blob, C) runs while the device works
        zs = [transcript.compute_challenge(blobs[i], commitment_bytes_list[i],
                                           self.n) for i in range(k)]
        z_can = np.asarray(FR.from_int(zs)).reshape(k, 16)

        if self._stage_eval is None:
            self._stage_eval = self._build_stage_eval()
        raw = np.stack([np.frombuffer(b, dtype=np.uint8).reshape(self.n, 32)
                        for b in blobs])
        y_dev, ok_range = self._stage_eval(raw, np.asarray(FR.to_mont(z_can)))

        def resolve() -> bool:
            y_can = np.asarray(y_dev)   # sync: y feeds the rho transcript
            ys = fr_ints_from_limbs(y_can)
            _, rho_powers = transcript.compute_r_powers(
                commitment_bytes_list, zs, ys, proof_bytes_list, self.n)
            rho_can = np.asarray(FR.from_int(rho_powers)).reshape(k, 16)
            from tpukzg.utils import checked
            checked.check_limbs("verify_batch.z", z_can)
            checked.check_limbs("verify_batch.y", y_can)
            checked.check_limbs("verify_batch.rho", rho_can)
            ok = self.kzg.verify_batch(c_pts, z_can, y_can, pi_pts, rho_can)
            # single sync point folds all three device verdicts
            return bool(np.asarray(ok)
                        & np.all(np.asarray(ok_sub))
                        & np.asarray(ok_range))

        return resolve

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
