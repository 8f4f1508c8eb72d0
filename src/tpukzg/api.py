"""Public API — c-kzg-4844-shaped module-level surface (SURVEY.md comp. 26).

Mirrors the function names of c-kzg-4844's Python binding so a user of any
canonical KZG library finds the same verbs here, bound to the TPU engine:

    setup = tpukzg.load_trusted_setup(...)      # or generate_insecure_setup
    c   = tpukzg.blob_to_kzg_commitment(blob, setup)
    pf  = tpukzg.compute_blob_kzg_proof(blob, c, setup)
    ok  = tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, setup)

`setup` objects carry their jitted engines; the module functions are thin
dispatchers.  (The reference repo has no API to mirror — SURVEY.md §0 — so
c-kzg-4844 is the ecosystem-standard shape, per SURVEY.md component 26.)
"""

from __future__ import annotations

from tpukzg.kzg.setup import Setup as _Setup
from tpukzg.kzg.core import Kzg as _Kzg
from tpukzg.kzg.blob import BlobKzg as _BlobKzg


class TrustedSetup:
    """User-facing handle: SRS + jitted KZG + blob engines."""

    def __init__(self, setup: _Setup):
        self.setup = setup
        self.kzg = _Kzg(setup)
        self.blob = _BlobKzg(self.kzg)
        self.n = setup.n
        self.bytes_per_blob = self.blob.bytes_per_blob


def generate_insecure_setup(tau: int, n: int) -> TrustedSetup:
    """Dev/test SRS from explicit tau — INSECURE by construction."""
    return TrustedSetup(_Setup.generate_insecure(tau, n))


def load_trusted_setup(g1_monomial_bytes, g1_lagrange_bytes,
                       g2_tau_bytes) -> TrustedSetup:
    """Production loader from serialized SRS points (c-kzg shape)."""
    return TrustedSetup(_Setup.from_compressed(
        g1_monomial_bytes, g1_lagrange_bytes, g2_tau_bytes))


def load_setup_file(path: str) -> TrustedSetup:
    """Load a cached .npz SRS (Setup.save format)."""
    return TrustedSetup(_Setup.load(path))


def blob_to_kzg_commitment(blob: bytes, ts: TrustedSetup) -> bytes:
    return ts.blob.blob_to_kzg_commitment(blob)


def compute_kzg_proof(blob: bytes, z_bytes: bytes, ts: TrustedSetup):
    return ts.blob.compute_kzg_proof(blob, z_bytes)


def compute_blob_kzg_proof(blob: bytes, commitment_bytes: bytes,
                           ts: TrustedSetup) -> bytes:
    return ts.blob.compute_blob_kzg_proof(blob, commitment_bytes)


def blob_to_kzg_commitment_batch(blobs, ts: TrustedSetup) -> list[bytes]:
    """Commit k blobs in one batched MSM program (TPU-native extension)."""
    return ts.blob.blob_to_kzg_commitment_batch(blobs)


def compute_blob_kzg_proof_batch(blobs, commitment_bytes_list,
                                 ts: TrustedSetup) -> list[bytes]:
    """Prove k blobs in one batched open program (TPU-native extension)."""
    return ts.blob.compute_blob_kzg_proof_batch(blobs, commitment_bytes_list)


def verify_kzg_proof(commitment_bytes: bytes, z_bytes: bytes, y_bytes: bytes,
                     proof_bytes: bytes, ts: TrustedSetup) -> bool:
    return ts.blob.verify_kzg_proof(commitment_bytes, z_bytes, y_bytes,
                                    proof_bytes)


def verify_blob_kzg_proof(blob: bytes, commitment_bytes: bytes,
                          proof_bytes: bytes, ts: TrustedSetup) -> bool:
    return ts.blob.verify_blob_kzg_proof(blob, commitment_bytes, proof_bytes)


def verify_blob_kzg_proof_batch(blobs, commitment_bytes_list,
                                proof_bytes_list, ts: TrustedSetup) -> bool:
    return ts.blob.verify_blob_kzg_proof_batch(
        blobs, commitment_bytes_list, proof_bytes_list)


def verify_blob_kzg_proof_batch_async(blobs, commitment_bytes_list,
                                      proof_bytes_list, ts: TrustedSetup):
    """Dispatch the upload-bound front half now; returns resolve()->bool.
    Lets a serving loop overlap batch i+1's blob upload with batch i's
    device compute (TPU-native extension; see BlobKzg docstring)."""
    return ts.blob.verify_blob_kzg_proof_batch_async(
        blobs, commitment_bytes_list, proof_bytes_list)


def verify_blob_kzg_proof_batch_pipeline(blobs, commitment_bytes_list,
                                         proof_bytes_list, ts: TrustedSetup):
    """3-stage pipelined verify: returns a pending object with
    .stage2() (y sync + verify dispatch, non-blocking) and
    .result() -> bool.  Lets a serving loop keep the device queue full
    across batches (see BlobKzg.verify_blob_kzg_proof_batch_pipeline)."""
    return ts.blob.verify_blob_kzg_proof_batch_pipeline(
        blobs, commitment_bytes_list, proof_bytes_list)


def verify_blob_kzg_proof_batch_chunked(blobs, commitment_bytes_list,
                                        proof_bytes_list, ts: TrustedSetup,
                                        chunk: int = 64,
                                        retries: int = 1) -> bool:
    return ts.blob.verify_blob_kzg_proof_batch_chunked(
        blobs, commitment_bytes_list, proof_bytes_list,
        chunk=chunk, retries=retries)
