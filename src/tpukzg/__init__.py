"""tpukzg — TPU-native KZG polynomial commitments with batch verification.

A from-scratch JAX/XLA/Pallas implementation of the KZG scheme over
BLS12-381 (the capability surface of KoonMing/KZG-Batch-Verification-Scheme;
the reference repo contains only a LICENSE — see SURVEY.md section 0).

Layers (SURVEY.md section 1):
  field -> curve -> {msm, ntt, pairing} -> poly -> kzg -> dist -> api/cli
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazily expose the c-kzg-4844-shaped public API (SURVEY.md comp. 26)
    without importing JAX-heavy modules at package import time."""
    if name.startswith("_"):
        raise AttributeError(name)
    import importlib

    api = importlib.import_module("tpukzg.api")
    return getattr(api, name)
