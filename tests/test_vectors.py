"""Frozen known-answer tests (SURVEY.md component 29).

kat.json was generated once from the golden model
(tests/vectors/generate.py) and is now FROZEN: these tests pin the
device library to absolute byte-level answers, independent of any later
golden-model edits.  A c-kzg-4844 YAML fixture loader is provided so the
real Ethereum vectors drop in verbatim when available offline.
"""

import json
import os

import pytest

VEC = os.path.join(os.path.dirname(__file__), "vectors", "kat.json")


@pytest.fixture(scope="module")
def kat():
    with open(VEC) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def ts(kat):
    # committed .srs_cache npz via conftest TPUKZG_CACHE_DIR (fast load)
    import tpukzg
    return tpukzg.generate_insecure_setup(int(kat["kzg"]["tau"], 16),
                                          kat["kzg"]["n"])


def test_g1_multiples_kat(kat):
    from tpukzg.field.mont import FR
    from tpukzg.curve import g1 as g1m
    from tpukzg.curve.g1 import G1
    import numpy as np
    ks = [int(k) for k in kat["g1_multiples"]]
    pts = G1.scalar_mul(G1.gen((len(ks),)), np.asarray(FR.from_int(ks)))
    for i, k in enumerate(ks):
        got = g1m.compress_point(tuple(np.asarray(c)[i] for c in pts))
        assert got.hex() == kat["g1_multiples"][str(k)]


def test_ntt_kat(kat):
    import numpy as np
    from tpukzg.field.mont import FR
    from tpukzg.ntt.ntt import get_plan
    n = kat["ntt"]["n"]
    coeffs = [int(c, 16) for c in kat["ntt"]["coeffs"]]
    plan = get_plan(n)
    out = np.asarray(FR.from_mont(plan.ntt(
        np.asarray(FR.to_mont(FR.from_int(coeffs))))))
    got = [FR.to_int(r) for r in out]
    assert got == [int(v, 16) for v in kat["ntt"]["evals"]]


def test_kzg_blob_kat(kat, ts):
    import tpukzg
    blob = bytes.fromhex(kat["kzg"]["blob"])
    c = tpukzg.blob_to_kzg_commitment(blob, ts)
    assert c.hex() == kat["kzg"]["commitment"]
    pf = tpukzg.compute_blob_kzg_proof(blob, c, ts)
    assert pf.hex() == kat["kzg"]["proof"]
    assert tpukzg.verify_blob_kzg_proof(blob, c, pf, ts) == kat["kzg"]["verify"]


def test_kzg_open_kat(kat, ts):
    import tpukzg
    blob = bytes.fromhex(kat["kzg"]["blob"])
    for key in ("kzg_open", "kzg_open_in_domain"):
        z = int(kat[key]["z"], 16).to_bytes(32, "big")
        pf, y = tpukzg.compute_kzg_proof(blob, z, ts)
        assert pf.hex() == kat[key]["proof"], key
        assert int.from_bytes(y, "big") == int(kat[key]["y"], 16), key


# ---------------------------------------------------------------------------
# c-kzg-4844 YAML fixture loader (vectors not shippable offline; loader
# tested against a synthetic fixture in the same format)
# ---------------------------------------------------------------------------


def load_ckzg_yaml_case(text: str) -> dict:
    """Minimal parser for c-kzg-4844's verify_blob_kzg_proof_batch YAML
    shape (input: {blobs: [...], commitments: [...], proofs: [...]},
    output: bool|null) without a yaml dependency."""
    import re
    case = {"blobs": [], "commitments": [], "proofs": [], "output": None}
    section = None
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("blobs:"):
            section = "blobs"; continue
        if s.startswith("commitments:"):
            section = "commitments"; continue
        if s.startswith("proofs:"):
            section = "proofs"; continue
        if s.startswith("output:"):
            v = s.split(":", 1)[1].strip()
            case["output"] = None if v in ("null", "~", "") else v == "true"
            section = None; continue
        m = re.match(r"- +\"?(0x[0-9a-fA-F]+)\"?", s)
        if m and section:
            case[section].append(bytes.fromhex(m.group(1)[2:]))
    return case


def test_ckzg_yaml_loader_roundtrip(kat):
    text = """
input:
  blobs:
    - "0x{blob}"
  commitments:
    - "0x{c}"
  proofs:
    - "0x{p}"
output: true
""".format(blob=kat["kzg"]["blob"], c=kat["kzg"]["commitment"],
           p=kat["kzg"]["proof"])
    case = load_ckzg_yaml_case(text)
    assert case["output"] is True
    assert case["blobs"][0].hex() == kat["kzg"]["blob"]
    assert case["commitments"][0].hex() == kat["kzg"]["commitment"]
    assert case["proofs"][0].hex() == kat["kzg"]["proof"]
