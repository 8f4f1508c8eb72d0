"""Protocol-layer differential + negative tests (SURVEY.md comp. 17-21).

Small degree (n=8) keeps CPU compile time sane; the formulas are
degree-independent.  Every positive test has a mutation twin (SURVEY.md
section 4.4).
"""

import numpy as np
import pytest

import golden.model as gold
import tpukzg

N = 8
TAU = 0xDEADBEEF


@pytest.fixture(scope="module")
def ts():
    # loads the committed .srs_cache npz (conftest TPUKZG_CACHE_DIR);
    # the generate+save path is covered by test_setup_save_load_roundtrip
    return tpukzg.generate_insecure_setup(TAU, N)


@pytest.fixture(scope="module")
def gs():
    return gold.GoldenSetup(TAU, N)


@pytest.fixture(scope="module")
def case(ts, gs, rng):
    blobs = [b"".join(rng.randrange(gold.R).to_bytes(32, "big")
                      for _ in range(N)) for _ in range(3)]
    cs = [tpukzg.blob_to_kzg_commitment(b, ts) for b in blobs]
    pfs = [tpukzg.compute_blob_kzg_proof(b, c, ts)
           for b, c in zip(blobs, cs)]
    return blobs, cs, pfs


def test_commitment_matches_golden(case, gs):
    blobs, cs, _ = case
    for b, c in zip(blobs, cs):
        expect = gold.g1_compress(
            gold.blob_to_kzg_commitment(gs, gold.blob_from_bytes(b)))
        assert c == expect


def test_proof_matches_golden(case, gs):
    blobs, cs, pfs = case
    for b, c, pf in zip(blobs, cs, pfs):
        expect = gold.g1_compress(
            gold.compute_blob_kzg_proof(gs, gold.blob_from_bytes(b), c)[0])
        assert pf == expect


def test_single_and_batch_verify(case, ts):
    blobs, cs, pfs = case
    assert tpukzg.verify_blob_kzg_proof(blobs[0], cs[0], pfs[0], ts)
    assert tpukzg.verify_blob_kzg_proof_batch(blobs, cs, pfs, ts)


def test_batch_rejects_mutations(case, ts):
    blobs, cs, pfs = case
    swapped = [pfs[1], pfs[0], pfs[2]]
    assert not tpukzg.verify_blob_kzg_proof_batch(blobs, cs, swapped, ts)
    bad = bytearray(pfs[1]); bad[5] ^= 1
    try:
        ok = tpukzg.verify_blob_kzg_proof_batch(
            blobs, cs, [pfs[0], bytes(bad), pfs[2]], ts)
    except ValueError:
        ok = False
    assert not ok


def test_compute_verify_kzg_proof_explicit_z(case, ts, gs):
    blobs, cs, _ = case
    z = (12345).to_bytes(32, "big")
    pf, y = tpukzg.compute_kzg_proof(blobs[0], z, ts)
    gpf, gy = gold.compute_kzg_proof(gs, gold.blob_from_bytes(blobs[0]), 12345)
    assert pf == gold.g1_compress(gpf)
    assert int.from_bytes(y, "big") == gy
    assert tpukzg.verify_kzg_proof(cs[0], z, y, pf, ts)
    yy = bytearray(y); yy[31] ^= 1
    assert not tpukzg.verify_kzg_proof(cs[0], z, bytes(yy), pf, ts)


def test_in_domain_opening(case, ts, gs):
    """z = omega^m exercises the special quotient branch (SURVEY.md 0.2)."""
    blobs, cs, _ = case
    zm = gs.roots[3]
    zb = zm.to_bytes(32, "big")
    pf, y = tpukzg.compute_kzg_proof(blobs[0], zb, ts)
    gpf, gy = gold.compute_kzg_proof(gs, gold.blob_from_bytes(blobs[0]), zm)
    assert pf == gold.g1_compress(gpf) and int.from_bytes(y, "big") == gy
    assert tpukzg.verify_kzg_proof(cs[0], zb, y, pf, ts)


def test_input_validation(ts):
    with pytest.raises(ValueError):
        tpukzg.blob_to_kzg_commitment(b"\xff" * (32 * N), ts)  # >= r
    with pytest.raises(ValueError):
        tpukzg.verify_kzg_proof(b"\x00" * 48, b"\x00" * 32, b"\x00" * 32,
                                b"\xc0" + b"\x00" * 47, ts)  # bad flags
    assert tpukzg.verify_blob_kzg_proof_batch([], [], [], ts) is True


def test_setup_save_load_roundtrip(ts, tmp_path):
    from tpukzg.kzg.setup import Setup
    path = str(tmp_path / "srs.npz")
    ts.setup.save(path)
    s2 = Setup.load(path)
    assert s2.n == ts.setup.n
    for a, b in zip(s2.lagrange_g1, ts.setup.lagrange_g1):
        assert np.array_equal(a, b)
    for a, b in zip(s2.g2_tau, ts.setup.g2_tau):
        assert np.array_equal(a, b)


def test_batched_prove_matches_single(case, ts):
    """blob_to_kzg_commitment_batch / compute_blob_kzg_proof_batch (one
    shared-points MSM program) must be byte-identical to the per-blob
    path."""
    blobs, cs, pfs = case
    assert tpukzg.blob_to_kzg_commitment_batch(blobs, ts) == cs
    assert tpukzg.compute_blob_kzg_proof_batch(blobs, cs, ts) == pfs
    assert tpukzg.blob_to_kzg_commitment_batch([], ts) == []
    # batch of one
    assert tpukzg.blob_to_kzg_commitment_batch(blobs[:1], ts) == cs[:1]
    assert tpukzg.compute_blob_kzg_proof_batch(blobs[:1], cs[:1], ts) == pfs[:1]


def test_coeff_form_paths(case, ts, rng):
    """commit_coeff(monomial SRS) and open_coeff must agree with the
    evaluation-form paths through interpolate/to_evals."""
    import numpy as np
    from tpukzg.field.mont import FR
    from tpukzg.kzg.blob import blob_to_limbs
    from tpukzg.curve import g1 as g1m

    blobs, cs, _ = case
    kzg = ts.kzg
    evals = np.asarray(FR.to_mont(blob_to_limbs(blobs[0], N)[ts.blob._brp]))
    coeffs = kzg.interpolate(evals)
    c_coeff = g1m.compress_point(kzg.commit_coeff(coeffs))
    assert c_coeff == cs[0]
    z = np.asarray(FR.to_mont(FR.from_int(rng.randrange(gold.R))))
    pi_e, y_e = kzg.open(evals, z)
    pi_c, y_c = kzg.open_coeff(coeffs, z)
    assert g1m.compress_point(pi_c) == g1m.compress_point(pi_e)
    assert np.asarray(y_c).tolist() == np.asarray(y_e).tolist()


def test_from_compressed_validates_g2(ts, gs):
    """Setup.from_compressed must reject a non-subgroup [tau]_2
    (SURVEY comp. 7 / VERDICT r1 item 7)."""
    from tpukzg.curve import g1 as g1m, g2 as g2m
    from tpukzg.kzg.setup import Setup

    mono_b = [g1m.compress_point(tuple(np.asarray(c)[i]
                                       for c in ts.setup.monomial_g1))
              for i in range(ts.n)]
    lag_b = [g1m.compress_point(tuple(np.asarray(c)[i]
                                      for c in ts.setup.lagrange_g1))
             for i in range(ts.n)]
    tau_b = g2m.compress_point(ts.setup.g2_tau)

    # valid SRS loads (and validates) fine
    s2 = Setup.from_compressed(mono_b, lag_b, tau_b)
    assert s2.n == ts.n

    # non-subgroup on-curve G2 point must be rejected
    v = 5
    while True:
        v += 1
        c0 = (v * v * v - 3 * v + 4) % gold.P
        c1 = (3 * v * v - 1 + 4) % gold.P
        y = g2m._fp2_sqrt_ints(c0, c1)
        if y is None:
            continue
        if not g2m.in_subgroup_host(v, 1, y[0], y[1]):
            bad = g2m.compress(v, 1, y[0], y[1], False)
            break
    with pytest.raises(ValueError):
        Setup.from_compressed(mono_b, lag_b, bad)
