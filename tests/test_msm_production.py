"""Production-shape MSM differential tests (VERDICT r4 #9 / r3 weak #5).

The generic MSM differentials (tests/test_msm.py) fix n=32; the shapes
the bench and the protocol actually run are (a) the n=4096 fixed-table
commit MSM and (b) the 3k+1-point grouped verify fold.  Both are checked
here against pure-bignum golden expectations that avoid any golden-side
4096-point MSM:

* commit: with the dev SRS built from a KNOWN tau, the commitment of an
  evaluation-form blob equals [p(tau)]G1, and p(tau) is one golden
  barycentric evaluation (golden/model.py:770).
* grouped fold: with proof/commitment points chosen as KNOWN generator
  multiples [a_i]G, the folded outputs must equal
  [sum rho^i a_i]G  and  [sum rho^i (b_i - y_i + z_i a_i)]G.
"""

import numpy as np
import pytest

import golden.model as gold
import tpukzg

TAU = 0xDEADBEEF
N = 4096


@pytest.fixture(scope="module")
def ts4096():
    # loads the committed .srs_cache npz (pure numpy, no device ladder)
    return tpukzg.generate_insecure_setup(TAU, N)


def test_commit_fixed_table_n4096_matches_golden(ts4096, rng):
    blob_ints = [rng.randrange(gold.R) for _ in range(N)]
    blob = b"".join(v.to_bytes(32, "big") for v in blob_ints)
    c = tpukzg.blob_to_kzg_commitment(blob, ts4096)
    # blob stores evaluations on the BIT-REVERSED domain; golden's
    # barycentric takes natural order (same convention as blob_from_bytes)
    natural = gold.bit_reversal_permutation(blob_ints)
    y_tau = gold.barycentric_eval(natural, TAU)
    expect = gold.g1_compress(gold.g1_mul(gold.G1_GEN, y_tau))
    assert c == expect


def test_grouped_verify_fold_k8_matches_golden(ts4096, rng):
    from tpukzg.field.mont import FR
    from tpukzg.curve.g1 import G1

    k = 8
    a = [rng.randrange(1, gold.R) for _ in range(k)]   # proof multiples
    b = [rng.randrange(1, gold.R) for _ in range(k)]   # commitment mult.
    zs = [rng.randrange(gold.R) for _ in range(k)]
    ys = [rng.randrange(gold.R) for _ in range(k)]
    rho = rng.randrange(2, gold.R)
    rhos = [pow(rho, i, gold.R) for i in range(k)]

    pi_pts = G1.scalar_mul(G1.gen((k,)), np.asarray(FR.from_int(a)))
    c_pts = G1.scalar_mul(G1.gen((k,)), np.asarray(FR.from_int(b)))
    z_can = np.asarray(FR.from_int(zs))
    y_can = np.asarray(FR.from_int(ys))
    rho_can = np.asarray(FR.from_int(rhos))

    pi_agg, lhs = ts4096.kzg._vb_msm(tuple(np.asarray(c) for c in c_pts),
                                     z_can, y_can,
                                     tuple(np.asarray(c) for c in pi_pts),
                                     rho_can)

    exp_pi = sum(r * ai for r, ai in zip(rhos, a)) % gold.R
    exp_lhs = sum(r * (bi - yi + zi * ai) % gold.R
                  for r, ai, bi, zi, yi in zip(rhos, a, b, zs, ys)) % gold.R

    for got_pt, exp_k in ((pi_agg, exp_pi), (lhs, exp_lhs)):
        xa, ya, inf = (np.asarray(v) for v in G1.normalize(got_pt))
        if exp_k == 0:
            assert bool(inf)
            continue
        ex, ey = gold.g1_affine(gold.g1_mul(gold.G1_GEN, exp_k))
        from tpukzg.field.mont import FP
        got_x = FP.to_int(np.asarray(FP.from_mont(xa)))
        got_y = FP.to_int(np.asarray(FP.from_mont(ya)))
        assert (got_x, got_y) == (ex, ey)
