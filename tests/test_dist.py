"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md section 4.5).

Sharded paths must be EXACTLY equal to their single-device twins — the
collectives (ppermute EC butterfly, all_to_all NTT transpose) must not
change a single limb.
"""

import numpy as np
import pytest
import jax

import golden.model as gold
from tpukzg.field.mont import FR
from tpukzg.curve import g1 as g1m
from tpukzg.curve.g1 import G1
from tpukzg.dist import MeshConfig, ShardedMsm, DistNtt, ShardedBatchVerifier

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual CPU devices")


@pytest.fixture(scope="module")
def msm_case(rng):
    n = 32
    ks = [rng.randrange(gold.R) for _ in range(n)]
    gpts = [gold.g1_mul(gold.G1_GEN, rng.randrange(gold.R)) for _ in range(n)]
    affs = [gold.g1_affine(p) for p in gpts]
    pts = g1m.points_from_ints([a[0] for a in affs], [a[1] for a in affs],
                               [False] * n)
    scal = np.asarray(FR.from_int(ks))
    expect = gold.g1_affine(gold.g1_msm(gpts, ks))
    return pts, scal, expect


def test_sharded_msm_exact(msm_case):
    pts, scal, expect = msm_case
    sm = ShardedMsm(G1, MeshConfig(n_devices=8))
    x, y, inf = g1m.point_to_ints(sm.msm(pts, scal, c=4))
    assert not bool(inf) and (x, y) == expect


def test_dist_ntt_exact(rng):
    n = 64
    coeffs = [rng.randrange(gold.R) for _ in range(n)]
    expect = gold.ntt(coeffs)
    dn = DistNtt(n, MeshConfig(n_devices=8))
    vec = np.asarray(FR.to_mont(FR.from_int(coeffs)))
    out = np.asarray(FR.from_mont(dn.ntt(vec)))
    assert [FR.to_int(r) for r in out] == expect
    back = np.asarray(FR.from_mont(dn.intt(
        np.asarray(FR.to_mont(FR.from_int(expect))))))
    assert [FR.to_int(r) for r in back] == coeffs


def test_dryrun_multichip_entry():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
