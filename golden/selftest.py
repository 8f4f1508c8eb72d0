"""Golden model self-test. Run: python -m golden.selftest [--fast]

Validates every golden-model subsystem from first principles; also verifies
the final-exponentiation hard-part chain identity used by the accelerated
implementation:  3*(p^4-p^2+1)/r == (x-1)^2 * (x+p) * (x^2+p^2-1) + 3.
"""

import random
import sys
import time

from golden.model import *  # noqa: F401,F403
from golden import model as m


def check(name, cond):
    t = time.time() - T0
    status = "ok" if cond else "FAIL"
    print(f"[{t:7.2f}s] {status:4s}  {name}")
    if not cond:
        FAILURES.append(name)


FAILURES = []
T0 = time.time()
rng = random.Random(0x5EED)


def main():
    fast = "--fast" in sys.argv

    # --- exponent identities the accelerated impl will rely on ---
    p, r, x = m.P, m.R, m.X_BLS
    check("r = x^4 - x^2 + 1", r == x**4 - x**2 + 1)
    check("p = (x-1)^2 r /3 + x", p == (x - 1) ** 2 * r // 3 + x)
    check("(p^12-1) % r == 0", (p**12 - 1) % r == 0)
    h = (p**4 - p**2 + 1) // r
    check("(p^4-p^2+1) % r == 0", (p**4 - p**2 + 1) % r == 0)
    check("hard-part chain identity",
          3 * h == (x - 1) ** 2 * (x + p) * (x**2 + p**2 - 1) + 3)
    check("FINAL_EXP_E == (p^6-1)(p^2+1)*3h",
          m.FINAL_EXP_E == (p**6 - 1) * (p**2 + 1) * 3 * h)
    w = m.fr_omega(1 << 32)
    check("omega32 order", pow(w, 1 << 31, r) == r - 1 and pow(w, 1 << 32, r) == 1)

    # --- fields ---
    a = m.Fp2(rng.randrange(p), rng.randrange(p))
    check("Fp2 inv", (a * a.inv()) == m.Fp2.one())
    b6 = m.Fp6(a, a * a, a + a)
    check("Fp6 inv", (b6 * b6.inv()) == m.Fp6.one())
    c12 = m.Fp12(b6, b6 * b6)
    check("Fp12 inv", (c12 * c12.inv()) == m.Fp12.one())
    check("Fp12 w^2 = v",
          (m.W12 * m.W12) == m.Fp12(m.Fp6.zero().__class__(m.Fp2.zero(), m.Fp2.one(), m.Fp2.zero()), m.Fp6.zero()))
    check("Fp2 sqrt", (lambda s: s is not None and s.sqr() == a.sqr())(a.sqr().sqrt()))

    # --- curves ---
    check("G1 gen on curve", m.g1_is_on_curve(m.G1_GEN))
    check("G2 gen on curve", m.g2_is_on_curve(m.G2_GEN))
    check("G1 gen in subgroup", m.g1_affine(m.g1_mul(m.G1_GEN, r)) is None)
    check("G2 gen in subgroup", m.g2_affine(m.g2_mul(m.G2_GEN, r)) is None)
    k1, k2 = rng.randrange(r), rng.randrange(r)
    pk = m.g1_mul(m.G1_GEN, k1)
    check("G1 add/double consistency",
          m.g1_eq(m.g1_add(pk, pk), m.g1_double(pk)))
    check("G1 distributive",
          m.g1_eq(m.g1_add(m.g1_mul(m.G1_GEN, k1), m.g1_mul(m.G1_GEN, k2)),
                  m.g1_mul(m.G1_GEN, (k1 + k2) % r)))
    check("G1 P + (-P) = inf",
          m.g1_affine(m.g1_add(pk, m.g1_neg(pk))) is None)
    qk = m.g2_mul(m.G2_GEN, k2)
    check("G2 distributive",
          m.g2_eq(m.g2_add(m.g2_mul(m.G2_GEN, k1), qk),
                  m.g2_mul(m.G2_GEN, (k1 + k2) % r)))

    # --- serialization ---
    check("G1 compress roundtrip",
          m.g1_eq(m.g1_decompress(m.g1_compress(pk)), pk))
    check("G1 inf roundtrip",
          m.g1_affine(m.g1_decompress(m.g1_compress(m.G1_INF))) is None)
    check("G2 compress roundtrip",
          m.g2_eq(m.g2_decompress(m.g2_compress(qk)), qk))
    bad = bytearray(m.g1_compress(pk))
    bad[1] ^= 1
    try:
        m.g1_decompress(bytes(bad))
        ok = True  # might still be a valid x; flip more
    except ValueError:
        ok = True
    check("G1 decompress invalid handled", ok)

    # --- pairing ---
    t = time.time()
    e1 = m.pairing(m.g1_mul(m.G1_GEN, 3), m.g2_mul(m.G2_GEN, 5))
    e2 = m.pairing(m.G1_GEN, m.G2_GEN).pow(15)
    check("bilinearity e([3]P,[5]Q)=e(P,Q)^15", e1 == e2)
    print(f"          (two pairings took {time.time()-t:.2f}s)")
    check("pairing in mu_r", e2.pow(r) == m.Fp12.one())
    check("pairing nondegenerate", e2 != m.Fp12.one())
    check("pairing_check [P,Q],[-P,Q]",
          m.pairing_check([(m.G1_GEN, m.G2_GEN), (m.g1_neg(m.G1_GEN), m.G2_GEN)]))

    # --- NTT / polynomial ---
    n = 8 if fast else 32
    coeffs = [rng.randrange(r) for _ in range(n)]
    evals = m.ntt(coeffs)
    wn = m.fr_omega(n)
    check("NTT matches poly_eval",
          all(evals[i] == m.poly_eval(coeffs, pow(wn, i, r)) for i in range(n)))
    check("iNTT roundtrip", m.intt(evals) == [c % r for c in coeffs])
    z = rng.randrange(r)
    check("barycentric == coeff eval",
          m.barycentric_eval(evals, z) == m.poly_eval(coeffs, z))
    check("barycentric in-domain",
          m.barycentric_eval(evals, pow(wn, 3, r)) == evals[3])
    # quotient check: q(X) * (X - z) == p(X) - y on all domain points plus random
    y = m.poly_eval(coeffs, z)
    q = m.eval_form_quotient(evals, z, y)
    qc = m.intt(q)
    zz = rng.randrange(r)
    check("quotient out-of-domain",
          (m.poly_eval(qc, zz) * ((zz - z) % r)) % r == (m.poly_eval(coeffs, zz) - y) % r)
    zi = pow(wn, 5, r)  # in-domain opening
    yi = evals[5]
    qi = m.eval_form_quotient(evals, zi, yi)
    qic = m.intt(qi)
    check("quotient in-domain",
          (m.poly_eval(qic, zz) * ((zz - zi) % r)) % r == (m.poly_eval(coeffs, zz) - yi) % r)

    # --- KZG end-to-end ---
    n = 8 if fast else 16
    setup = m.GoldenSetup(tau=0xDEADBEEF0BADF00D, n=n)
    check("lagrange SRS consistent with monomial commit",
          m.g1_eq(m.commit_lagrange(setup, m.ntt(coeffs[:n])),
                  m.commit_coeff(setup, coeffs[:n])))
    evs = m.ntt(coeffs[:n])
    C = m.commit_lagrange(setup, evs)
    z = rng.randrange(r)
    pi, y = m.compute_proof(setup, evs, z)
    check("KZG verify", m.verify(setup, C, z, y, pi))
    check("KZG verify rejects wrong y", not m.verify(setup, C, z, (y + 1) % r, pi))
    check("KZG verify rejects wrong proof",
          not m.verify(setup, C, z, y, m.g1_add(pi, m.G1_GEN)))
    zi = setup.roots[3]
    pi2, y2 = m.compute_proof(setup, evs, zi)
    check("KZG verify in-domain", y2 == evs[3] and m.verify(setup, C, zi, y2, pi2))

    # --- batch verify ---
    k = 3
    blobs, Cs, pis, zs, ys = [], [], [], [], []
    for i in range(k):
        ev = [rng.randrange(r) for _ in range(n)]
        blobs.append(ev)
        Ci = m.commit_lagrange(setup, ev)
        zi = rng.randrange(r)
        pii, yi = m.compute_proof(setup, ev, zi)
        Cs.append(Ci); pis.append(pii); zs.append(zi); ys.append(yi)
    rho = rng.randrange(r)
    check("batch verify", m.verify_batch(setup, Cs, zs, ys, pis, rho))
    bad_pis = list(pis); bad_pis[1] = m.g1_add(pis[1], m.G1_GEN)
    check("batch verify rejects one bad proof",
          not m.verify_batch(setup, Cs, zs, ys, bad_pis, rho))
    swap = [pis[1], pis[0], pis[2]]
    check("batch verify rejects swapped proofs",
          not m.verify_batch(setup, Cs, zs, ys, swap, rho))

    # --- blob API roundtrip ---
    blob = [rng.randrange(r) for _ in range(n)]
    Cb = m.blob_to_kzg_commitment(setup, blob)
    cb = m.g1_compress(Cb)
    prf, yb = m.compute_blob_kzg_proof(setup, blob, cb)
    pb = m.g1_compress(prf)
    check("verify_blob_kzg_proof", m.verify_blob_kzg_proof(setup, blob, cb, pb))
    blob2 = list(blob); blob2[0] = (blob2[0] + 1) % r
    check("verify_blob rejects tampered blob",
          not m.verify_blob_kzg_proof(setup, blob2, cb, pb))
    # batch of 2 blobs
    blobs2 = [blob, [rng.randrange(r) for _ in range(n)]]
    cbs, pbs = [], []
    for bl in blobs2:
        Ci = m.blob_to_kzg_commitment(setup, bl)
        ci = m.g1_compress(Ci)
        pri, _ = m.compute_blob_kzg_proof(setup, bl, ci)
        cbs.append(ci); pbs.append(m.g1_compress(pri))
    check("verify_blob_kzg_proof_batch",
          m.verify_blob_kzg_proof_batch(setup, blobs2, cbs, pbs))
    pbs_bad = [pbs[1], pbs[0]]
    check("blob batch rejects swapped proofs",
          not m.verify_blob_kzg_proof_batch(setup, blobs2, cbs, pbs_bad))

    print()
    if FAILURES:
        print(f"{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    print(f"ALL OK in {time.time()-T0:.1f}s")


if __name__ == "__main__":
    main()
