"""Generate frozen KATs from the golden model (SURVEY.md component 29).

Run manually: python tests/vectors/generate.py
Writes kat.json next to itself. Vectors are FROZEN — regenerate only with
a documented reason; the point is independence from golden-model drift.
"""
import json, os, sys, random

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import golden.model as gold

out = {}

# curve constants / generator multiples
out["g1_multiples"] = {
    str(k): gold.g1_compress(gold.g1_mul(gold.G1_GEN, k)).hex()
    for k in [0, 1, 2, 3, 7, 0xDEADBEEF, gold.R - 1]}
out["g2_multiples"] = {
    str(k): gold.g2_compress(gold.g2_mul(gold.G2_GEN, k)).hex()
    for k in [0, 1, 2, 0xDEADBEEF]}

# NTT vectors (n=16)
rng = random.Random(0x4A7)
n = 16
coeffs = [rng.randrange(gold.R) for _ in range(n)]
out["ntt"] = {"n": n, "coeffs": [hex(c) for c in coeffs],
              "evals": [hex(v) for v in gold.ntt(coeffs)]}

# KZG tuples from insecure dev setup (tau fixed, n=16)
tau = 0xDEADBEEF
gs = gold.GoldenSetup(tau, n)
blob = [rng.randrange(gold.R) for _ in range(n)]
blob_bytes = gold.blob_to_bytes(blob)
c = gold.blob_to_kzg_commitment(gs, blob)
cb = gold.g1_compress(c)
pf, y = gold.compute_blob_kzg_proof(gs, blob, cb)
pfb = gold.g1_compress(pf)
z = gold.compute_challenge(blob, cb, n)
out["kzg"] = {
    "tau": hex(tau), "n": n,
    "blob": blob_bytes.hex(),
    "commitment": cb.hex(),
    "proof": pfb.hex(),
    "challenge_z": hex(z),
    "eval_y": hex(y),
    "verify": gold.verify_blob_kzg_proof(gs, blob, cb, pfb),
}
# an out-of-domain explicit opening
z2 = 12345
pf2, y2 = gold.compute_kzg_proof(gs, blob, z2)
out["kzg_open"] = {"z": hex(z2), "y": hex(y2),
                   "proof": gold.g1_compress(pf2).hex()}
# in-domain opening
zm = gs.roots[5]
pf3, y3 = gold.compute_kzg_proof(gs, blob, zm)
out["kzg_open_in_domain"] = {"z": hex(zm), "y": hex(y3),
                             "proof": gold.g1_compress(pf3).hex()}

path = os.path.join(os.path.dirname(__file__), "kat.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
