"""Multi-limb Montgomery arithmetic for Fp/Fr in uint32 TPU lanes.

Design (SURVEY.md components 1-3; BASELINE.json:5 "multi-limb (u32 lanes)
Montgomery kernels"):

* A field element is an array of L little-endian 16-bit limbs stored in
  uint32, trailing axis: shape ``(..., L)``.  Fp: L=24 (R = 2^384),
  Fr: L=16 (R = 2^256).  16-bit limb values keep every partial product
  ``a_i * b_j < 2^32`` inside a native uint32 lane — no widening multiply
  exists on the TPU VPU, which is what forces the 16-bit split.
* Elements on the mul-heavy paths live in Montgomery form (x * R mod p);
  conversion happens only at public boundaries.
* Multiplication = schoolbook outer product with lo/hi 16-bit column
  accumulation (sums stay < 2^22, proven below), one `lax.scan` carry
  sweep, then an unrolled Montgomery REDC (L steps, static indices so
  XLA sees a flat fused graph), one final carry sweep and a conditional
  subtract.  ~O(L) XLA ops per step, no data-dependent control flow.
* Long repetitive structure (pow chains) uses `lax.fori_loop` over a
  precomputed bit table so the traced graph stays small.

Static overflow bounds (SURVEY.md section 5.2 "race detection" analogue —
the hazard class here is limb overflow, and every accumulator below is
bounded by construction):
  - column sums: <= 2L terms * (2^16-1) < 2^22           (uint32 ok)
  - REDC limbs:  initial < 2^16 plus <= L lo + L hi adds of < 2^16 each
                 plus one pushed carry < 2^22  =>  < 2^22.7 (uint32 ok)
  - carry sweeps: value + carry_in < 2^23                 (uint32 ok)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B = 16
MASK = (1 << B) - 1

# Frozen numeric constants (SURVEY.md section 2.1, verified in-session).
P_MOD = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R_MOD = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001


def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    return np.array([(x >> (B * i)) & MASK for i in range(n_limbs)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    out = 0
    for i, v in enumerate(np.asarray(limbs).tolist()):
        out |= int(v) << (B * i)
    return out


class FieldParams:
    """Static parameters of one prime field in the 16-bit-limb layout."""

    suffix_ndim = 1  # uniform field-ops interface (see field/tower.py)

    def __init__(self, name: str, modulus: int, n_limbs: int,
                 carry_impl: str | None = None):
        self.name = name
        self.modulus = modulus
        self.L = n_limbs
        if carry_impl is None:
            from tpukzg.utils.config import FieldConfig
            cfg = FieldConfig.from_env()
            carry_impl = cfg.carry_fp if name == "Fp" else cfg.carry_fr
        assert carry_impl in ("scan", "ks", "auto"), carry_impl
        # "auto" resolves LAZILY at first trace (see carry_impl property):
        # resolving the backend at import time would force jax backend
        # init before the application pins platforms.  Earned defaults
        # (bench/results.jsonl 2026-08-20, real v5e, k=256/n=4096):
        # Fp Kogge-Stone on TPU (vb_pair 0.793s -> 0.137s, decompress
        # 0.078 -> 0.054); Fr stays scan everywhere (KS regressed the
        # wide barycentric 3x); everything scan on CPU (compile-lean).
        self._carry_impl = carry_impl
        self.R = 1 << (B * n_limbs)
        assert self.R > modulus > 0
        self.n_prime = (-pow(modulus, -1, 1 << B)) % (1 << B)
        # Full-precision mu = -p^-1 mod R for the separated Montgomery
        # reduction (see _mul): m = (T mod R) * mu mod R; t = (T + m*p)/R.
        self.mu_limbs = int_to_limbs((-pow(modulus, -1, self.R)) % self.R, n_limbs)
        self.mod_limbs = int_to_limbs(modulus, n_limbs)
        self.one_mont = int_to_limbs(self.R % modulus, n_limbs)
        self.r2 = int_to_limbs((self.R * self.R) % modulus, n_limbs)
        self.zero = np.zeros(n_limbs, dtype=np.uint32)
        self.one_raw = int_to_limbs(1, n_limbs)
        # Uniform field-ops aliases (tower classes use one_np/zero_np).
        self.one_np = self.one_mont
        self.zero_np = self.zero
        # Bit tables (LSB-first) for fixed-exponent pow chains.
        self.inv_exp_bits = self._bits(modulus - 2)
        # Per-instance jitted entry points: whole field ops compile once per
        # shape instead of dispatching ~400 eager XLA ops per call.
        self.add = jax.jit(self._add)
        self.sub = jax.jit(self._sub)
        self.neg = jax.jit(self._neg)
        self.double = jax.jit(self._double)
        self.mul = jax.jit(self._mul)
        self.sqr = jax.jit(self._sqr)
        self.inv = jax.jit(self._inv)
        self.batch_inv = jax.jit(self._batch_inv, static_argnames=("axis",))
        self.mul_small = jax.jit(self._mul_small, static_argnames=("k",))
        self.to_mont = jax.jit(self._to_mont)
        self.from_mont = jax.jit(self._from_mont)
        self.gt_half = jax.jit(self._gt_half)

    @property
    def carry_impl(self) -> str:
        v = self._carry_impl
        if v == "auto":
            try:
                import jax
                v = ("ks" if self.name == "Fp"
                     and jax.default_backend() != "cpu" else "scan")
            except Exception:
                v = "scan"
            self._carry_impl = v
        return v

    def _bits(self, e: int) -> np.ndarray:
        return np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=np.uint32)

    def __repr__(self):
        return f"FieldParams({self.name}, L={self.L})"

    # ---------------- host codecs ----------------

    def from_int(self, x) -> np.ndarray:
        """Python int or list of ints -> canonical limb array (host side)."""
        if isinstance(x, (list, tuple)):
            return np.stack([int_to_limbs(v % self.modulus, self.L) for v in x])
        return int_to_limbs(x % self.modulus, self.L)

    def to_mont_host(self, x) -> np.ndarray:
        """Python int or list of ints -> MONTGOMERY-form limb array,
        computed entirely host-side with bignum arithmetic.  Setup-time
        table builders (NttPlan roots/twiddles, SRS scalars) must use
        this instead of `to_mont(from_int(x))`: each jitted `to_mont`
        call is a device program dispatch, and ~30 of them during
        `Setup.load` cost ~4 minutes over the tunneled TPU
        (BENCH_r04.json "setup ready" at 240.6s; VERDICT r4 weak #7)."""
        m, R = self.modulus, self.R
        if isinstance(x, (list, tuple)):
            return np.stack([int_to_limbs((int(v) % m) * R % m, self.L)
                             for v in x])
        return int_to_limbs((int(x) % m) * R % m, self.L)

    def to_int(self, limbs):
        """Limb array -> python int or list of ints (host side)."""
        a = np.asarray(limbs)
        if a.ndim == 1:
            return limbs_to_int(a)
        flat = a.reshape(-1, self.L)
        out = [limbs_to_int(row) for row in flat]
        return np.array(out, dtype=object).reshape(a.shape[:-1]).tolist() if a.ndim > 2 else out

    # ---------------- carry / compare primitives ----------------
    #
    # Two bit-exact lowerings, selected by FieldConfig (TPUKZG_CARRY_FP /
    # TPUKZG_CARRY_FR env; utils/config.py):
    #   "scan" — lax.scan over the limb axis: ONE compile-lean HLO op,
    #            but 2L sequential micro-steps at runtime.  Right for
    #            wide compute-bound tensors (barycentric, NTT) and for
    #            CPU-backend compile time.
    #   "ks"   — Kogge-Stone generate/propagate prefix: ~log2(2L) wide
    #            rounds, ~8x shallower.  Right for the latency-bound
    #            narrow paths (pairing tower, decompress pow chains)
    #            where thousands of montmuls chain sequentially and the
    #            48-step scans dominate wall clock (VERDICT r4 profile:
    #            vb_pair 0.79s at batch size 2).
    # The KS algebra mirrors pallas/montmul.py _carry_resolve /
    # _sub_mod_lm (trailing-axis transposition of the proven kernel).

    @staticmethod
    def _shift_up(x, d):
        """out[..., i] = x[..., i-d] along the last axis (zero-fill)."""
        pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
        return jnp.pad(x, pad)[..., : x.shape[-1]]

    def _carry_sweep(self, x):
        """Canonicalize limbs to base 2^16. x: (..., N) uint32 with limb
        values < 2^23.  Returns (canonical, carry_out)."""
        if self.carry_impl == "ks":
            return self._carry_ks(x)
        xm = jnp.moveaxis(x, -1, 0)
        init = jnp.zeros(x.shape[:-1], jnp.uint32)

        def step(c, xi):
            t = xi + c
            return t >> B, t & MASK

        cout, ym = lax.scan(step, init, xm)
        return jnp.moveaxis(ym, 0, -1), cout

    def _carry_ks(self, x):
        """Kogge-Stone carry resolve (bit-exact twin of _carry_sweep for
        inputs < 2^23 per limb; see pallas/montmul._carry_resolve).
        carry_out is in {0, 1} — callers only use it when the value is
        bounded below 2^(16N+1) (true at every call site: sums of two
        canonical values or separated-REDC columns)."""
        n = x.shape[-1]
        s = (x & MASK) + self._shift_up(x >> B, 1)   # low2^16 + carries<2^7
        g = s >> B                                   # {0,1} ripple carries
        s = s & MASK
        p = (s == MASK).astype(jnp.uint32)
        G, P = g, p
        d = 1
        while d < n:
            G = G | (P * self._shift_up(G, d))
            P = P * self._shift_up(P, d)
            d <<= 1
        out = (s + self._shift_up(G, 1)) & MASK
        # top-limb high part: < 2^7 from x>>B plus the resolved {0,1}
        cout = (x[..., -1] >> B) + G[..., -1]
        return out, cout

    def _sub_sweep(self, a, b):
        """a - b over limbs; returns (diff mod 2^(16N), borrow_out in {0,1})."""
        if self.carry_impl == "ks":
            return self._sub_ks(a, b)
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        am = jnp.moveaxis(jnp.broadcast_to(a, shape), -1, 0)
        bm = jnp.moveaxis(jnp.broadcast_to(b, shape), -1, 0)
        init = jnp.zeros(shape[:-1], jnp.uint32)

        def step(borrow, ab):
            ai, bi = ab
            t = ai + (MASK + 1) - bi - borrow
            return 1 - (t >> B), t & MASK

        bout, ym = lax.scan(step, init, (am, bm))
        return jnp.moveaxis(ym, 0, -1), bout

    def _sub_ks(self, a, b):
        """Kogge-Stone borrow resolve (twin of pallas _sub_mod_lm)."""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        n = shape[-1]
        d0 = a + (MASK + 1) - b                      # no underflow in u32
        s = d0 & MASK
        g = 1 - (d0 >> B)                            # borrow generated at i
        p = (s == 0).astype(jnp.uint32)              # borrow propagates
        G, P = g, p
        d = 1
        while d < n:
            G = G | (P * self._shift_up(G, d))
            P = P * self._shift_up(P, d)
            d <<= 1
        bin_ = self._shift_up(G, 1)
        diff = (s + (MASK + 1) - bin_) & MASK
        return diff, G[..., -1]

    def _cond_sub_mod(self, limbs, carry):
        """Reduce a value in [0, 2p) given as (carry, limbs) to [0, p)."""
        diff, borrow = self._sub_sweep(limbs, jnp.asarray(self.mod_limbs))
        ge = (carry > 0) | (borrow == 0)
        return jnp.where(ge[..., None], diff, limbs)

    # ---------------- public field ops (all jit-safe, batched) ----------------

    def _add(self, a, b):
        s, c = self._carry_sweep(a + b)
        return self._cond_sub_mod(s, c)

    def _sub(self, a, b):
        d, borrow = self._sub_sweep(a, b)
        dp, _ = self._carry_sweep(d + jnp.asarray(self.mod_limbs))
        return jnp.where((borrow > 0)[..., None], dp, d)

    def _neg(self, a):
        return self._sub(jnp.zeros_like(a), a)

    def _double(self, a):
        return self._add(a, a)

    def _prod_cols(self, a, b, n_cols: int):
        """Column sums of the schoolbook product a*b, columns [0, n_cols).

        Products are split lo/hi BEFORE accumulation so every column sum
        stays < 2L * 2^16 < 2^22 (fits u32; see module docstring bounds).
        """
        L = self.L
        o = a[..., :, None] * b[..., None, :]  # (..., L, L), each < 2^32
        lo = o & MASK
        hi = o >> B
        bshape = o.shape[:-2]
        pad0 = [(0, 0)] * len(bshape)
        cols = jnp.zeros(bshape + (n_cols,), jnp.uint32)
        for i in range(L):
            if i < n_cols:
                w = min(L, n_cols - i)
                cols = cols + jnp.pad(lo[..., i, :w], pad0 + [(i, n_cols - i - w)])
            if i + 1 < n_cols:
                w = min(L, n_cols - i - 1)
                cols = cols + jnp.pad(hi[..., i, :w],
                                      pad0 + [(i + 1, n_cols - i - 1 - w)])
        return cols

    def _mul(self, a, b):
        """Montgomery product a * b * R^-1 mod p — separated reduction.

        No sequential per-limb REDC: with mu = -p^-1 mod R (precomputed,
        full precision),
            T = a*b                  (2L limbs)
            m = (T mod R) * mu mod R (L limbs, low half of one product)
            t = (T + m*p) / R        (exact division: low L limbs cancel)
        Three parallel limb convolutions + carry sweeps — a small, flat,
        XLA-friendly graph with no loop-carried dependency except the
        carry sweeps themselves.  t < 2p, so one conditional subtract.
        """
        L = self.L
        a = jnp.asarray(a, jnp.uint32)
        b = jnp.asarray(b, jnp.uint32)
        t_cols = self._prod_cols(a, b, 2 * L)
        t, _ = self._carry_sweep(t_cols)              # T canonical, < R^2
        m_cols = self._prod_cols(t[..., :L], jnp.asarray(self.mu_limbs), L)
        m, _ = self._carry_sweep(m_cols)              # m = T*mu mod R
        mp_cols = self._prod_cols(m, jnp.asarray(self.mod_limbs), 2 * L)
        s, carry = self._carry_sweep(t + mp_cols)     # T + m*p (cols < 2^23)
        return self._cond_sub_mod(s[..., L:], carry)

    def _sqr(self, a):
        return self._mul(a, a)

    def _mul_small(self, a, k: int):
        """a * k for a tiny static non-negative int k, via addition chain."""
        assert 0 <= k
        if k == 0:
            return jnp.zeros_like(a)
        result = None
        doubled = a
        kk = k
        while kk:
            if kk & 1:
                result = doubled if result is None else self._add(result, doubled)
            kk >>= 1
            if kk:
                doubled = self._add(doubled, doubled)
        return result

    def pow_bits(self, a, bits: np.ndarray):
        """a ** e where e's LSB-first bit table `bits` is a static constant.
        Runs as one fori_loop (MSB->LSB square-and-multiply with select)."""
        nb = len(bits)
        bits_arr = jnp.asarray(bits[::-1].copy())  # MSB-first
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)

        def body(i, acc):
            acc = self._mul(acc, acc)
            acc_m = self._mul(acc, a)
            return jnp.where(bits_arr[i] == 1, acc_m, acc)  # scalar cond broadcasts

        return lax.fori_loop(0, nb, body, one)

    def pow_int(self, a, e: int):
        return self.pow_bits(a, np.array([(e >> i) & 1 for i in range(max(e.bit_length(), 1))], dtype=np.uint32))

    def _inv(self, a):
        """Fermat inversion a^(p-2). inv(0) = 0 by that convention."""
        return self.pow_bits(a, self.inv_exp_bits)

    def _batch_inv(self, a, axis: int = 0):
        """Montgomery-trick batched inversion along `axis` (log-depth scans).
        Zero elements map to zero (they are masked to one internally)."""
        a = jnp.moveaxis(a, axis, 0)
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        x = jnp.where(is_zero, one, a)
        prefix = lax.associative_scan(self._mul, x, axis=0)
        total_inv = self._inv(prefix[-1])
        suffix = lax.associative_scan(self._mul, x[::-1], axis=0)[::-1]
        n = a.shape[0]
        # inv(x_i) = prefix[i-1] * suffix[i+1] * total_inv
        pre = jnp.concatenate([one[:1], prefix[:-1]], axis=0)
        suf = jnp.concatenate([suffix[1:], one[:1]], axis=0)
        out = self._mul(self._mul(pre, suf), jnp.broadcast_to(total_inv, a.shape))
        out = jnp.where(is_zero, jnp.zeros_like(out), out)
        return jnp.moveaxis(out, 0, axis)

    def sum_along(self, a, axis: int = 0):
        """Modular sum reduction along `axis` (log-depth fold of _add)."""
        a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        while n > 1:
            if n % 2 == 1:
                a = jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
                n += 1
            half = n // 2
            a = self._add(a[:half], a[half:])
            n = half
        return a[0]

    # ---------------- predicates / conversions ----------------

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def select(self, mask, a, b):
        """where(mask, a, b) broadcasting the mask over the limb axis."""
        return jnp.where(mask[..., None], a, b)

    def _to_mont(self, a):
        return self._mul(a, jnp.asarray(self.r2))

    def _from_mont(self, a):
        return self._mul(a, jnp.asarray(self.one_raw))

    def _gt_half(self, a):
        """canonical(a) > (p-1)/2  — the compressed-serialization sign bit."""
        half = jnp.asarray(int_to_limbs((self.modulus - 1) // 2, self.L))
        _, borrow = self._sub_sweep(jnp.broadcast_to(half, a.shape), a)
        return borrow > 0  # half - a borrows  <=>  a > half


FP = FieldParams("Fp", P_MOD, 24)
FR = FieldParams("Fr", R_MOD, 16)
