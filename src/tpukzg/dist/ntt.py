"""Distributed four-step (Bailey) NTT over Fr (SURVEY.md component 24).

The SP-analogue of this workload (SURVEY.md section 2.2): a degree-n
polynomial, n = n1 * n2, viewed as an (n1, n2) row-major matrix.  With
X[k2*n1 + k1] = sum_j a[j1*n2 + j2] w^(jk):

    1. column NTTs of size n1            (local after a leading all_to_all)
    2. twiddle by w^(j2*k1)              (local, precomputed sharded table)
    3. all_to_all transpose              (the ICI exchange of BASELINE.json:5)
    4. row NTTs of size n2               (local)
    5. transpose + all_to_all            (restore natural contiguous order)

Input and output are natural-order coefficient/evaluation vectors sharded
contiguously over the 'chips' axis: shape (n, 16), spec P('chips') on the
leading axis.  Exact (bit-exact vs the single-chip radix-2 NTT) — verified
in tests/test_dist.py on the 8-device CPU mesh.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from tpukzg.field.mont import FR, R_MOD
from tpukzg.ntt.ntt import get_plan, omega_for
from tpukzg.dist.mesh import MeshConfig

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _twiddle_table(n1: int, n2: int, omega: int, invert: bool) -> np.ndarray:
    """(n1, n2, 16) Montgomery table of w^(+-j2*k1)."""
    w = pow(omega, R_MOD - 2, R_MOD) if invert else omega
    k1 = np.arange(n1, dtype=object)
    j2 = np.arange(n2, dtype=object)
    exps = (k1[:, None] * j2[None, :])
    flat = [pow(w, int(e), R_MOD) for e in exps.reshape(-1)]
    tab = FR.to_mont(FR.from_int(flat))
    return np.asarray(tab).reshape(n1, n2, 16)


class DistNtt:
    """Four-step NTT/iNTT plan bound to a mesh; n1 = rows, n2 = cols."""

    def __init__(self, n: int, cfg: MeshConfig | None = None, mesh=None,
                 n1: int | None = None):
        assert n & (n - 1) == 0
        self.n = n
        self.cfg = cfg or MeshConfig()
        self.mesh = mesh if mesh is not None else self.cfg.build()
        self.axis = self.cfg.axis
        self.n_dev = self.mesh.devices.size
        # Balanced split by default; both factors must be >= n_dev shards.
        if n1 is None:
            from tpukzg.utils.config import NttConfig
            n1 = NttConfig.from_env().four_step_rows
        log_n = n.bit_length() - 1
        self.n1 = n1 or (1 << (log_n // 2))
        self.n2 = n // self.n1
        assert self.n1 % self.n_dev == 0 and self.n2 % self.n_dev == 0, \
            "both NTT factors must be divisible by the device count"
        self.plan1 = get_plan(self.n1)
        self.plan2 = get_plan(self.n2)
        omega = omega_for(n)
        self._tw_fwd = _twiddle_table(self.n1, self.n2, omega, invert=False)
        self._tw_inv = _twiddle_table(self.n1, self.n2, omega, invert=True)
        self.ntt = self._wrap(inverse=False)
        self.intt = self._wrap(inverse=True)

    def _wrap(self, inverse: bool):
        n1, n2, n_dev, axis = self.n1, self.n2, self.n_dev, self.axis
        plan1, plan2 = self.plan1, self.plan2
        tw = jnp.asarray(self._tw_inv if inverse else self._tw_fwd)

        def per_chip(vec, tw_shard):
            # vec: (n/N, 16) = rows [d*n1/N, (d+1)*n1/N) of the (n1, n2) view
            a = vec.reshape(n1 // n_dev, n2, 16)
            # shard columns instead: (n1, n2/N, 16)
            a = lax.all_to_all(a, axis, split_axis=1, concat_axis=0, tiled=True)
            # 1) column transforms (size n1) — poly axis to -2
            a = jnp.moveaxis(a, 0, 1)                       # (n2/N, n1, 16)
            a = plan1._intt(a) if inverse else plan1._ntt(a)
            a = jnp.moveaxis(a, 0, 1)                       # (n1, n2/N, 16)
            # 2) twiddle w^(±j2*k1) — table sharded over j2 like the data
            a = FR._mul(a, tw_shard)
            # 3) transpose exchange: shard rows, gather columns
            a = lax.all_to_all(a, axis, split_axis=0, concat_axis=1, tiled=True)
            # 4) row transforms (size n2): (n1/N, n2, 16)
            a = plan2._intt(a) if inverse else plan2._ntt(a)
            # 5) natural order: out[k2*n1 + k1]; transpose then shard k2
            a = jnp.moveaxis(a, 0, 1)                       # (n2, n1/N, 16)
            a = lax.all_to_all(a, axis, split_axis=0, concat_axis=1, tiled=True)
            return a.reshape(n2 // n_dev * n1, 16)          # (n/N, 16)

        f = shard_map(per_chip, mesh=self.mesh,
                      in_specs=(P(axis), P(None, axis)),
                      out_specs=P(axis), check_vma=False)
        tw_arg = tw

        def run(vec):
            return f(vec, tw_arg)

        return jax.jit(run)
