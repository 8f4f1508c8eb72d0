"""Sharded MSM — data-parallel over the points axis (SURVEY.md comp. 23).

points+scalars are sharded along the point axis (`P('chips')`); each chip
runs a full local Pippenger over its n/N points; partial results meet in a
log2(N)-step `ppermute` EC-add butterfly (NOT `psum` — see dist/mesh.py).
Output is replicated.

Tested on the 8-virtual-device CPU mesh (tests/test_dist.py) and exact vs
the single-device MSM; the same code path targets ICI on a pod slice.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P

from tpukzg.dist.mesh import MeshConfig, allreduce_points
from tpukzg.msm.pippenger import Pippenger, default_window

try:  # JAX >= 0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


class ShardedMsm:
    def __init__(self, curve, cfg: MeshConfig | None = None,
                 window: int | None = None, mesh=None):
        self.curve = curve
        self.cfg = cfg or MeshConfig()
        self.mesh = mesh if mesh is not None else self.cfg.build()
        self.axis = self.cfg.axis
        self.n_dev = self.mesh.devices.size
        self.pip = Pippenger(curve, window=window)
        self._cache = {}

    def _build(self, c: int):
        curve, axis, n_dev = self.curve, self.axis, self.n_dev

        def per_chip(pts, ks):
            local = self.pip._msm(pts, ks, c=c)
            return allreduce_points(curve, local, axis, n_dev)

        f = shard_map(per_chip, mesh=self.mesh,
                      in_specs=(P(self.axis), P(self.axis)),
                      out_specs=P(), check_vma=False)
        return jax.jit(f)

    def msm(self, points, scalars, c: int | None = None):
        """sum_i [k_i] P_i across the whole mesh.

        points: coord tuple, leading axis n (divisible by #devices);
        scalars: (n, 16) canonical Fr limbs.  Result replicated.
        """
        n = scalars.shape[0]
        assert n % self.n_dev == 0, "point count must divide the mesh"
        if c is None:
            c = self.pip.window or default_window(n // self.n_dev)
        if c not in self._cache:
            self._cache[c] = self._build(c)
        return self._cache[c](points, scalars)
