"""Sharded end-to-end batch verification (SURVEY.md component 25).

The k openings of a batch are data-parallel over 'chips': each chip folds
its local slice {pi_i: rho^i and rho^i*z_i, C_i: rho^i, G1: -sum rho^i y_i}
with a local Pippenger ladder, the two partial G1 aggregates cross chips
through the ppermute EC-add butterfly, and the final 2-pairing check runs
replicated (it is k-independent — the whole point of batching,
SURVEY.md section 3.1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpukzg.field.mont import FR
from tpukzg.curve.g1 import G1
from tpukzg.pairing.check import pairing_check
from tpukzg.msm.pippenger import Pippenger, default_window
from tpukzg.dist.mesh import MeshConfig, allreduce_points

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


class ShardedBatchVerifier:
    def __init__(self, setup, cfg: MeshConfig | None = None, mesh=None,
                 window: int | None = None):
        self.setup = setup
        self.cfg = cfg or MeshConfig()
        self.mesh = mesh if mesh is not None else self.cfg.build()
        self.axis = self.cfg.axis
        self.n_dev = self.mesh.devices.size
        self.pip = Pippenger(G1, window=window)
        self._cache = {}

    def _build(self, c: int):
        axis, n_dev, setup, pip = self.axis, self.n_dev, self.setup, self.pip
        gen = tuple(jnp.asarray(x) for x in G1.gen_np)

        def per_chip(c_pts, pi_pts, z_can, y_can, rho_can):
            k_loc = z_can.shape[0]
            rho_m = FR._to_mont(rho_can)
            rz = FR._from_mont(FR._mul(rho_m, FR._to_mont(z_can)))
            ry = FR.sum_along(FR._mul(rho_m, FR._to_mont(y_can)), axis=0)
            neg_ys = FR._from_mont(FR._neg(ry))[None]

            pts = tuple(
                jnp.concatenate([pi, pi, cc, jnp.broadcast_to(g, (1,) + g.shape)], 0)
                for pi, cc, g in zip(pi_pts, c_pts, gen))
            scalars = jnp.concatenate([rho_can, rz, rho_can, neg_ys], axis=0)
            prods = pip._msm_grouped(pts, scalars,
                                     groups=(k_loc, 2 * k_loc + 1), c=c)
            pi_agg, lhs = prods
            pi_agg = allreduce_points(G1, pi_agg, axis, n_dev)
            lhs = allreduce_points(G1, lhs, axis, n_dev)
            return pairing_check([
                (lhs, tuple(jnp.asarray(x) for x in setup.lines_gen)),
                (G1.neg(pi_agg), tuple(jnp.asarray(x) for x in setup.lines_tau)),
            ])

        f = shard_map(per_chip, mesh=self.mesh,
                      in_specs=(P(self.axis), P(self.axis), P(self.axis),
                                P(self.axis), P(self.axis)),
                      out_specs=P(), check_vma=False)
        return jax.jit(f)

    def verify_batch(self, c_points, z_can, y_can, proof_points, rho_can,
                     c: int | None = None):
        """Same contract as Kzg.verify_batch, sharded over the k axis.
        k must be divisible by the device count."""
        k = z_can.shape[0]
        assert k % self.n_dev == 0
        if c is None:
            c = default_window(3 * (k // self.n_dev) + 1)
        if c not in self._cache:
            self._cache[c] = self._build(c)
        ok = self._cache[c](c_points, proof_points, z_can, y_can, rho_can)
        return ok
