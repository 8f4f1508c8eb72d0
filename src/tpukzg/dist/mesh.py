"""Device mesh construction + sharding helpers (SURVEY.md component 22).

One flat 'chips' axis is the primary data-parallel axis (points of an MSM,
openings of a batch); an optional 2-D ('hosts', 'chips') split maps DCN x
ICI topology.  All distributed entry points take a `MeshConfig` and use
`shard_map` with explicit PartitionSpecs — XLA owns the transport
(SURVEY.md section 2.3: no hand-written comm backend; collectives ride
ICI/DCN).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P


@dataclass(frozen=True)
class MeshConfig:
    """Frozen mesh description (SURVEY.md section 5.6 config style)."""
    axis: str = "chips"
    n_devices: int | None = None  # None -> all available

    def build(self, devices=None) -> Mesh:
        devs = list(devices if devices is not None else jax.devices())
        n = self.n_devices or len(devs)
        if len(devs) < n:
            # The default platform may expose fewer devices than requested
            # (e.g. one real TPU while tests want the 8-virtual-CPU mesh).
            devs = list(jax.devices("cpu"))
        assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
        assert n & (n - 1) == 0, "power-of-two device count required"
        return Mesh(np.array(devs[:n]), (self.axis,))

    @property
    def spec(self) -> P:
        return P(self.axis)

    @property
    def replicated(self) -> P:
        return P()


def tree_ppermute(x, axis_name: str, perm):
    """lax.ppermute over an arbitrary pytree (EC points are coord tuples)."""
    return jax.tree.map(lambda a: jax.lax.ppermute(a, axis_name, perm), x)


def allreduce_points(curve, pt, axis_name: str, axis_size: int):
    """Cross-chip EC-point all-reduce: log2(N)-step recursive-doubling
    butterfly of `ppermute` + complete adds.

    EC addition is a group op, NOT lane-wise integer addition, so `psum`
    over coordinate limbs would be algebraically wrong (SURVEY.md section
    5.8) — this permute+add tree is the sound TPU-native reduction.
    Every device ends with the full sum (allreduce semantics).
    """
    assert axis_size & (axis_size - 1) == 0
    shift = 1
    while shift < axis_size:
        perm = [(i, i ^ shift) for i in range(axis_size)]
        other = tree_ppermute(pt, axis_name, perm)
        pt = curve._add(pt, other)
        shift <<= 1
    return pt
