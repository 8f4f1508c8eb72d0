from tpukzg.dist.mesh import MeshConfig, allreduce_points
from tpukzg.dist.msm import ShardedMsm
from tpukzg.dist.ntt import DistNtt
from tpukzg.dist.batch import ShardedBatchVerifier

__all__ = ["MeshConfig", "allreduce_points", "ShardedMsm", "DistNtt",
           "ShardedBatchVerifier"]
