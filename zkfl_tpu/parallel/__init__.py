"""Multi-chip parallelism: mesh-sharded MSM and batch sharding helpers."""

from .msm import make_sharded_msm, msm_g1_sharded

__all__ = ["make_sharded_msm", "msm_g1_sharded"]
