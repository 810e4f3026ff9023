"""Multi-chip MSM / Poseidon sharding over a jax.sharding.Mesh.

The TPU-native replacement for the parallelism the reference doesn't have
(SURVEY §2.4: per-client proofs are independent; snarkjs MSMs are
single-threaded).  Two mesh axes:

  * "clients" — data parallelism over independent per-client proofs
    (witness hashing, per-client MSMs).  Pure batch sharding; XLA needs no
    collectives.
  * "points"  — tensor parallelism inside one MSM: the point array is
    sharded across chips; each chip tree-reduces its local slice per
    scalar bit and an all_gather (ICI) + small local reduction combines
    the per-chip partial sums.  The Horner accumulator (double + add per
    bit) is replicated — O(254) point ops, negligible next to the O(n)
    local work.

Collectives ride ICI via jax collectives inside shard_map — the analog of
the reference's (absent) NCCL layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.curve import (
    G1,
    _tree_reduce,
    inf_point,
    padd,
    pdbl,
    point_from_device,
    points_to_device,
    scalars_to_bits,
    select_point,
)


def _sharded_msm_local(points, bits, axis_name: str):
    """Per-device body: points [n_local, 3, 16], bits [n_bits, n_local]."""
    inf_local = inf_point(points.shape[:1])

    def bit_step(acc, bit_row):
        acc = pdbl(acc)
        sel = select_point(bit_row == 1, points, inf_local)
        local = _tree_reduce(sel, G1)                  # [3, 16] this chip
        parts = jax.lax.all_gather(local, axis_name)   # [ndev, 3, 16] over ICI
        total = _tree_reduce(parts, G1, unroll_levels=0)
        return padd(acc, total), None

    acc, _ = jax.lax.scan(bit_step, inf_point(), bits)
    return acc


def make_sharded_msm(mesh: Mesh, axis_name: str = "points"):
    """Build a pjit-ed MSM over `mesh` with points sharded on `axis_name`."""
    from jax import shard_map

    fn = shard_map(
        partial(_sharded_msm_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(None, axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def msm_g1_sharded(points, scalars, mesh: Mesh, axis_name: str = "points"):
    """Host-facing sharded G1 MSM (contract of ops.curve.msm_g1_device).

    Pads to a multiple of the mesh axis size so every chip gets an equal
    static-shape slice.
    """
    if not points:
        return None
    ndev = mesh.shape[axis_name]
    n = len(points)
    m = 1 << max(1, (n - 1).bit_length())
    m = max(m, ndev)
    points = list(points) + [None] * (m - n)
    scalars = list(scalars) + [0] * (m - n)
    dev_pts = points_to_device(points)
    bits = scalars_to_bits(scalars)
    pts_sharded = jax.device_put(dev_pts, NamedSharding(mesh, P(axis_name)))
    bits_sharded = jax.device_put(bits, NamedSharding(mesh, P(None, axis_name)))
    acc = make_sharded_msm(mesh, axis_name)(pts_sharded, bits_sharded)
    return point_from_device(acc)
