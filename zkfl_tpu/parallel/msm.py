"""Multi-chip MSM sharding over a jax.sharding.Mesh (intra-proof TP).

The TPU-native replacement for the parallelism the reference doesn't have
(SURVEY §2.4: snarkjs MSMs are single-threaded).  Design (round 2 — the
round-1 version all_gathered once per scalar BIT, 254 collectives/MSM;
VERDICT weak #4):

  * points + scalars are sharded on the "points" mesh axis; each chip runs
    the full sort + blocked-scan Pippenger bucket accumulation
    (ops/msm_pallas.py) on its local slice, producing its window sums
    S^(d) [3, 16, m, n_windows] — a few KB.
  * ONE all_gather over ICI collects the per-chip window sums; a local
    masked-shift fold adds them (point addition isn't a psum-able ring op,
    so gather+fold is the collective of choice).
  * The Horner ladder runs replicated — O(254) point ops, negligible next
    to the O(n/ndev) local work, so scaling efficiency tracks the bucket
    accumulation.

The "clients" axis (data parallelism over independent per-client proofs)
lives in groth16/device_prover.py::msm_results_many(mesh=...).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field.bn254 import FR
from ..ops import point_kernels as pk
from ..ops.msm_pallas import (
    WINDOW_BITS,
    _G1Ops,
    _G2Ops,
    _all_window_sums,
    _auto_wbits,
    _fold_sum,
    _horner,
    _pack_scalars,
)


def _sharded_msm_local(points, scalars, ops, axis_name: str, wbits: int):
    """Per-device body: points [3,(2,),16,m,n_local], scalars [m,16,n_local].

    Local Pippenger window sums, one ICI all_gather, fold, Horner."""
    S_local = _all_window_sums(points, scalars, ops, wbits=wbits)
    parts = jax.lax.all_gather(S_local, axis_name)  # [ndev, 3,(2,),16,m,nw]
    # devices to the last axis; fold with the shared one-site reduction
    S = _fold_sum(jnp.moveaxis(parts, 0, -1), ops)
    return _horner(S, ops, wbits)


def make_sharded_msm(mesh: Mesh, axis_name: str = "points",
                     wbits: int = WINDOW_BITS, g2: bool = False,
                     raw: bool = False):
    """Build a jitted sharded MSM over `mesh` (points on `axis_name`);
    ``raw`` returns the unjitted callable (serialized-executable cache)."""
    ops = _G2Ops if g2 else _G1Ops
    pspec = P(*([None] * (ops.coord_dims + 2) + [axis_name]))
    fn = jax.shard_map(
        partial(_sharded_msm_local, ops=ops, axis_name=axis_name, wbits=wbits),
        mesh=mesh,
        in_specs=(pspec, P(None, None, axis_name)),
        out_specs=P(),
        check_vma=False,  # zeros-init fori carries meet varying updates
    )
    return fn if raw else jax.jit(fn)


def msm_g1_sharded(points, scalars, mesh: Mesh, axis_name: str = "points",
                   xcache_dir: str | None = None):
    """Host-facing sharded G1 MSM: affine int points + int scalars ->
    affine int point.  Pads to a multiple of (axis size * 32) so every chip
    gets an equal static-shape slice aligned to the scan block."""
    if not points:
        return None
    ndev = mesh.shape[axis_name]
    n = len(points)
    step = ndev * 32
    m = -(-n // step) * step
    points = list(points) + [None] * (m - n)
    scalars = list(scalars) + [0] * (m - n)
    dev_pts = pk.g1_to_device(points)[:, :, None, :]  # [3,16,1,m]
    sc = jnp.asarray(_pack_scalars(scalars))[None]    # [1,16,m]
    wbits = _auto_wbits(m // ndev)
    pts_sharded = jax.device_put(
        dev_pts, NamedSharding(mesh, P(None, None, None, axis_name))
    )
    sc_sharded = jax.device_put(
        sc, NamedSharding(mesh, P(None, None, axis_name))
    )
    if xcache_dir is not None:
        from ..groth16 import xcache

        raw = make_sharded_msm(mesh, axis_name, wbits, raw=True)
        fn = xcache.cached_jit(
            "sharded_msm_g1", 1, raw, (pts_sharded, sc_sharded), xcache_dir,
            extra=(axis_name, wbits, tuple(mesh.shape.items())),
            devices=mesh.devices.flat,
        )
    else:
        fn = make_sharded_msm(mesh, axis_name, wbits)
    acc = fn(pts_sharded, sc_sharded)
    return pk.g1_from_device(np.asarray(acc)[:, :, 0])
