"""Device Pippenger MSM on TPU — sort + prefix-scan bucket accumulation.

Replaces the round-1 bit-serial Horner MSM (ops/curve.py) and snarkjs's
ffjavascript MSM (the Groth16 prove hot path, ~95% of round latency —
full_system_simulation.mjs:770-780, SURVEY §3.3) with a windowed Pippenger
formulated for a SIMD machine: **no data-dependent scatter of points, no
per-bucket loops** — just sort, one inclusive prefix scan of point adds, and
boundary gathers.

Per 8-bit window w of the scalars:
  1. digit d_i = byte w of scalar_i; sort lanes by d_i DESCENDING.
  2. inclusive prefix sums U_j = P_(0) + ... + P_(j) at the positions that
     matter, via a blocked scan: rows of 32 lanes are scanned SERIALLY in a
     fori_loop (n adds total — work-optimal), row totals get a masked
     Hillis-Steele scan, and the two pieces combine only at the <=255
     gathered boundary positions.
  3. For every bucket threshold k in 1..255 the set {i : d_i >= k} is a
     PREFIX of the sorted order, so the classic running-sum identity
         S_w = sum_d d*B_d = sum_{k=1..255} T_k,   T_k = sum_{d_i>=k} P_i
     needs only T_k = U[cnt_k - 1] where cnt_k = #{d_i >= k} comes from a
     digit histogram — a 255-point gather instead of 255 bucket reductions.
  4. S_w folds the 256 gathered prefixes (masked-shift reduction).
All windows process at once (batched lanes), and the final combine is a
Horner ladder sum_w 2^(8w) S_w.

Work: ~1n adds/window vs the bit-serial design's 254n per MSM.  Every
point-add call site lives inside a fori_loop body so the fused ~33k-op
Pallas addition kernel is traced and Mosaic-compiled a HANDFUL of times per
program — XLA compiles Pallas kernels per call site (measured ~17 s each),
which is why associative_scan/tree formulations are compile-time disasters.

Several MSMs batch along a lane axis m (the prover's A/B1/C/H queries run
as ONE kernel sequence).  Oracle: groth16/prover.py pippenger_g1 / msm_g2
(tests/test_pallas_kernels.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FR
from ..field.limbs import N_LIMBS
from . import point_kernels as pk

WINDOW_BITS = 8   # default for large MSMs
N_WINDOWS = 32    # 256 bits / 8 (top window covers the 254-bit scalar's zeros)
N_BUCKETS = 1 << WINDOW_BITS
SMALL_MSM = 2048  # below this, 4-bit windows (less bucket-threshold work)


class _G1Ops:
    coord_dims = 1  # trailing dims per coordinate beyond the limb axis
    padd = staticmethod(pk.padd)
    pdbl = staticmethod(pk.pdbl)
    inf = staticmethod(pk.inf_point)
    select = staticmethod(pk.select)


class _G2Ops:
    coord_dims = 2
    padd = staticmethod(pk.padd_g2)
    pdbl = staticmethod(pk.pdbl_g2)
    inf = staticmethod(pk.inf_point_g2)
    select = staticmethod(pk.select_g2)


def _digits(scalars: jnp.ndarray, wbits: int = WINDOW_BITS) -> jnp.ndarray:
    """[m, 16, n] uint32 standard-form limbs -> [m, 256/wbits, n] int32.

    Window i*k + j (k = 16/wbits windows per limb) covers scalar bits
    16i + wbits*j .. 16i + wbits*(j+1) - 1 — ascending windows."""
    m, _, n = scalars.shape
    k = 16 // wbits
    mask = (1 << wbits) - 1
    parts = [
        ((scalars >> (wbits * j)) & mask).astype(jnp.int32) for j in range(k)
    ]
    return jnp.stack(parts, axis=2).reshape(m, N_LIMBS * k, n)


SERIAL = 32  # lanes scanned serially per row block (work-optimal prefix)


def _fold_sum(pts, ops):
    """Sum points along the last axis (length L, power of two) with ONE
    fused-add call site: masked-shift reduction in a fori_loop."""
    L = pts.shape[-1]
    if L == 1:
        return pts[..., 0]
    steps = int(np.log2(L))
    lane = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    inf = ops.inf(pts.shape[ops.coord_dims + 1 :])

    def body(k, x):
        s = jnp.left_shift(1, k)
        rolled = jnp.roll(x, -s, axis=-1)
        valid = (lane + s) < L
        other = jnp.where(valid, rolled, inf)
        return ops.padd(x, other)

    out = jax.lax.fori_loop(0, steps, body, pts)
    return out[..., 0]


def _window_sums(points_flat, digits, ops, nb: int = N_BUCKETS,
                 row_map=None):
    """Bucket-accumulate all windows at once.

    points_flat: [3, (2,), 16, m_pts*n] limb-major points (Montgomery).
    digits: [m, W, n] int32 in [0, nb); n is a multiple of SERIAL.
    row_map: optional [m] int32 mapping scalar row -> point row (several
    scalar rows may share one point family, e.g. client-batched proving);
    defaults to the identity.
    Returns [3, (2,), 16, m, W] window sums."""
    m, W, n = digits.shape
    lead = points_flat.shape[: ops.coord_dims + 1]  # (3, [2,] 16)
    R = n // SERIAL

    # 1. sort each (msm, window) row by digit, descending.
    perm = jnp.argsort(digits, axis=-1, descending=True)  # [m, W, n]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, W, n), 0)
    if row_map is not None:
        row = row_map[row]
    flat_idx = (row * n + perm).reshape(m * W * n)
    sorted_pts = jnp.take(points_flat, flat_idx, axis=-1).reshape(
        lead + (m, W, R, SERIAL)
    )

    # 2a. serial inclusive prefix scan within each 32-lane row (n adds
    # total across m*W*R lanes per step — the work-optimal formulation,
    # ONE traced add site).
    def serial_body(c, x):
        prev = jax.lax.dynamic_slice_in_dim(x, c - 1, 1, axis=-1)
        cur = jax.lax.dynamic_slice_in_dim(x, c, 1, axis=-1)
        s = ops.padd(prev[..., 0], cur[..., 0])
        return jax.lax.dynamic_update_slice_in_dim(
            x, s[..., None], c, axis=-1
        )

    within = jax.lax.fori_loop(1, SERIAL, serial_body, sorted_pts)

    # 2b. masked Hillis-Steele inclusive scan over the R row totals.
    row_tot = within[..., SERIAL - 1]  # [lead, m, W, R]
    r_lane = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
    r_inf = ops.inf((m, W, R))
    r_steps = max(1, (R - 1)).bit_length() if R > 1 else 0

    def hillis_body(k, t):
        s = jnp.left_shift(1, k)
        rolled = jnp.roll(t, s, axis=-1)
        return ops.padd(t, jnp.where(r_lane >= s, rolled, r_inf))

    row_scan = jax.lax.fori_loop(0, r_steps, hillis_body, row_tot)
    # exclusive prefix of whole rows
    p_excl = jnp.concatenate(
        [ops.inf((m, W, 1)), row_scan[..., : R - 1]], axis=-1
    )

    # 3. histogram -> cnt_k = #{digit >= k}; prefix U at cnt_k - 1 is
    # within[r, c] + p_excl[r].
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (m, W, n), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (m, W, n), 1)
    ) * nb + digits
    hist = jax.ops.segment_sum(
        jnp.ones((m * W * n,), jnp.int32),
        seg.reshape(-1),
        num_segments=m * W * nb,
    ).reshape(m, W, nb)
    cnt = jnp.cumsum(hist[..., ::-1], axis=-1)[..., ::-1]  # cnt[d] = #{>= d}
    cnt_k = cnt[..., 1:]  # k = 1..nb-1, [m, W, nb-1]

    pos = jnp.maximum(cnt_k - 1, 0)
    r_hat = pos // SERIAL
    mw = (
        jax.lax.broadcasted_iota(jnp.int32, (m, W, nb - 1), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (m, W, nb - 1), 1)
    )
    within_flat = within.reshape(lead + (m * W * n,))
    u_within = jnp.take(
        within_flat, (mw * n + pos).reshape(-1), axis=-1
    ).reshape(lead + (m, W, nb - 1))
    p_flat = p_excl.reshape(lead + (m * W * R,))
    u_rows = jnp.take(
        p_flat, (mw * R + r_hat).reshape(-1), axis=-1
    ).reshape(lead + (m, W, nb - 1))
    T = ops.padd(u_within, u_rows)
    empty = (cnt_k == 0).reshape((1,) * len(lead) + (m, W, nb - 1))
    T = jnp.where(empty, ops.inf((m, W, nb - 1)), T)

    # 4. S_w = sum_k T_k (pad to nb, masked-shift fold: one add site).
    T = jnp.concatenate([T, ops.inf((m, W, 1))], axis=-1)
    return _fold_sum(T, ops)  # [3, (2,), 16, m, W]


def _all_window_sums(points, scalars, ops, window_chunk: int = 0,
                     wbits: int = WINDOW_BITS, row_map=None):
    """All window sums: points [3,(2,),16,m_pts,n], scalars [m,16,n] ->
    [3,(2,),16,m,nw].  `row_map` [m] maps scalar rows to point rows
    (identity when None; m_pts == m then)."""
    m, _, n = scalars.shape
    m_pts = points.shape[ops.coord_dims + 1]
    nw = 256 // wbits
    lead = points.shape[: ops.coord_dims + 1]
    if n % SERIAL:
        pad = SERIAL - n % SERIAL
        points = jnp.concatenate([points, ops.inf((m_pts, pad))], axis=-1)
        scalars = jnp.pad(scalars, ((0, 0), (0, 0), (0, pad)))
        n += pad
    points_flat = points.reshape(lead + (m_pts * n,))
    digits = _digits(scalars, wbits)  # [m, nw, n]

    C = window_chunk or nw
    if C >= nw:
        return _window_sums(points_flat, digits, ops, 1 << wbits, row_map)
    # bound the sorted-points working set: fori over window chunks,
    # every add site still traced exactly once.
    S0 = jnp.zeros(lead + (m, nw), dtype=jnp.uint32)

    def chunk_body(c, S):
        dchunk = jax.lax.dynamic_slice(digits, (0, c * C, 0), (m, C, n))
        s = _window_sums(points_flat, dchunk, ops, 1 << wbits, row_map)
        return jax.lax.dynamic_update_slice(
            S, s, (0,) * (len(lead) + 1) + (c * C,)
        )

    return jax.lax.fori_loop(0, nw // C, chunk_body, S0)


def _horner(S, ops, wbits: int = WINDOW_BITS):
    """Combine window sums S [3,(2,),16,m,nw] -> [3,(2,),16,m] via the
    Horner ladder acc = 2^wbits * acc + S_w, MSB first."""
    nw = S.shape[-1]
    acc = S[..., nw - 1]

    def horner_body(i, acc):
        w = nw - 2 - i
        # inner fori so the doubling kernel is ONE call site, not `wbits`
        acc = jax.lax.fori_loop(0, wbits, lambda _, a: ops.pdbl(a), acc)
        s_w = jax.lax.dynamic_slice_in_dim(S, w, 1, axis=-1)[..., 0]
        return ops.padd(acc, s_w)

    return jax.lax.fori_loop(0, nw - 1, horner_body, acc)


def _msm_impl(points, scalars, ops, window_chunk: int = 0,
              wbits: int = WINDOW_BITS, row_map=None):
    """points [3,(2,),16,m_pts,n], scalars [m,16,n] std-form ->
    [3,(2,),16,m]."""
    S = _all_window_sums(points, scalars, ops, window_chunk, wbits, row_map)
    return _horner(S, ops, wbits)


def _auto_wbits(n: int) -> int:
    return WINDOW_BITS if n >= SMALL_MSM else 4


@partial(jax.jit, static_argnums=(2, 3))
def _msm_g1_jit(points, scalars, window_chunk, wbits):
    return _msm_impl(points, scalars, _G1Ops, window_chunk, wbits)


@partial(jax.jit, static_argnums=(2, 3))
def _msm_g2_jit(points, scalars, window_chunk, wbits):
    return _msm_impl(points, scalars, _G2Ops, window_chunk, wbits)


def _auto_chunk(m: int, n: int, g2: bool) -> int:
    """Window chunk keeping the scan working set around <= ~1.5 GB."""
    bytes_per_lane = 3 * N_LIMBS * 4 * (2 if g2 else 1) * 3  # ~3 live copies
    budget = 1_500_000_000
    c = max(1, budget // max(1, m * n * bytes_per_lane))
    for cand in (32, 16, 8, 4, 2, 1):
        if cand <= c:
            return cand
    return 1


def msm_batch_g1(points, scalars, window_chunk: int | None = None):
    """Batched G1 MSM: points [3,16,m,n] (Montgomery limb-major), scalars
    [m,16,n] standard-form limbs -> [3,16,m] projective results."""
    m, _, n = scalars.shape
    wc = window_chunk or _auto_chunk(m, n, False)
    return _msm_g1_jit(points, scalars, wc, _auto_wbits(n))


def msm_batch_g2(points, scalars, window_chunk: int | None = None):
    """Batched G2 MSM: points [3,2,16,m,n], scalars [m,16,n] -> [3,2,16,m]."""
    m, _, n = scalars.shape
    wc = window_chunk or _auto_chunk(m, n, True)
    return _msm_g2_jit(points, scalars, wc, _auto_wbits(n))


# ---------------------------------------------------------------------------
# Host-facing wrappers (drop-in for groth16.prover.pippenger_g1 / msm_g2)
# ---------------------------------------------------------------------------

from .limb_kernels import FRK


def _pack_scalars(scalars) -> np.ndarray:
    return FRK.pack([s % FR for s in scalars], mont=False)  # [16, n]


def msm_g1_host(points, scalars):
    """Affine int points + int scalars -> affine int point (or None)."""
    if not points:
        return None
    pts = pk.g1_to_device(points)[:, :, None, :]  # [3,16,1,n]
    sc = jnp.asarray(_pack_scalars(scalars))[None]  # [1,16,n]
    acc = msm_batch_g1(pts, sc)
    return pk.g1_from_device(np.asarray(acc[..., 0]))


def msm_g2_host(points, scalars):
    if not points:
        return None
    pts = pk.g2_to_device(points)[:, :, :, None, :]
    sc = jnp.asarray(_pack_scalars(scalars))[None]
    acc = msm_batch_g2(pts, sc)
    return pk.g2_from_device(np.asarray(acc[..., 0]))
