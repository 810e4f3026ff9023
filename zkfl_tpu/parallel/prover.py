"""Tensor-parallel fused prove pipeline: sharded NTT h(X) + sharded MSMs.

The DP path (groth16/device_prover.msm_results_many(mesh=...)) shards
independent client proofs over a "clients" axis; THIS module shards the
inside of ONE proof over a "points"/"tp" axis — the regime the reference's
Table 5 scaling motivates (prod domains 2^19, proving keys of ~2M points,
ref:Report.pdf Table 5 / tests/integration_test.mjs:557-697):

  * h(X) via the 4-step (Bailey) NTT chain inside one shard_map: the
    classic iNTT -> coset shift -> NTT -> pointwise -> iNTT -> unshift
    sequence of qap_pallas.compute_h_lm, each transform a 4-step NTT whose
    single cross-device exchange is ONE all_to_all over ICI (3 total) —
    the layout alternates between (n1,n2) and (n2,n1) factor roles so no
    extra transposes cross devices (parallel/ntt.py's scheme, chained).
  * the 5 proving MSMs with points + scalars sharded on the lane axis:
    local sort/prefix-scan Pippenger window sums (ops/msm_pallas) and ONE
    all_gather + fold (parallel/msm.py's collective design) per group.

Bit-exactness oracle: the unsharded fused pipeline
(device_prover._prove_msms_impl) — tests/test_parallel.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..field.bn254 import FR, FR_GENERATOR, fr_inv
from ..field.limbs import N_LIMBS
from ..ops import msm_pallas as mp
from ..ops.limb_kernels import FRK
from ..ops.qap_pallas import matrix_evals_lm
from .ntt import _ntt4_local, _twiddle_table


@lru_cache(maxsize=16)
def _coset_tables(n1: int, n2: int):
    """Replicated host tables for the coset shift, laid out to match the
    4-step chain's storage at the point they are applied (numpy:
    trace-safe to cache).

    fwd  [16, n2, n1]: g^(k1 + n1*k2) at storage [k2, k1] — applied after
         the first iNTT, whose output holds coefficient k1 + n1*k2 at
         [k1, k2] and is locally transposed to [k2, k1].
    inv  [16, n1, n2]: g^-(k1 + n1*k2) / (g^n - 1) at storage [k1, k2] —
         the final iNTT's output layout; the vanishing-polynomial division
         is folded in (Z = g^n - 1 is constant on the coset).
    """
    n = n1 * n2
    g = FR_GENERATOR
    g_inv = fr_inv(g)
    z_inv = fr_inv((pow(g, n, FR) - 1) % FR)
    pow_g = [1] * n
    for i in range(1, n):
        pow_g[i] = pow_g[i - 1] * g % FR
    fwd = [pow_g[k1 + n1 * k2] for k2 in range(n2) for k1 in range(n1)]
    inv_seq = [1] * n
    for i in range(1, n):
        inv_seq[i] = inv_seq[i - 1] * g_inv % FR
    inv = [
        inv_seq[k1 + n1 * k2] * z_inv % FR
        for k1 in range(n1) for k2 in range(n2)
    ]
    # Montgomery-form constants: mont_mul(x_mont, c_mont) keeps mont form;
    # the final from_mont happens after the inverse-coset multiply.
    fwd_m = FRK.pack(fwd).reshape(N_LIMBS, n2, n1)
    inv_m = FRK.pack(inv).reshape(N_LIMBS, n1, n2)
    return fwd_m, inv_m


def _factor(n: int, D: int):
    """n = n1 * n2 with both multiples of D (n1 as square as possible)."""
    if n < D * D:
        raise ValueError(
            f"TP prover needs domain >= devices^2: domain {n} < {D}^2 = "
            f"{D * D} (use fewer devices on the points axis or a larger "
            "setup domain)"
        )
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n1 = max(n1, D)
    n2 = n // n1
    if n2 < D:
        n1, n2 = n2, n1
    if n1 % D or n2 % D:
        raise ValueError(
            f"cannot factor domain {n} = {n1} x {n2} into multiples of "
            f"{D} devices (domain and device count must be powers of two)"
        )
    return n1, n2


def _mm(a, b):
    return FRK.mont_mul(a.reshape(N_LIMBS, -1), b.reshape(N_LIMBS, -1)).reshape(a.shape)


def _compute_h_local(evals, twA, twB, twC, cosF, cosI, axis: str):
    """Per-device 4-step h(X) chain.  evals [16, L, n1, n2_loc] natural
    order (index j1*n2 + j2, j2 sharded); returns h coefficients in
    STANDARD form, [16, L, n1_loc, n2] holding coefficient k1 + n1*k2 at
    [k1, k2] (k1 sharded)."""
    _, L, n1, _ = evals.shape

    # iNTT over (n1, n2): out [16, L, n1_loc, n2] = coeff k1 + n1*k2
    c = _ntt4_local(evals, twA, axis_name=axis, inverse=True)
    # local transpose -> [k2, k1]: natural order for factor roles (n2, n1)
    c_t = jnp.swapaxes(c, 2, 3)
    shifted = _mm(c_t, jnp.broadcast_to(cosF[:, None], c_t.shape))
    # forward NTT over (n2, n1): out [16, L, n2_loc, n1] = eval k1' + n2*k2'
    on_coset = _ntt4_local(shifted, twB, axis_name=axis, inverse=False)
    # pointwise (A.B - C) on the coset (order-agnostic; lanes are b*3+which
    # exactly as compute_h_lm's reshape).  const = R keeps Montgomery form;
    # the vanishing division z_inv is folded into cosI.
    B = L // 3
    oc = on_coset.reshape(N_LIMBS, B, 3, -1)
    h_ev = FRK.mul_sub_mul_const(
        oc[:, :, 0].reshape(N_LIMBS, -1),
        oc[:, :, 1].reshape(N_LIMBS, -1),
        oc[:, :, 2].reshape(N_LIMBS, -1),
        FRK.mont_r % FR,
    ).reshape((N_LIMBS, B) + on_coset.shape[2:])
    # local transpose -> [k2', k1']: natural order for (n1, n2) again
    h_t = jnp.swapaxes(h_ev, 2, 3)
    # iNTT over (n1, n2): out [16, B, n1_loc, n2] = coeff k1 + n1*k2
    h_c = _ntt4_local(h_t, twC, axis_name=axis, inverse=True)
    # inverse coset shift + vanishing division (cosI folds z_inv), to std
    h_m = _mm(h_c, jnp.broadcast_to(cosI[:, None], h_c.shape))
    return FRK.from_mont(h_m.reshape(N_LIMBS, -1)).reshape(h_m.shape)


def _msm_local(points, scalars, row_map, ops, axis: str, wbits: int,
               window_chunk: int):
    """parallel/msm._sharded_msm_local with a scalar-row -> point-row map
    (the prover's A/B1/C/H families share one point tensor)."""
    S_local = mp._all_window_sums(points, scalars, ops, window_chunk,
                                  wbits, row_map)
    parts = jax.lax.all_gather(S_local, axis)
    S = mp._fold_sum(jnp.moveaxis(parts, 0, -1), ops)
    return mp._horner(S, ops, wbits)


def make_fused_msms_tp(mesh: Mesh, cfg, n1: int, n2: int, axis: str = "points",
                       raw: bool = False):
    """Jitted TP fused pipeline over `mesh`'s `axis` (D devices); with
    ``raw`` the unjitted callable is returned (for the dryrun's serialized
    -executable cache, groth16/xcache.py).

    cfg = (domain, n_max, wc_g1, wc_g2, wbits) as device_prover; n_max must
    be a multiple of D*32 (lane blocks align with the scan).  Takes the
    same tensors as _prove_msms_impl with g1/b2 point lanes PRE-SHARDED on
    the last axis; witness/COO replicated."""
    domain, n_max, wc_g1, wc_g2, wbits = cfg
    D = mesh.shape[axis]
    assert n_max % (D * 32) == 0, (n_max, D)

    twA = jnp.asarray(_twiddle_table(n1, n2, True))
    twB = jnp.asarray(_twiddle_table(n2, n1, False))
    cosF, cosI = (jnp.asarray(t) for t in _coset_tables(n1, n2))

    h_local = jax.shard_map(
        partial(_compute_h_local, axis=axis),
        mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, None, axis),
                  P(None, None, axis), P(None, None, axis),
                  P(None, None, axis), P(None, axis, None)),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )

    g1_msm = jax.shard_map(
        partial(_msm_local, ops=mp._G1Ops, axis=axis, wbits=wbits,
                window_chunk=wc_g1),
        mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, None, axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    g2_msm = jax.shard_map(
        partial(_msm_local, ops=mp._G2Ops, axis=axis, wbits=wbits,
                window_chunk=wc_g2),
        mesh=mesh,
        in_specs=(P(None, None, None, None, axis), P(None, None, axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    def fn(n_pub, g1_pts, b2_pts, rows, cols, coeffs, w_std):
        B, _, m = w_std.shape
        w_lm = jnp.moveaxis(w_std, 0, 1)
        w_mont = FRK.to_mont(w_lm.reshape(16, B * m)).reshape(16, B, m)
        evals = matrix_evals_lm(rows, cols, coeffs, w_mont, domain)
        # natural order [16, 3B, n1, n2] (lane = b*3 + which, exactly
        # compute_h_lm's layout); j2 sharded by the shard_map spec
        ev = evals.reshape(N_LIMBS, 3 * B, n1, n2)
        h4 = h_local(ev, twA, twB, twA, cosF, cosI)  # [16, B, n1, n2]
        # coefficient i = k1 + n1*k2 lives at [k1, k2] -> linear order
        h_std = jnp.swapaxes(h4, 2, 3).reshape(N_LIMBS, B, domain)

        def pad(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, n_max - x.shape[-1])))

        wit = pad(w_lm)
        wire = jax.lax.broadcasted_iota(jnp.int32, w_lm.shape, 2)
        priv = pad(jnp.where(wire > n_pub, w_lm, 0))
        h_sc = pad(h_std[:, :, : domain - 1])
        scalars = jnp.stack([wit, wit, priv, h_sc], axis=2)  # [16,B,4,n]
        scalars = jnp.moveaxis(scalars, 0, 2).reshape(B * 4, 16, n_max)
        fam = jnp.tile(jnp.arange(4, dtype=jnp.int32), B)
        g1_out = g1_msm(g1_pts, scalars, fam)      # [3,16,B*4]
        g2_scalars = jnp.moveaxis(wit, 0, 1).reshape(B, 16, n_max)
        g2_out = g2_msm(b2_pts, g2_scalars,
                        jnp.zeros((B,), jnp.int32))  # [3,2,16,B]
        return g1_out.reshape(3, 16, B, 4), g2_out

    return fn if raw else jax.jit(fn)


_tp_fn_cache: dict = {}


def msm_results_tp(dp, witnesses, mesh: Mesh, axis: str = "points",
                   xcache_dir: str | None = None):
    """Tensor-parallel counterpart of DeviceProver.msm_results_many: ONE
    proof pipeline (or a small batch) sharded over `axis` — sharded-NTT
    h(X) + lane-sharded MSMs.  Returns one a/b1/c/h/b2 dict per witness,
    bit-exact with the unsharded fused pipeline.

    `xcache_dir` routes compilation through the serialized-executable cache
    (groth16/xcache.py) so a fresh process skips the minutes-long trace +
    compile (the dryrun path)."""
    from ..ops import point_kernels as pk_ops

    D = mesh.shape[axis]
    B = len(witnesses)
    domain, n_max, _, _, wbits = dp.cfg
    step = D * 32
    n_pad = -(-n_max // step) * step
    n1, n2 = _factor(domain, D)

    g1_pts, b2_pts = dp.g1_pts, dp.b2_pts
    if n_pad > n_max:
        extra = n_pad - n_max
        g1_pts = jnp.concatenate(
            [g1_pts, mp._G1Ops.inf((g1_pts.shape[2], extra))], axis=-1)
        b2_pts = jnp.concatenate(
            [b2_pts, mp._G2Ops.inf((b2_pts.shape[3], extra))], axis=-1)

    from jax.sharding import NamedSharding

    g1_sh = jax.device_put(g1_pts, NamedSharding(mesh, P(None, None, None, axis)))
    b2_sh = jax.device_put(b2_pts, NamedSharding(mesh, P(None, None, None, None, axis)))

    w_std = np.zeros((B, 16, dp.m_pad), dtype=np.uint32)
    for b, w in enumerate(witnesses):
        if len(w) != dp.m_wires:
            raise ValueError(f"witness length {len(w)} != wires {dp.m_wires}")
        w_std[b, :, : dp.m_wires] = FRK.pack(list(w), mont=False)

    cfg = (domain, n_pad, mp._auto_chunk(4 * B, n_pad, False),
           mp._auto_chunk(B, n_pad, True), wbits)
    args = (jnp.int32(dp.n_pub), g1_sh, b2_sh, dp.rows,
            dp.cols, dp.coeffs, jnp.asarray(w_std))
    if xcache_dir is not None:
        from ..groth16 import xcache

        raw = make_fused_msms_tp(mesh, cfg, n1, n2, axis, raw=True)
        fn = xcache.cached_jit(
            "tp_prover", 1, raw, args, xcache_dir,
            extra=(cfg, n1, n2, axis, tuple(mesh.shape.items())),
            devices=mesh.devices.flat,
        )
    else:
        key = (mesh, cfg, n1, n2, axis)
        fn = _tp_fn_cache.get(key)
        if fn is None:
            fn = _tp_fn_cache[key] = make_fused_msms_tp(mesh, cfg, n1, n2, axis)
    g1_out, g2_out = fn(*args)
    g1_np = np.asarray(g1_out)
    g2_np = np.asarray(g2_out)
    return [
        {
            "a": pk_ops.g1_from_device(g1_np[:, :, b, 0]),
            "b1": pk_ops.g1_from_device(g1_np[:, :, b, 1]),
            "c": pk_ops.g1_from_device(g1_np[:, :, b, 2]),
            "h": pk_ops.g1_from_device(g1_np[:, :, b, 3]),
            "b2": pk_ops.g2_from_device(g2_np[:, :, :, b]),
        }
        for b in range(B)
    ]
