"""Fixed-point gadget suite (C4), legacy secagg circuit (C11) and the tiny
demo training circuits (C12) — the remaining reference circuit inventory
(SURVEY.md §2.1)."""

import pytest

from zkfl_tpu.commit.merkle import MerkleTree
from zkfl_tpu.commit.vector_hash import poseidon, vector_hash
from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.r1cs.builder import ConstraintSystem
from zkfl_tpu.r1cs.circuits import build_circuit, build_structure, dummy_inputs
from zkfl_tpu.r1cs.fixedpoint import (
    fixed_abs,
    fixed_add,
    fixed_div,
    fixed_max,
    fixed_min,
    fixed_mul,
    fixed_sqrt,
    fixed_sub,
    is_zero,
    sqrt_hint,
)
from zkfl_tpu.r1cs.secagg import SecaggLegacyParams, derive_legacy_mask
from zkfl_tpu.r1cs.tiny import TinyParams

P = 1000  # PRECISION


def _pair(cs, a, b):
    return cs.private_input("a", a % FR), cs.private_input("b", b % FR)


# ---------------------------------------------------------------------------
# C4: fixed-point gadgets (fixedpoint.circom semantics)
# ---------------------------------------------------------------------------

def test_is_zero():
    for v, expected in [(0, 1), (5, 0), (FR - 1, 0)]:
        cs = ConstraintSystem()
        out = is_zero(cs, cs.private_input("v", v))
        assert out.value == expected
        assert cs.is_satisfied()


def test_fixed_mul():
    # 3.14 * 2.0 = 6.28  (fixedpoint.circom:34-39 worked example)
    cs = ConstraintSystem()
    a, b = _pair(cs, 3140, 2000)
    out = fixed_mul(cs, a, b, P)
    assert out.value == 6280
    assert cs.is_satisfied()


def test_fixed_mul_truncates():
    cs = ConstraintSystem()
    a, b = _pair(cs, 1, 1)  # 0.001 * 0.001 -> floor(1/1000) = 0
    assert fixed_mul(cs, a, b, P).value == 0
    assert cs.is_satisfied()


def test_fixed_div():
    # 6.28 / 2.0 = 3.14  (fixedpoint.circom:84-88 worked example)
    cs = ConstraintSystem()
    a, b = _pair(cs, 6280, 2000)
    assert fixed_div(cs, a, b, P).value == 3140
    assert cs.is_satisfied()


def test_fixed_div_zero_divisor_unsatisfiable():
    cs = ConstraintSystem()
    a, b = _pair(cs, 6280, 0)
    fixed_div(cs, a, b, P)
    assert not cs.is_satisfied()  # b * b_inv = 1 cannot hold


def test_fixed_add_sub_linear():
    cs = ConstraintSystem()
    a, b = _pair(cs, 3140, 2860)
    n0 = len(cs.constraints)
    assert fixed_add(cs, a, b).value == 6000
    assert fixed_sub(cs, a, b).value == 280
    assert len(cs.constraints) == n0  # linear: no constraints added
    assert cs.is_satisfied()


def test_fixed_sqrt():
    # sqrt(9.0) = 3.0 (fixedpoint.circom:209-211 worked example)
    cs = ConstraintSystem()
    v = cs.private_input("v", 9000)
    out = fixed_sqrt(cs, v, P)
    assert out.value == sqrt_hint(9000, P)
    assert abs(out.value - 3000) <= 1
    assert cs.is_satisfied()


def test_fixed_sqrt_zero():
    cs = ConstraintSystem()
    out = fixed_sqrt(cs, cs.private_input("v", 0), P)
    assert out.value == 0
    assert cs.is_satisfied()


@pytest.mark.parametrize("v,expected", [(3140, 3140), (FR - 3140, 3140), (0, 0)])
def test_fixed_abs(v, expected):
    cs = ConstraintSystem()
    out = fixed_abs(cs, cs.private_input("v", v))
    assert out.value == expected
    assert cs.is_satisfied()


def test_fixed_min_max():
    cs = ConstraintSystem()
    a, b = _pair(cs, 3140, 2000)
    assert fixed_min(cs, a, b).value == 2000
    assert fixed_max(cs, a, b).value == 3140
    assert cs.is_satisfied()


# ---------------------------------------------------------------------------
# C11: legacy secure_agg_client circuit
# ---------------------------------------------------------------------------

def _legacy_inputs(params: SecaggLegacyParams):
    dim = params.dim
    client_id = 1
    prf_seed = 424242
    gradient = [(i * 7 + 3) % 100 for i in range(dim)]
    mask = derive_legacy_mask(prf_seed, client_id, dim)
    return {
        "client_id": client_id,
        "shared_key_hash": poseidon([prf_seed]),
        "root_G": vector_hash(gradient),
        "tauSquared": 10**8,
        "masked_update": [(g + m) % FR for g, m in zip(gradient, mask)],
        "gradient": gradient,
        "mask": mask,
        "prf_seed": prf_seed,
    }


def test_secagg_legacy_satisfied():
    params = SecaggLegacyParams(dim=8)
    cs = build_circuit(params, _legacy_inputs(params))
    assert cs.is_satisfied()
    # 12 public signals as in MainWrapper (secure_agg_client.circom:156-163).
    assert len(cs.public_signals) == 12


def test_secagg_legacy_rejects_wrong_mask():
    params = SecaggLegacyParams(dim=8)
    inputs = _legacy_inputs(params)
    inputs["mask"] = [(m + 1) % FR for m in inputs["mask"]]
    assert not build_circuit(params, inputs).is_satisfied()


def test_secagg_legacy_rejects_norm_violation():
    params = SecaggLegacyParams(dim=8)
    inputs = _legacy_inputs(params)
    inputs["tauSquared"] = 1  # norm^2 of the test gradient is >> 1
    assert not build_circuit(params, inputs).is_satisfied()


def test_secagg_legacy_groth16_roundtrip():
    """Full prove + verify of the legacy circuit (H6): the reference's
    test_secureagg.cjs:24-47 compiles secure_agg_client, runs its own pot12
    ceremony and does a groth16 prove/verify roundtrip — this is the native
    equivalent (our deterministic dev setup stands in for the ceremony).

    dim=4 keeps the pure-host prove CPU-suite-sized; the reference's dim=8
    instantiation is covered by the structure/satisfiability tests above
    (same template, compile-time parameter)."""
    from zkfl_tpu.groth16.prover import groth16_prove
    from zkfl_tpu.groth16.setup import groth16_setup
    from zkfl_tpu.groth16.verifier import groth16_verify

    params = SecaggLegacyParams(dim=4)
    cs = build_circuit(params, _legacy_inputs(params))
    assert cs.is_satisfied()
    pk, vk = groth16_setup(cs, seed="legacy-secagg", device=False)
    proof = groth16_prove(pk, cs)
    assert groth16_verify(vk, proof)
    assert proof.public_signals == cs.public_signals
    # tampered masked_update (public) must not verify against the original
    bad = list(cs.values)
    bad[1] = (bad[1] + 1) % FR
    bad_proof = groth16_prove(pk, cs, bad)
    assert not groth16_verify(vk, bad_proof)


def test_secagg_legacy_structure_matches_dummy():
    params = SecaggLegacyParams(dim=8)
    a = build_structure(params)
    b = build_circuit(params, _legacy_inputs(params))
    assert len(a.constraints) == len(b.constraints)
    assert a.n_wires == b.n_wires


# ---------------------------------------------------------------------------
# C12: tiny demo training circuits
# ---------------------------------------------------------------------------

def _tiny_inputs(params: TinyParams):
    B, D, DEPTH = params.batch_size, params.model_dim, params.depth
    n_leaves = 1 << DEPTH
    features = [[(i * D + j + 1) * 10 for j in range(D)] for i in range(n_leaves)]
    labels = [i % 2 for i in range(n_leaves)]
    if params.simple:
        leaves = [poseidon([labels[i]]) for i in range(n_leaves)]
    else:
        leaves = [vector_hash(features[i] + [labels[i]]) for i in range(n_leaves)]
    tree = MerkleTree(leaves, DEPTH)
    sib, idx = zip(*(tree.prove(i) for i in range(B)))
    gradient = [sum(features[i][j] for i in range(B)) % FR for j in range(D)]
    root_g = poseidon(gradient) if params.simple else vector_hash(gradient)
    return {
        "client_id": 1, "root_D": tree.root, "root_G": root_g,
        "alpha": 10, "tau": 1000,
        "weights_old": [0] * D,
        "features": features[:B], "labels": labels[:B],
        "siblings": list(sib), "pathIndices": list(idx),
    }


@pytest.mark.parametrize("simple", [False, True])
def test_tiny_training_satisfied(simple):
    params = TinyParams(simple=simple)
    cs = build_circuit(params, _tiny_inputs(params))
    assert cs.is_satisfied()
    assert len(cs.public_signals) == 5  # [client_id, root_D, root_G, alpha, tau]


@pytest.mark.parametrize("simple", [False, True])
def test_tiny_training_rejects_wrong_gradient_commitment(simple):
    params = TinyParams(simple=simple)
    inputs = _tiny_inputs(params)
    inputs["root_G"] = (inputs["root_G"] + 1) % FR
    assert not build_circuit(params, inputs).is_satisfied()


def test_tiny_training_rejects_foreign_sample():
    params = TinyParams()
    inputs = _tiny_inputs(params)
    inputs["features"][0][0] += 1  # not the committed leaf anymore
    assert not build_circuit(params, inputs).is_satisfied()


def test_tiny_dummy_structure_builds():
    for simple in (False, True):
        params = TinyParams(simple=simple)
        cs = build_structure(params)
        assert len(cs.constraints) > 0
        assert cs.stats()["public_inputs"] == 5


@pytest.mark.parametrize("simple", [False, True])
def test_tiny_structure_matches_real_inputs(simple):
    """Constraint count and wire count must be input-independent — the
    invariant trusted setup rests on (mirrors the legacy secagg parity
    test; ADVICE r1 #3)."""
    params = TinyParams(simple=simple)
    a = build_structure(params)
    b = build_circuit(params, _tiny_inputs(params))
    assert len(a.constraints) == len(b.constraints)
    assert a.n_wires == b.n_wires
