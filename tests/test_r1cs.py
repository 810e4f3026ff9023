"""R1CS builder, gadgets and the three ZK-FL circuits."""

import json

import pytest

from zkfl_tpu.commit.merkle import MerkleTree
from zkfl_tpu.commit.vector_hash import (
    derive_pairwise_mask,
    gradient_commitment,
    key_material_commitment,
    sample_hash,
    vector_hash,
)
from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.poseidon.reference import poseidon
from zkfl_tpu.r1cs.balance import BalanceParams
from zkfl_tpu.r1cs.builder import ConstraintSystem
from zkfl_tpu.r1cs.circuits import build_circuit, build_structure, dummy_inputs, generate_witness
from zkfl_tpu.r1cs.gadgets import less_than, num2bits, poseidon_gadget, vector_hash_gadget
from zkfl_tpu.r1cs.secagg import SecaggParams
from zkfl_tpu.r1cs.training import TrainingParams

V5_VECTOR = "/root/reference/data/test_input_v5.json"


# ---------------------------------------------------------------------------
# gadgets
# ---------------------------------------------------------------------------

def test_num2bits():
    cs = ConstraintSystem()
    v = cs.private_input("v", 0b1011)
    bits = num2bits(cs, v, 4)
    assert [b.value for b in bits] == [1, 1, 0, 1]
    assert cs.is_satisfied()


def test_less_than_gadget():
    for a, b, expected in [(3, 5, 1), (5, 3, 0), (4, 4, 0), (0, 1, 1)]:
        cs = ConstraintSystem()
        av = cs.private_input("a", a)
        bv = cs.private_input("b", b)
        out = less_than(cs, av, bv, 8)
        assert out.value == expected, (a, b)
        assert cs.is_satisfied()


def test_poseidon_gadget_matches_reference():
    cs = ConstraintSystem()
    xs = cs.private_inputs("x", [7, 8, 9])
    out = poseidon_gadget(cs, xs)
    assert out.value == poseidon([7, 8, 9])
    assert cs.is_satisfied()
    # circom-comparable cost: ~243 constraints for t=4-ish widths
    assert len(cs.constraints) < 400


def test_vector_hash_gadget_chunked():
    vals = list(range(20))
    cs = ConstraintSystem()
    xs = cs.private_inputs("x", vals)
    out = vector_hash_gadget(cs, xs)
    assert out.value == vector_hash(vals)
    assert cs.is_satisfied()


# ---------------------------------------------------------------------------
# circuits (micro parameterisations keep tests fast)
# ---------------------------------------------------------------------------

def _micro_balance_inputs(params: BalanceParams, client_id=1):
    N, DIM = params.n, params.model_dim
    feats = [[(i * 7 + j * 3) % 101 for j in range(DIM)] for i in range(N)]
    labels = [i % 2 for i in range(N)]
    leaves = [sample_hash(feats[i], labels[i]) for i in range(N)]
    tree = MerkleTree(leaves, params.depth)
    proofs = [tree.prove(i) for i in range(N)]
    return {
        "client_id": client_id,
        "root": tree.root,
        "N_public": N,
        "c0": N - sum(labels),
        "c1": sum(labels),
        "features": feats,
        "labels": labels,
        "siblings": [p[0] for p in proofs],
        "pathIndices": [p[1] for p in proofs],
    }


def test_balance_circuit_satisfied():
    p = BalanceParams(n=4, depth=2, model_dim=2)
    cs = build_circuit(p, _micro_balance_inputs(p))
    assert cs.is_satisfied()
    assert cs.pub_names == ["client_id", "root", "N_public", "c0", "c1"]


def test_balance_circuit_rejects_wrong_count():
    p = BalanceParams(n=4, depth=2, model_dim=2)
    inp = _micro_balance_inputs(p)
    inp["c1"] = inp["c1"] + 1
    inp["c0"] = inp["c0"] - 1
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


def test_balance_circuit_rejects_foreign_sample():
    p = BalanceParams(n=4, depth=2, model_dim=2)
    inp = _micro_balance_inputs(p)
    inp["features"][0][0] += 1  # not in the committed tree
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


def test_witness_mode_matches_structure_mode():
    p = BalanceParams(n=4, depth=2, model_dim=2)
    inp = _micro_balance_inputs(p)
    full = build_circuit(p, inp)
    fast = generate_witness(p, inp)
    assert full.values == fast.values


def test_structure_independent_of_inputs():
    p = BalanceParams(n=4, depth=2, model_dim=2)
    s1 = build_structure(p)
    s2 = build_circuit(p, _micro_balance_inputs(p))
    assert len(s1.constraints) == len(s2.constraints)
    assert s1.n_wires == s2.n_wires
    assert s1.constraints == s2.constraints


def test_training_v5_reference_vector():
    """The reference's committed input satisfies our regenerated R1CS.

    Runs by DEFAULT (VERDICT r4 #9): this is the strongest compatibility
    oracle in the suite — the reference's canonical sgd_step_v5 vector
    (ref:data/test_input_v5.json) must satisfy the regenerated constraint
    system with the reference's own public signals."""
    with open(V5_VECTOR) as f:
        d = json.load(f)
    cs = build_circuit(TrainingParams(8, 16, 7, variant="v5"), d)
    assert cs.is_satisfied()
    assert cs.public_signals == [1, 1, int(d["root_D"]), int(d["root_G"]), 76014]


def _micro_training_inputs(params: TrainingParams):
    B, DIM, P = params.batch_size, params.model_dim, params.precision
    feats = [[(i + j + 1) % 7 for j in range(DIM)] for i in range(B)]
    labels = [i % 2 for i in range(B)]
    weights = [2, 3][:DIM] + [1] * max(0, DIM - 2)
    leaves = [sample_hash(feats[i], labels[i]) for i in range(B)]
    tree = MerkleTree(leaves, params.depth)
    proofs = [tree.prove(i) for i in range(B)]
    # circuit-exact fixed-point gradient (mirrors _computeVerifiedGradient)
    divisor = B * P
    summed = [0] * DIM
    for i in range(B):
        pred = sum(feats[i][j] * weights[j] for j in range(DIM))
        err = pred - labels[i] * P
        for j in range(DIM):
            summed[j] += err * feats[i][j]
    grad, rem = [], []
    for j in range(DIM):
        q = summed[j] // divisor
        grad.append(q)
        rem.append(summed[j] - q * divisor)
    grad_pos = [g if g > 0 else 0 for g in grad]
    grad_neg = [-g if g < 0 else 0 for g in grad]
    tau_sq = sum(g * g for g in grad) + 10
    gradient_field = [g % FR for g in grad]
    return {
        "client_id": 1,
        "round": 1,
        "root_D": tree.root,
        "root_G": gradient_commitment(gradient_field, 1, 1),
        "root_W": vector_hash(weights),
        "tauSquared": tau_sq,
        "weights": weights,
        "expectedSummedGrad": summed,
        "remainder": rem,
        "gradPos": grad_pos,
        "gradNeg": grad_neg,
        "features": feats,
        "labels": labels,
        "siblings": [p[0] for p in proofs],
        "pathIndices": [p[1] for p in proofs],
    }


def test_training_verified_circuit():
    p = TrainingParams(batch_size=2, model_dim=2, depth=1, variant="verified")
    cs = build_circuit(p, _micro_training_inputs(p))
    assert cs.is_satisfied()


def test_training_verified_rejects_wrong_gradient():
    p = TrainingParams(batch_size=2, model_dim=2, depth=1, variant="verified")
    inp = _micro_training_inputs(p)
    inp["gradPos"][0] += 1  # inflate gradient -> commitment + division break
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


def _micro_secagg_inputs(params: SecaggParams, client_id=1):
    DIM, PEERS = params.dim, params.num_peers
    grad = [3, (-2) % FR][:DIM] + [1] * max(0, DIM - 2)
    rnd = 1
    peer_ids = [j for j in range(1, PEERS + 2) if j != client_id][:PEERS]
    shared_keys = [poseidon([min(client_id, j), max(client_id, j), 12345]) for j in peer_ids]
    master_key = poseidon([client_id, 12345])
    masked = list(grad)
    for j, key in zip(peer_ids, shared_keys):
        mask = derive_pairwise_mask(key, rnd, client_id, j, DIM)
        sign = 1 if client_id < j else -1
        for k in range(DIM):
            masked[k] = (masked[k] + sign * mask[k]) % FR
    tau_sq = sum((g if g < FR // 2 else FR - g) ** 2 for g in grad)
    return {
        "client_id": client_id,
        "round": rnd,
        "root_D": 111,
        "root_G": gradient_commitment(grad, client_id, rnd),
        "root_W": 222,
        "root_K": key_material_commitment(master_key, shared_keys),
        "tauSquared": tau_sq,
        "masked_update": masked,
        "peer_ids": peer_ids,
        "gradient": grad,
        "master_key": master_key,
        "shared_keys": shared_keys,
    }


def test_secagg_circuit_satisfied():
    p = SecaggParams(dim=2, num_peers=2)
    cs = build_circuit(p, _micro_secagg_inputs(p))
    assert cs.is_satisfied()


def test_secagg_rejects_tampered_masked_update():
    p = SecaggParams(dim=2, num_peers=2)
    inp = _micro_secagg_inputs(p)
    inp["masked_update"][0] = (inp["masked_update"][0] + 1) % FR
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


def test_secagg_mask_cancellation():
    """Host-level invariant: sum of all clients' masked updates == sum of
    gradients (mirrors test_secure_aggregation.mjs:216-238)."""
    p = SecaggParams(dim=2, num_peers=2)
    total_masked = [0] * p.dim
    total_grad = [0] * p.dim
    for cid in (1, 2, 3):
        inp = _micro_secagg_inputs(p, client_id=cid)
        for k in range(p.dim):
            total_masked[k] = (total_masked[k] + inp["masked_update"][k]) % FR
            total_grad[k] = (total_grad[k] + inp["gradient"][k]) % FR
    assert total_masked == total_grad


def test_dummy_inputs_build_all_circuits():
    for params in (
        BalanceParams(2, 1, 2),
        TrainingParams(2, 2, 1, variant="verified"),
        TrainingParams(2, 2, 1, variant="v5"),
        TrainingParams(2, 2, 1, variant="quick"),
        SecaggParams(2, 2),
    ):
        cs = build_circuit(params, dummy_inputs(params))
        assert len(cs.constraints) > 0
