"""FL protocol layer: round simulation, binding checks, mask cancellation.

Fast tests exercise the server's verification logic with a stub prover
(protocol checks fire before any pairing); the slow test runs the complete
micro round with real Groth16 proofs end-to-end.
"""

import pytest

from zkfl_tpu.commit.vector_hash import derive_pairwise_mask
from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.fl import (
    MICRO_CONFIG,
    Client,
    ProofPackage,
    Server,
    SharedLCG,
    run_round,
    simulate_key_exchange,
)
from zkfl_tpu.fl.config import FLConfig


class StubProver:
    """Accepts every proof; isolates the server's protocol-level checks."""

    def verify_balance(self, proof):
        return True

    def verify_training(self, proof):
        return True

    def verify_secagg(self, proof):
        return True


def test_key_exchange_symmetric():
    keys = simulate_key_exchange(3)
    for i in keys:
        for j in keys[i]:
            assert keys[i][j] == keys[j][i]


def test_mask_cancellation():
    """sum of masked updates == sum of gradients mod p (the secagg
    invariant the reference asserts host-side,
    test_secure_aggregation.mjs:216-238)."""
    cfg = MICRO_CONFIG
    keys = simulate_key_exchange(cfg.num_clients)
    grads = {1: [5, -3], 2: [-2, 7], 3: [1, 1]}
    masked_sum = [0] * cfg.model_dim
    grad_sum = [0] * cfg.model_dim
    for i in range(1, cfg.num_clients + 1):
        masked = [g % FR for g in grads[i]]
        for j in range(1, cfg.num_clients + 1):
            if i == j:
                continue
            mask = derive_pairwise_mask(keys[i][j], 1, i, j, cfg.model_dim)
            sign = 1 if i < j else -1
            for k in range(cfg.model_dim):
                masked[k] = (masked[k] + sign * mask[k]) % FR
        for k in range(cfg.model_dim):
            masked_sum[k] = (masked_sum[k] + masked[k]) % FR
            grad_sum[k] = (grad_sum[k] + grads[i][k]) % FR
    assert masked_sum == grad_sum


def test_lcg_matches_reference_semantics():
    rng = SharedLCG(12345)
    # First draw for client 1: state = (12345*1103515245 + 12345 + 7919) & 0x7fffffff
    want = (12345 * 1103515245 + 12345 + 7919) & 0x7FFFFFFF
    rng.random(1)
    assert rng.state == want


def _stub_round_state():
    """Server + client state after commitments, with stubbed proofs."""
    cfg = MICRO_CONFIG
    server = Server(cfg, StubProver())
    server.initialize_model()
    rng = SharedLCG(cfg.seed)
    clients = [Client(i, cfg, None) for i in range(1, cfg.num_clients + 1)]
    for c in clients:
        server.register_client(c.client_id, c.generate_private_dataset(rng))
        server.receive_dataset_commitment(c.compute_dataset_commitment())
    return cfg, server, clients


def _fake_balance_pkg(c):
    sig = [c.client_id, c.root_d % FR, c.cfg.n, c.c0, c.c1]
    return ProofPackage(c.client_id, object(), sig, {"root_D": c.root_d, "c0": c.c0, "c1": c.c1})


def _fake_training_pkg(c, cfg, **overrides):
    grad, _, _ = c.compute_verified_gradient([0] * cfg.model_dim)
    from zkfl_tpu.commit.vector_hash import gradient_commitment, weight_commitment

    c.gradient = grad
    c.root_g = gradient_commitment([g % FR for g in grad], c.client_id, cfg.current_round)
    c.root_w = weight_commitment([0] * cfg.model_dim)
    fields = {
        "root_D": c.root_d, "root_G": c.root_g, "root_W": c.root_w,
        "round": cfg.current_round, "gradient": grad,
    }
    fields.update(overrides)
    sig = [
        c.client_id, cfg.current_round, fields["root_D"] % FR,
        fields["root_G"] % FR, fields["root_W"] % FR, cfg.tau_squared,
    ]
    return ProofPackage(c.client_id, object(), sig, fields)


def test_server_binding_and_hardening_checks():
    cfg, server, clients = _stub_round_state()
    c = clients[0]
    assert server.verify_balance_proof(_fake_balance_pkg(c))

    # Binding violation: training root_D differs from balance root_D.
    bad = _fake_training_pkg(c, cfg, root_D=(c.root_d + 1) % FR)
    bad.public_signals[2] = bad.root_D % FR
    assert not server.verify_training_proof(bad)
    assert server.results["binding"][c.client_id] is False

    # Honest package passes.
    good = _fake_training_pkg(c, cfg)
    assert server.verify_training_proof(good)

    # Gradient substitution: same publics, different submitted gradient ->
    # root_G recompute must catch it.
    cheat = _fake_training_pkg(c, cfg)
    cheat.fields["gradient"] = [g + 1 for g in cheat.fields["gradient"]]
    assert not server.verify_training_proof(cheat)

    # tau^2 policy violation.
    wrong_tau = _fake_training_pkg(c, cfg)
    wrong_tau.public_signals[5] = cfg.tau_squared + 1
    assert not server.verify_training_proof(wrong_tau)


def test_aggregation_gates_on_verified_clients():
    cfg, server, clients = _stub_round_state()
    assert server.aggregate_updates() is None  # nothing verified yet


@pytest.mark.slow
def test_micro_round_end_to_end():
    from zkfl_tpu.groth16.engine import HostEngine

    server, timings = run_round(MICRO_CONFIG, engine=HostEngine(), verbose=False)
    summary = server.get_summary()
    assert summary["all_passed"], (summary, server.log)
    assert summary["secagg"] == {"passed": 3, "total": 3}
    # Masks cancelled: aggregated gradient equals the mean of true gradients.
    assert server.aggregated_gradient is not None
