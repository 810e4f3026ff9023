"""Benchmark: reference-size balance proof (Component A) on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: snarkjs `groth16 prove` for balance_unified(8,3,4) = 4.2 s on the
reference hardware (Report.pdf Table 3; BASELINE.md).  value = our wall
time for the same statement (witness -> proof, steady-state: compile
cached); vs_baseline = baseline / ours (>1 means faster than reference).

The proof is verified with the native pairing check before reporting.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_PROVE_S = 4.2  # Report.pdf Table 3, balance circuit


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-ever run pays the (remote)
    compiles; every later bench run starts hot."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/zkfl_jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> int:
    _enable_compile_cache()
    t_total = time.time()
    from zkfl_tpu.fl.client import Client, SharedLCG
    from zkfl_tpu.fl.config import REFERENCE_CONFIG
    from zkfl_tpu.groth16.engine import JaxEngine
    from zkfl_tpu.groth16.prover import groth16_prove
    from zkfl_tpu.groth16.setup import setup_cached
    from zkfl_tpu.groth16.verifier import groth16_verify
    from zkfl_tpu.r1cs.circuits import build_structure, generate_witness

    cfg = REFERENCE_CONFIG
    cs = build_structure(cfg.balance_params)
    pk, vk = setup_cached(cs, cfg.artifacts_dir)
    print(f"# setup ready ({time.time()-t_total:.1f}s)", file=sys.stderr)

    # Build the canonical client-1 witness (deterministic seeds).
    client = Client(1, cfg, None)
    rng = SharedLCG(cfg.seed)
    client.generate_private_dataset(rng)
    client.compute_dataset_commitment()
    sib, idx = client._merkle_paths(cfg.n)
    inputs = {
        "client_id": 1, "root": client.root_d, "N_public": cfg.n,
        "c0": client.c0, "c1": client.c1,
        "features": client.features, "labels": client.labels,
        "siblings": sib, "pathIndices": idx,
    }
    t0 = time.time()
    wit = generate_witness(cfg.balance_params, inputs)
    t_witness = time.time() - t0
    print(f"# witness {t_witness*1e3:.0f} ms", file=sys.stderr)

    engine = JaxEngine()
    # Warm-up run compiles every kernel shape (cached for later runs).
    t0 = time.time()
    proof = groth16_prove(pk, cs, wit.witness, engine=engine)
    t_first = time.time() - t0
    print(f"# prove (compile+run) {t_first:.1f} s", file=sys.stderr)
    if not groth16_verify(vk, proof):
        print(json.dumps({"metric": "balance_prove", "value": -1,
                          "unit": "s", "vs_baseline": 0,
                          "error": "proof failed verification"}))
        return 1

    # Steady-state timing.
    t0 = time.time()
    proof = groth16_prove(pk, cs, wit.witness, engine=engine)
    t_prove = time.time() - t0
    assert groth16_verify(vk, proof)

    print(json.dumps({
        "metric": "balance_unified(8,3,4) groth16 prove",
        "value": round(t_prove, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_PROVE_S / t_prove, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
