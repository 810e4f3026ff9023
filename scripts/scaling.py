"""Dataset-size scaling curve (Report.pdf Table 5 counterpart).

The reference publishes per-client prove time (balance + training) at
N = 8/16/32/64/128: 14.1 / 28.3 / 56.7 / 114.2 / 231.5 s on the
i7-10750H — linear in N because snarkjs proving is single-threaded.  This
script reproduces the same sweep on one TPU chip through the fused device
pipeline: balance_unified(N, log2 N, 4) + sgd_verified(B=N, D=4) per
point, matching Table 5's constraint doubling (ref:Report.pdf §4.4 and
SURVEY §2.1 C5/C7 — at N=8 the two circuits are ~31k constraints).

Setups are disk-cached per N (the reference caches its .zkey artifacts the
same way); the recorded number is the STEADY prove (second run), next to
the first (compile-inclusive) one.

Run:  python scripts/scaling.py [--json-out=SCALING_r05.json] [--n=16,32,64]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(__file__), "..")))

BASELINE = {8: 14.1, 16: 28.3, 32: 56.7, 64: 114.2, 128: 231.5}


def run_point(n: int, cache_dir: str) -> dict:
    from zkfl_tpu.fl.client import Client, SharedLCG
    from zkfl_tpu.fl.config import FLConfig
    from zkfl_tpu.groth16.device_prover import PipelineProfile
    from zkfl_tpu.groth16.engine import JaxEngine
    from zkfl_tpu.groth16.prover import groth16_prove
    from zkfl_tpu.groth16.setup import setup_cached
    from zkfl_tpu.groth16.verifier import groth16_verify
    from zkfl_tpu.r1cs.circuits import build_structure, generate_witness

    depth = int(math.log2(n))
    cfg = FLConfig(n=n, depth=depth, model_dim=4, batch_size=n,
                   artifacts_dir=cache_dir)
    out = {"n": n}

    t0 = time.time()
    bal_cs = build_structure(cfg.balance_params)
    tr_cs = build_structure(cfg.training_params)
    out["constraints"] = len(bal_cs.constraints) + len(tr_cs.constraints)
    out["structures_s"] = round(time.time() - t0, 1)

    engine = JaxEngine(profile=PipelineProfile.cover([bal_cs, tr_cs]))
    t0 = time.time()
    bal_pk, bal_vk = setup_cached(bal_cs, cache_dir, domain=engine.profile.domain)
    tr_pk, tr_vk = setup_cached(tr_cs, cache_dir, domain=engine.profile.domain)
    out["setups_s"] = round(time.time() - t0, 1)

    client = Client(1, cfg, None)
    rng = SharedLCG(cfg.seed)
    client.generate_private_dataset(rng)
    client.compute_dataset_commitment()
    sib, idx = client._merkle_paths(cfg.n)
    bal_inputs = {
        "client_id": 1, "root": client.root_d, "N_public": cfg.n,
        "c0": client.c0, "c1": client.c1,
        "features": client.features, "labels": client.labels,
        "siblings": sib, "pathIndices": idx,
    }
    t0 = time.time()
    bal_wit = generate_witness(cfg.balance_params, bal_inputs).witness
    model = [0] * cfg.model_dim
    tr_wit = client.training_witness(model)  # already a witness list
    out["witness_s"] = round(time.time() - t0, 2)

    # first (compile-inclusive) and steady proves, both verified
    t0 = time.time()
    bp = groth16_prove(bal_pk, bal_cs, bal_wit, engine=engine)
    tp = groth16_prove(tr_pk, tr_cs, tr_wit, engine=engine)
    out["prove_first_s"] = round(time.time() - t0, 2)
    assert groth16_verify(bal_vk, bp) and groth16_verify(tr_vk, tp)

    t0 = time.time()
    bp = groth16_prove(bal_pk, bal_cs, bal_wit, engine=engine)
    tp = groth16_prove(tr_pk, tr_cs, tr_wit, engine=engine)
    out["prove_s"] = round(time.time() - t0, 3)
    assert groth16_verify(bal_vk, bp) and groth16_verify(tr_vk, tp)

    out["baseline_s"] = BASELINE.get(n)
    if out["baseline_s"]:
        out["vs_baseline"] = round(out["baseline_s"] / out["prove_s"], 2)
    return out


def main():
    from zkfl_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()
    ns = [16, 32, 64]
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            ns = [int(x) for x in a.split("=", 1)[1].split(",")]
    cache_dir = os.path.expanduser("~/.cache/zkfl_scaling_artifacts")
    os.makedirs(cache_dir, exist_ok=True)
    points = []
    for n in ns:
        print(f"# === N={n} ===", flush=True)
        p = run_point(n, cache_dir)
        print(json.dumps(p), flush=True)
        points.append(p)
    result = {"points": points, "baseline": BASELINE,
              "note": "prove_s = steady balance+training prove on 1 TPU chip"}
    out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                if a.startswith("--json-out=")), None)
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"# wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
