"""8-client verifiable FL round on the chip (BASELINE.json config 4).

The reference proves clients strictly sequentially (~14.1 s/client => a
3-client round is 43 s, Report.pdf Table 4; 8 clients would extrapolate to
~115 s).  Here the whole round proves each phase's 8 client witnesses as
ONE batched fused device program (groth16_prove_many), so the marginal
client cost is the batched-MSM lane increment, not a full proof.

Run:  python scripts/round8.py [--json-out=ROUND8_r04.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    from zkfl_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()

    from zkfl_tpu.fl.config import FLConfig
    from zkfl_tpu.fl.prover import RoundProver
    from zkfl_tpu.fl.simulation import run_round

    cfg = FLConfig(num_clients=8)
    t0 = time.time()
    prover = RoundProver(cfg)
    print(f"# setups ready in {time.time()-t0:.1f}s "
          f"(profile {prover.engine.profile})", flush=True)

    t0 = time.time()
    server, warm = run_round(cfg, prover=prover, verbose=False)
    print(f"# warm-up round (compile+run) {warm['total']:.1f}s", flush=True)
    assert server.get_summary()["all_passed"]

    server, timings = run_round(cfg, prover=prover, verbose=False)
    assert server.get_summary()["all_passed"]
    per_client = (
        timings["balance_proofs"] + timings["training_proofs"]
        + timings["secagg_proofs"]
    ) / cfg.num_clients
    result = {
        "num_clients": 8,
        "proofs": 24,
        "round_s": round(timings["total"], 2),
        "prove_per_client_s": round(per_client, 3),
        "baseline_3client_round_s": 43.0,
        "baseline_prove_per_client_s": 14.1,
        "prove_per_client_vs_baseline": round(14.1 / per_client, 2),
        "phases_s": {k: round(v, 3) for k, v in timings.items()},
    }
    print(json.dumps(result), flush=True)
    out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                if a.startswith("--json-out=")), None)
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
