"""Prewarm the AOT executable cache for the reference-config round.

Builds the three reference-dims setups (disk-cached), then traces +
compiles + serializes the fused prove pipeline executable for client
batches B=1 (single prove: the bench headline) and B=3 (the 3-client
round batched per circuit).  All three circuits share one PipelineProfile
(identical shapes), so each batch size is ONE artifact covering
balance/training/secagg.

Run on the real TPU:  python scripts/aot_prewarm.py
Verify a fresh process loads it:  python bench.py  (prove < ~30 s)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.normpath(os.path.join(os.path.dirname(__file__), "..")))

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    from zkfl_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()

    from zkfl_tpu.fl.config import REFERENCE_CONFIG
    from zkfl_tpu.fl.prover import RoundProver
    from zkfl_tpu.groth16.device_prover import device_prover

    prover = RoundProver(REFERENCE_CONFIG)
    log(f"setups ready (profile {prover.engine.profile})")
    dp = device_prover(
        prover.balance_pk, prover.balance_cs, prover.engine.profile
    )
    batches = [int(b) for b in (sys.argv[1:] or ["1", "3"])]
    for b in batches:
        t0 = time.time()
        dp.aot_prewarm(batch=b)
        log(f"B={b} prewarmed in {time.time()-t0:.1f} s")
    log("done")


if __name__ == "__main__":
    main()
