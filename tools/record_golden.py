"""Record golden reference vectors.

Runs every scenario in toyfhe_tpu.core.golden on the exact host engine at
the reference's literal parameter derivations and writes
tests/golden/reference_vectors.json. Committed output is the contract:
tests/test_reference_vectors.py fails if either the host engine or the
device RNS path stops reproducing it.

Usage:  env JAX_PLATFORMS=cpu python tools/record_golden.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toyfhe_tpu.core import golden as G


def main():
    out = {"seed": G.SEED, "scenarios": {}}
    for name, fn in G.SCENARIOS.items():
        t0 = time.time()
        out["scenarios"][name] = fn(G.SEED)
        print(f"{name}: recorded in {time.time() - t0:.1f}s", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "golden", "reference_vectors.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
