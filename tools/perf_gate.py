"""Performance regression gate.

Reads the one-line bench JSON (from a file argument or stdin) and
fails unless `vs_baseline` meets the pinned floor.  The fused-engine
guard (Pallas headline, round 2: vs_baseline 41.8) is
enforced here with a 10% variance allowance for run-to-run TPU noise.

Usage:
    python bench.py | tee bench.json
    python tools/perf_gate.py bench.json
"""

import json
import sys

FLOOR = 41.0
VARIANCE = 0.9  # tolerate 10% run-to-run noise


def main(argv):
    src = open(argv[0]) if argv else sys.stdin
    line = next(l for l in src if l.strip().startswith("{"))
    rec = json.loads(line)
    vs = rec["vs_baseline"]
    floor = FLOOR * VARIANCE
    print(f"vs_baseline = {vs:.2f} (floor {floor:.2f})")
    if vs < floor:
        print(f"PERF REGRESSION: vs_baseline {vs:.2f} < {floor:.2f}",
              file=sys.stderr)
        return 1
    print("perf gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
