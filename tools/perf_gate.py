"""Performance regression gate.

Reads the one-line bench JSON (from a file argument or stdin) and
fails unless every pinned engine floor is met, each with a 10%
variance allowance for run-to-run TPU noise:

* headline (best f32 engine, double-Gauss): vs_baseline, round-3
  measured 49.6 (unrolled XLA after the polynomial-normal rewrite;
  Pallas 47.3) -> floor 46.0
* parity-grade df32: vs_target, measured 5.76 -> floor 5.0, and its
  spot-RMS parity must stay inside the 1e-9 target
* anamorphic df32 (closed-form cylinders): vs_target, measured
  6.68 -> floor 5.5, parity likewise

Usage:
    python bench.py | tee bench.json
    python tools/perf_gate.py bench.json
"""

import json
import sys

VARIANCE = 0.9  # tolerate 10% run-to-run noise

#: (json path, floor before variance)
RATE_FLOORS = [
    (("vs_baseline",), 46.0),
    (("details", "pallas_df32_parity_grade", "vs_target"), 5.0),
    (("details", "pallas_df32_anamorphic", "vs_target"), 5.5),
]
PARITY_KEYS = [
    ("details", "pallas_df32_parity_grade", "spot_rms_parity_vs_f64"),
    ("details", "pallas_df32_anamorphic", "spot_rms_parity_vs_f64"),
]
PARITY_TARGET = 1e-9


def _get(rec, path):
    for key in path:
        if not isinstance(rec, dict) or key not in rec:
            return None
        rec = rec[key]
    return rec


def main(argv):
    src = open(argv[0]) if argv else sys.stdin
    line = next(l for l in src if l.strip().startswith("{"))
    rec = json.loads(line)
    failed = False
    for path, floor in RATE_FLOORS:
        value = _get(rec, path)
        name = ".".join(path)
        if value is None:
            # CPU fallback runs omit the TPU rate sections
            print(f"{name}: absent (skipped)")
            continue
        lim = floor*VARIANCE
        print(f"{name} = {value:.2f} (floor {lim:.2f})")
        if value < lim:
            print(f"PERF REGRESSION: {name} {value:.2f} < {lim:.2f}",
                  file=sys.stderr)
            failed = True
    for path in PARITY_KEYS:
        value = _get(rec, path)
        name = ".".join(path)
        if value is None:
            print(f"{name}: absent (skipped)")
            continue
        print(f"{name} = {value:.2e} (target {PARITY_TARGET:.0e})")
        # NaN (e.g. a kernel that NaNs every ray) must FAIL, so test
        # for the good case and negate
        if not value <= PARITY_TARGET:
            print(f"PARITY REGRESSION: {name} {value:.2e} > "
                  f"{PARITY_TARGET:.0e}", file=sys.stderr)
            failed = True
    if failed:
        return 1
    print("perf gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
