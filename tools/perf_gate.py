"""Performance regression gate.

Reads the one-line bench JSON (from a file argument or stdin) and
fails unless every pinned engine floor is met.  Floors are ABSOLUTE
(no multiplicative variance allowance): each is set ~10-15% under the
round-4 measured best so that ordinary run-to-run tunnel noise --
whose observed spread is recorded per row in the JSON as
times_s/median_time_s/spread by bench.py's 5-rep timing -- cannot
trip it, while a real regression does.  When a floor fails, compare
the row's median/spread against the previous BENCH_r*.json before
blaming the code: spread > ~20% means the tunnel was sick, rerun.

* headline (best f32 engine, double-Gauss): vs_baseline; measured
  49.6 (r3 mid-round) / 47.8 (r3 driver) / 49.x (r4) -> floor 43
* parity-grade df32: vs_target, measured 5.8-6.8 across rounds ->
  floor 5.0; spot-RMS parity must stay inside the 1e-9 target
* anamorphic df32 (closed-form cylinders): measured 6.7-7.4 ->
  floor 5.5, parity likewise
* df32 fused merit mode (round 4): vs_target -> floor 5.0, parity
  likewise
* grad_step (value_and_grad of the spot-RMS merit, round 4):
  single-dispatch step measured 0.78 (the ~40 ms tunnel roundtrip is
  60% of a 2^22-ray step) -> floor 0.6; the FUSED path (jit_steps=4,
  one dispatch per 4 steps) must clear the 1e9 north-star target
  itself -> floor 1.0

Usage:
    python bench.py | tee bench.json
    python tools/perf_gate.py bench.json
"""

import json
import sys

#: (json path, absolute floor)
RATE_FLOORS = [
    (("vs_baseline",), 43.0),
    # the Pallas engine's own floor (round-5; previously only the
    # best-of headline was gated, so a Pallas-only regression could
    # hide behind the XLA chain): measured 47.3-48.8 across rounds
    (("details", "pallas_f32", "rate_vs_target"), 42.0),
    # shard_map twin of the SAME 8-chained workload (round-5): the
    # gap vs pallas_f32 is pure shard_map overhead, expected < ~10%
    (("details", "pallas_f32_sharded_mesh1", "vs_baseline"), 42.0),
    (("details", "pallas_df32_parity_grade", "vs_target"), 5.0),
    (("details", "pallas_df32_anamorphic", "vs_target"), 5.5),
    (("details", "pallas_df32_merit", "vs_target"), 5.0),
    (("details", "grad_step", "vs_target"), 0.6),
    (("details", "grad_step_fused", "vs_target"), 1.0),
    # analytic-adjoint merit kernel (2^23 rays, the XLA-OOM
    # boundary): measured 3.28 single / 7.07 fused on the round-4
    # geometry, 2.48 / 6.50 on the published-gap round-5 double Gauss
    (("details", "grad_step_adjoint", "vs_target"), 2.2),
    (("details", "grad_step_adjoint_fused", "vs_target"), 5.0),
    # polychromatic 3-chain adjoint (round-5): counts nlam
    # intersections per ray per surface; floor set 15% under the
    # round-5 measurement
    (("details", "grad_step_adjoint_poly", "vs_target"), 4.8),
    # wavefront (per-ray OPD) adjoint (round-5)
    (("details", "grad_step_wavefront_adjoint", "vs_target"), 2.0),
    # realistic composite design step (round-5): 9 aimed spot bundles
    # + wavefront + first-order penalty on the adjoint kernels, fused
    # jit_steps=4; dispatch/latency-bound, so the gate pins steps/s
    # (measured 110/s round 5)
    (("details", "design_merit_step", "steps_per_s"), 80.0),
]
PARITY_KEYS = [
    (("details", "pallas_df32_parity_grade",
      "spot_rms_parity_vs_f64"), 1e-9),
    (("details", "pallas_df32_anamorphic",
      "spot_rms_parity_vs_f64"), 1e-9),
    (("details", "pallas_df32_merit",
      "spot_rms_parity_vs_f64"), 1e-9),
    # gradient of the merit wrt curvature+distance, emulated f64 on
    # the chip vs CPU f64 (relative L2 over all parameters)
    (("details", "grad_step", "grad_rel_err_f64_vs_cpu"), 1e-9),
    # analytic-adjoint Pallas kernel (f32) vs CPU f64 with the SAME
    # gradient semantics (specialized engine reference; flat rows'
    # curvature is baked out by design).  The f32 chained-VJP noise
    # is geometry-dependent: 3.8e-7 on the round-4 double Gauss,
    # 7.1e-5 on the published-gap round-5 geometry -- the threshold
    # bounds f32 conditioning, not algorithm drift (the algorithm is
    # pinned at 1e-9 in f64 interpret tests)
    (("details", "grad_step_adjoint",
      "grad_rel_err_f32_vs_cpu_spec_ref"), 5e-4),
    (("details", "grad_step_adjoint_poly",
      "grad_rel_err_f32_vs_xla_f64_ref"), 5e-4),
    # per-ray OPD gradients difference big path terms at wavelength
    # scale: f32 cancellation noise measured 2.2e-3 (round 5)
    (("details", "grad_step_wavefront_adjoint",
      "grad_rel_err_f32_vs_cpu_spec_ref"), 1e-2),
    # composite adjoint merit vs CPU f64 scan: dominated by the f32
    # wavefront term's OPD rounding (the XLA-f32-on-TPU variant is
    # unusable at ~1e2 rel -- approximate hardware sqrt/div in the
    # path sums; the Mosaic adjoint kernels are exact-ops f32)
    (("details", "design_merit_step",
      "value_rel_err_f32_vs_cpu_f64"), 5e-3),
    (("details", "design_merit_step",
      "grad_rel_err_f32_vs_cpu_f64_live"), 1e-2),
]


def _get(rec, path):
    for key in path:
        if not isinstance(rec, dict) or key not in rec:
            return None
        rec = rec[key]
    return rec


def main(argv):
    text = (open(argv[0]).read() if argv else sys.stdin.read())
    try:
        # whole-file JSON (e.g. the driver's pretty-printed BENCH_r*)
        rec = json.loads(text)
    except json.JSONDecodeError:
        # bench.py | tee output: the record is the first "{" line
        line = next(l for l in text.splitlines()
                    if l.strip().startswith("{"))
        rec = json.loads(line)
    if "parsed" in rec and "metric" not in rec:
        rec = rec["parsed"]
    failed = False
    sick = _get(rec, ("details", "tunnel_sick_rows")) or []
    if sick:
        print("TUNNEL-SICK rows (5-rep spread > 20%% -- floor misses "
              "below may be noise; rerun before blaming code): %s"
              % ", ".join(sick))
    for path, floor in RATE_FLOORS:
        value = _get(rec, path)
        name = ".".join(path)
        if value is None:
            # CPU fallback runs omit the TPU rate sections
            print(f"{name}: absent (skipped)")
            continue
        print(f"{name} = {value:.2f} (floor {floor:.2f})")
        if value < floor:
            print(f"PERF REGRESSION: {name} {value:.2f} < {floor:.2f}",
                  file=sys.stderr)
            failed = True
    for path, target in PARITY_KEYS:
        value = _get(rec, path)
        name = ".".join(path)
        if value is None:
            print(f"{name}: absent (skipped)")
            continue
        print(f"{name} = {value:.2e} (target {target:.0e})")
        # NaN (e.g. a kernel that NaNs every ray) must FAIL, so test
        # for the good case and negate
        if not value <= target:
            print(f"PARITY REGRESSION: {name} {value:.2e} > "
                  f"{target:.0e}", file=sys.stderr)
            failed = True
    if failed:
        return 1
    print("perf gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
