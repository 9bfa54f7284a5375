"""Headline benchmark: ray-surface intersection throughput on the
double-Gauss (BASELINE.json north star: >= 1e9 intersections/s/chip
with spot-RMS parity <= 1e-9 vs the float64 CPU trace).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
(vs_baseline is the ratio against the 1e9/s target).  Details go to
stderr and into the JSON "details" field:

* f32 headline: the best of the Pallas fused kernel and the
  XLA-unrolled chain (both are timed and logged; since the round-3
  polynomial-normal refract rewrite the XLA chain leads, 49.6 vs
  47.3 G/s).
* parity-grade rate: the Pallas df32 (double-single) engine -- full
  double-word arithmetic on the VPU; its spot-RMS agreement with the
  f64 trace is measured here on-device (target <= 1e-9, typical
  ~1e-13) and its throughput must independently clear 1e9/s.
* roofline: achieved HBM bandwidth and f32 FLOP rate from the
  compiled cost analysis against v5e nominal peaks (819 GB/s HBM;
  ~3.9 Tf32op/s VPU = 8x128 lanes x 4 ALUs x 940 MHz).

Method notes: the axon TPU tunnel has ~35 ms dispatch latency and a
multi-minute cold first compile, so the measurement (a) warms the
compiler with a trivial program, (b) uses large bundles, and (c)
chains several traces per dispatch to amortize the tunnel latency.
"""

import json
import sys
import time

import numpy as np


BASELINE_RATE = 1e9  # intersections/s/chip target (BASELINE.md)
HBM_PEAK = 819e9     # v5e HBM bytes/s (public)
VPU_PEAK = 3.85e12   # v5e f32 VPU op/s estimate (8*128*4 @ 940 MHz)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _tpu_reachable(timeout=420.):
    """Probe accelerator device discovery in a THROWAWAY subprocess:
    the axon tunnel, when unhealthy, HANGS jax.devices() forever
    (observed mid-round-3) rather than raising -- initializing it
    in-process would wedge the whole benchmark.  Returns False on
    hang/error so main() can pin the CPU backend and still emit its
    JSON line."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print('PLATFORM=' + d[0].platform)"],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        log("device probe timed out after %.0f s" % timeout)
        return False
    for line in r.stdout.splitlines():
        if line.startswith("PLATFORM="):
            log("device probe:", line)
            return line != "PLATFORM=cpu"
    log("device probe failed (rc=%s): %s" % (r.returncode,
                                             r.stderr[-400:]))
    return False


def main():
    import os

    tpu_ok = _tpu_reachable()
    if not tpu_ok:
        log("accelerator unreachable: falling back to the CPU "
            "backend (rates will NOT be representative; rerun when "
            "the TPU tunnel recovers)")
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax
    if not tpu_ok:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception as e:
            log("cpu pin failed:", e)

    # persist compiled executables across bench runs/rounds: the
    # XLA-unrolled chain costs ~6 min of remote-compiler time cold
    # (round-2 bench tail); warm runs reload it in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(
        __file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.)
    except Exception as e:
        log("compilation cache unavailable:", e)

    import jax.numpy as jnp
    import rayopt_tpu  # noqa: F401  (enables x64)
    from rayopt_tpu.models import double_gauss, anamorphic_pair
    from rayopt_tpu.ops.geometric import (
        trace_components_final, trace_rays_final)
    from rayopt_tpu.ops.pallas_trace import pallas_trace_final
    from rayopt_tpu.ops.kernels import specialize
    from rayopt_tpu.ops import df32

    backend = jax.default_backend()
    log("backend:", backend, jax.devices())

    s = double_gauss()
    tab64 = s.table()
    specs = specialize(tab64)
    steps = df32.plan(tab64, fast=True)
    steps_exact = df32.plan(tab64)
    nsurf = tab64.curvature.shape[0] - 1
    dtype = np.float32
    tab = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype=dtype), tab64)

    on_tpu = backend == "tpu"
    n = 1 << 27 if on_tpu else 1 << 18
    chain = 8
    # parity seed rays get their OWN stream: they must stay identical
    # across rounds regardless of how the timing bundle is generated
    # (the round-3 on-device rewrite shifted a shared stream once --
    # recorded parity details before/after are not comparable)
    rng = np.random.RandomState(0)
    log("warming the compiler (the FIRST compile in a process is the "
        "remote cold start and can take minutes)...")
    t0 = time.perf_counter()
    float(jax.jit(lambda x: x*2 + 1)(jnp.ones(8))[0])
    log("trivial jit: %.1f s" % (time.perf_counter() - t0))
    # generate the big timing bundle ON DEVICE (the tunnel moves
    # single-digit MB/s; shipping ~1 GB of host seeds used to cost
    # minutes and could outlast the driver's clock)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    comps = (jax.random.uniform(kx, (n,), dtype, -11.6, 11.6),
             jax.random.uniform(ky, (n,), dtype, -11.6, 11.6),
             jnp.zeros(n, dtype), jnp.zeros(n, dtype),
             jnp.zeros(n, dtype), jnp.ones(n, dtype))
    # block_until_ready does NOT synchronize on the tunnel backend
    # (CLAUDE.md); fetch a scalar to be sure the bundle exists
    float(comps[0][0])

    def chain_of(trace_one):
        def fn(state):
            acc = 0.
            for _ in range(chain):
                out, t = trace_one(state)
                acc = acc + jnp.nanmean(out[0]**2 + out[1]**2)
                state = (out[0]*1e-3, out[1]*1e-3, state[2],
                         state[3], state[4], state[5])
            return acc
        return jax.jit(fn)

    # The fully-unrolled XLA chain costs ~6 min of remote-compiler
    # time per process (the persistent cache does not cover the
    # tunnel backend's AOT compile), but it is the real XLA engine
    # number: the scan variant compiles in ~2 min yet runs 8.5x
    # slower (3.5 vs 29.8 G/s -- loop-carried state round-trips HBM
    # per surface).  BENCH_XLA_UNROLL=0 opts into the cheap scan
    # variant; the Pallas kernel is the headline either way.
    unroll_xla = os.environ.get("BENCH_XLA_UNROLL", "1") != "0"
    xla_chain = chain_of(lambda st: trace_components_final(
        tab, st, specs=specs if unroll_xla else None,
        unroll=on_tpu and unroll_xla))
    engines = [("xla_f32", xla_chain)]
    if on_tpu:
        # tile=16k measured fastest across the 2^25..2^27 x 8k..64k
        # sweep (docs/STATUS.md)
        engines.append(("pallas_f32", chain_of(
            lambda st: pallas_trace_final(tab, st, specs=specs,
                                          tile=16*1024))))

    def best_of(fn, arg, k=5, stats=None):
        """Best of k timed reps (compile+first excluded).  When a
        `stats` dict is passed, the full rep list, median, and spread
        land in it -- the per-round trend data the gate uses to judge
        whether a floor miss is noise or regression."""
        t0 = time.perf_counter()
        v = float(fn(arg))
        log("  compile+first: %.1f s (value %.6g)"
            % (time.perf_counter() - t0, v))
        times = []
        for _ in range(k):
            t0 = time.perf_counter()
            fn(arg)
            times.append(time.perf_counter() - t0)
        if stats is not None:
            ts = sorted(times)
            stats["times_s"] = times
            stats["median_time_s"] = ts[len(ts)//2]
            stats["spread"] = (ts[-1] - ts[0])/ts[0]
            # spread > ~20% = the tunnel was sick during this row;
            # recorded HERE so downstream consumers (perf_gate, the
            # judge) see it in the JSON instead of re-deriving it
            stats["tunnel_sick"] = stats["spread"] > 0.2
        return min(times)

    details = {"config": "double_gauss f/2.8 (12 traced surfaces)",
               "rays": n, "chained_traces": chain, "backend": backend,
               "xla_variant": "unrolled" if unroll_xla else "scan"}
    if not tpu_ok:
        details["tpu_unreachable"] = True
    rates = {}
    import os
    profile_dir = os.environ.get("BENCH_PROFILE")
    for name, fn in engines:
        log("timing %s..." % name)
        stats = {}
        tb = best_of(lambda a, fn=fn: float(fn(a)), comps,
                     stats=stats)
        rates[name] = chain*n*nsurf/tb
        details[name] = {"best_time_s": tb, "rate": rates[name],
                         "rate_vs_target": rates[name]/BASELINE_RATE,
                         **stats}
        log("  %s: %.1f ms -> %.3f G intersections/s"
            % (name, tb*1e3, rates[name]/1e9))
        if profile_dir:
            # BENCH_PROFILE=<dir>: capture an xprof device trace of
            # one timed run per engine for roofline inspection
            from rayopt_tpu.utils.profiling import xprof
            with xprof(os.path.join(profile_dir, name)):
                float(fn(comps))
            log("  profile written to %s/%s" % (profile_dir, name))

    headline = max(rates.values())
    details["f32_engine"] = max(rates, key=rates.get)

    # roofline: cost analysis of the XLA chain (the Pallas kernel body
    # is opaque to HLO cost analysis; the UNROLLED XLA variant runs
    # the same fused math, so its flop count applies -- the scan
    # variant's HLO describes the loop machinery, not the engine, and
    # would yield meaningless utilization numbers)
    if not unroll_xla:
        log("roofline skipped (scan XLA variant; set "
            "BENCH_XLA_UNROLL=1)")
    try:
        if not unroll_xla:
            raise RuntimeError("scan variant: no roofline")
        ca = xla_chain.lower(comps).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.))
        nbytes = float(ca.get("bytes accessed", 0.))
        tb = details["xla_f32"]["best_time_s"]
        details["roofline"] = {
            "flops_per_chain": flops,
            "bytes_per_chain": nbytes,
            "achieved_fp32_tflops": flops/tb/1e12,
            "achieved_hbm_gbps": nbytes/tb/1e9,
            "hbm_utilization": nbytes/tb/HBM_PEAK,
            "vpu_utilization_est": flops/tb/VPU_PEAK,
            "assumptions": "v5e 819 GB/s HBM, ~3.85e12 f32 op/s VPU",
        }
        log("roofline (xla_f32): %.2f Tflop/s (%.0f%% VPU est), "
            "%.0f GB/s (%.0f%% HBM)" % (
                flops/tb/1e12, 100*flops/tb/VPU_PEAK,
                nbytes/tb/1e9, 100*nbytes/tb/HBM_PEAK))
    except Exception as e:
        log("cost analysis unavailable:", e)

    # chromatic multi-wavelength f32 kernel: one ray tile traced
    # through all 3 wavelength tables while VMEM-resident (the HBM
    # lever for chromatic merits: rays read once for all colors)
    if on_tpu:
        # non-fatal: a failure here must not cost the parity-grade
        # measurements below
        try:
            from rayopt_tpu.ops.pallas_trace import pallas_trace_multi
            tabs3 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype=dtype), s.tables())
            nlam = int(np.asarray(tabs3.curvature).shape[0])

            def multi_merit(st):
                mom = pallas_trace_multi(tabs3, st, tile=16*1024,
                                         merit=True)
                return sum(mo[3] + mo[4] for mo in mom)
            multi_merit = jax.jit(multi_merit)
            log("timing pallas_f32_multi (chromatic, %d "
                "wavelengths)..." % nlam)
            tb = best_of(lambda a: float(multi_merit(a)), comps)
            rate_m = n*nsurf*nlam/tb
            details["pallas_f32_multi"] = {
                "wavelengths": nlam, "best_time_s": tb,
                "rate": rate_m}
            log("  pallas_f32_multi: %.1f ms -> %.3f G "
                "intersections/s (x%d colors per HBM read)"
                % (tb*1e3, rate_m/1e9, nlam))
        except Exception as e:
            log("pallas_f32_multi failed (non-fatal):", e)
            details["pallas_f32_multi"] = {"error": str(e)}

    # parity-grade engine: Pallas df32 -- throughput and on-device
    # spot-RMS parity vs the f64 trace
    m = 8192
    yp = np.zeros((m, 3))
    yp[:, :2] = rng.uniform(-1, 1, (m, 2))*11.6
    up = np.zeros((m, 3))
    up[:, 2] = 1.

    def rms_xy(px, py):
        good = np.isfinite(px) & np.isfinite(py)
        px, py = px[good], py[good]
        return float(np.sqrt(((px - px.mean())**2 +
                              (py - py.mean())**2).mean()))

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        yf_cpu = np.asarray(trace_rays_final(tab64, yp, up)[0])
    r_cpu = rms_xy(yf_cpu[:, 0], yf_cpu[:, 1])

    def time_df32_chain(steps_l, nsurf_l, seed_y, seed_u, label):
        # df32 carries 2x the arrays; measure at 2^25 to stay well
        # inside HBM next to the f32 buffers (rate is size-stable)
        n_df = 1 << 25
        reps = n_df // seed_y.shape[0]
        # ship only the (m,) seed over the tunnel; replicate to the
        # timing size on device (a ~1.6 GB host->device transfer here
        # took >10 min on a slow tunnel and could hang the bench)
        state_df = jax.tree_util.tree_map(
            jnp.asarray, df32.state_from_f64(seed_y, seed_u))
        state_df = jax.jit(
            lambda s: jax.tree_util.tree_map(
                lambda a: jnp.tile(a, reps), s))(state_df)
        # scalar fetch: block_until_ready is a no-op on the tunnel
        float(state_df[0][0][0])

        def df_chain(state):
            acc = 0.
            for _ in range(chain):
                out = df32.pallas_trace_df32(steps_l, state,
                                             tile=8*1024)
                acc = acc + jnp.nanmean(out[0][0]**2 + out[1][0]**2)
                state = ((out[0][0]*np.float32(1e-3),
                          out[0][1]*np.float32(1e-3)),
                         (out[1][0]*np.float32(1e-3),
                          out[1][1]*np.float32(1e-3)),
                         state[2], state[3], state[4], state[5])
            return acc
        df_chain = jax.jit(df_chain)
        log("timing %s..." % label)
        stats = {}
        tb = best_of(lambda a: float(df_chain(a)), state_df,
                     stats=stats)
        rate = chain*n_df*nsurf_l/tb
        log("  %s: %.1f ms -> %.3f G intersections/s (>= 1e9 "
            "target: %s)" % (label, tb*1e3, rate/1e9, rate >= 1e9))
        return tb, rate, stats

    if on_tpu:
        out = df32.pallas_trace_df32(steps, df32.state_from_f64(yp, up))
        r_df = rms_xy(df32.to_f64(out[0]), df32.to_f64(out[1]))
        parity = abs(r_df - r_cpu)/max(r_cpu, 1e-30)
        out_e = df32.pallas_trace_df32(steps_exact,
                                       df32.state_from_f64(yp, up))
        r_e = rms_xy(df32.to_f64(out_e[0]), df32.to_f64(out_e[1]))
        parity_exact = abs(r_e - r_cpu)/max(r_cpu, 1e-30)
        log("df32 spot RMS parity vs f64 CPU: fast %.3g, exact %.3g "
            "(f64 %.15g)" % (parity, parity_exact, r_cpu))

        tb, rate_df, st_df = time_df32_chain(
            steps, nsurf, yp, up, "pallas_df32 (parity-grade)")
        details["pallas_df32_parity_grade"] = {
            "best_time_s": tb, "rate": rate_df,
            "vs_target": rate_df/BASELINE_RATE,
            "spot_rms_parity_vs_f64": parity,
            "mode": "fast (one-round div/sqrt refinements)",
            "spot_rms_parity_exact_mode": parity_exact,
            **st_df,
        }
    else:
        # CPU fallback: verify the df32 algorithm eagerly
        out = df32.trace_df32_final(steps, df32.state_from_f64(yp, up))
        r_df = rms_xy(df32.to_f64(out[0]), df32.to_f64(out[1]))
        parity = abs(r_df - r_cpu)/max(r_cpu, 1e-30)
        log("df32 (eager) spot RMS parity: %.3g" % parity)
        details["pallas_df32_parity_grade"] = {
            "spot_rms_parity_vs_f64": parity}

    # extended vocabulary: cylindrical-anamorphic config -- the df32
    # closed-form cylinder rows and the spec-dispatched Pallas f32
    # path must both clear the target on anamorphic systems too
    sa = anamorphic_pair()
    tab_a64 = sa.table()
    specs_a = specialize(tab_a64)
    steps_a = df32.plan(tab_a64, fast=True)
    nsurf_a = tab_a64.curvature.shape[0] - 1
    ya = np.zeros((m, 3))
    ya[:, :2] = rng.uniform(-1, 1, (m, 2))*4.
    ua = np.zeros((m, 3))
    ua[:, 2] = 1.
    with jax.default_device(cpu):
        yf_a = np.asarray(trace_rays_final(tab_a64, ya, ua,
                                           biconic=True)[0])
    r_a_cpu = rms_xy(yf_a[:, 0], yf_a[:, 1])
    if on_tpu:
        out_a = df32.pallas_trace_df32(steps_a,
                                       df32.state_from_f64(ya, ua))
        r_a = rms_xy(df32.to_f64(out_a[0]), df32.to_f64(out_a[1]))
        parity_a = abs(r_a - r_a_cpu)/max(r_a_cpu, 1e-30)
        log("anamorphic df32 spot RMS parity vs f64 CPU: %.3g"
            % parity_a)
        tb, rate_a, st_a = time_df32_chain(
            steps_a, nsurf_a, ya, ua, "pallas_df32 anamorphic")
        details["pallas_df32_anamorphic"] = {
            "config": "crossed-cylinder pair (5 traced surfaces)",
            "best_time_s": tb, "rate": rate_a,
            "vs_target": rate_a/BASELINE_RATE,
            "spot_rms_parity_vs_f64": parity_a,
            **st_a,
        }
        tab_a32 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype=dtype), tab_a64)
        fa = chain_of(lambda st: pallas_trace_final(
            tab_a32, st, specs=specs_a, tile=16*1024))
        log("timing pallas_f32 anamorphic...")
        tb = best_of(lambda a: float(fa(a)), comps)
        rate_af = chain*n*nsurf_a/tb
        details["pallas_f32_anamorphic"] = {
            "best_time_s": tb, "rate": rate_af}
        log("  pallas_f32 anamorphic: %.1f ms -> %.3f G "
            "intersections/s" % (tb*1e3, rate_af/1e9))
    else:
        out_a = df32.trace_df32_final(steps_a,
                                      df32.state_from_f64(ya, ua))
        r_a = rms_xy(df32.to_f64(out_a[0]), df32.to_f64(out_a[1]))
        parity_a = abs(r_a - r_a_cpu)/max(r_a_cpu, 1e-30)
        log("anamorphic df32 (eager) spot RMS parity: %.3g" % parity_a)
        details["pallas_df32_anamorphic"] = {
            "spot_rms_parity_vs_f64": parity_a}

    # differentiable optimization step (BASELINE.json configs item 5):
    # one jitted value_and_grad of the spot-RMS merit wrt double-Gauss
    # curvatures AND distances -- the replacement of the reference's
    # finite-difference scipy loop (reference optimize.py:93-161),
    # timed on the chip and gradient-parity-checked vs the CPU f64
    # merit.  Uses the same scan engine + nan-safe path optimize_grad
    # dispatches (parallel/grad.py), i.e. the rates below are what a
    # user's optimization loop actually gets per step.
    from rayopt_tpu.parallel.grad import spot_rms

    off64 = np.asarray(tab64.offset)
    d64 = np.asarray(tab64.distance)
    unit64 = np.divide(off64, d64[:, None], where=d64[:, None] != 0,
                       out=np.tile(np.array([0., 0., 1.]),
                                   (off64.shape[0], 1)))

    def make_grad_step(tab_l, dt, unroll=False):
        unit = jnp.asarray(unit64, dt)

        def loss(params, y0, u0):
            t2 = tab_l.replace(
                curvature=params["curvature"],
                offset=unit*params["distance"][:, None])
            return spot_rms(t2, y0, u0,
                            specs=specs if unroll else None,
                            unroll=unroll)
        return jax.jit(jax.value_and_grad(loss))

    def grad_params(tab_l, dt):
        return {"curvature": jnp.asarray(tab_l.curvature, dt),
                "distance": jnp.asarray(tab_l.distance, dt)}

    rng_g = np.random.RandomState(7)  # grad-parity seed stream
    mg = 8192
    yg = np.zeros((mg, 3))
    yg[:, :2] = rng_g.uniform(-1, 1, (mg, 2))*11.
    ug = np.zeros((mg, 3))
    ug[:, 2] = 1.

    with jax.default_device(cpu):
        _, g_cpu = make_grad_step(tab64, jnp.float64)(
            grad_params(tab64, jnp.float64), yg, ug)
        g_cpu = {k: np.asarray(v) for k, v in g_cpu.items()}

    def grad_rel_err(g):
        num = sum(float(np.square(np.asarray(g[k])
                                  - g_cpu[k]).sum()) for k in g_cpu)
        den = sum(float(np.square(g_cpu[k]).sum()) for k in g_cpu)
        return float(np.sqrt(num/den))

    if on_tpu:
        try:
            # gradient parity: f64 (emulated, tight) and f32 (the
            # throughput dtype, informational)
            _, g64 = make_grad_step(tab64, jnp.float64)(
                grad_params(tab64, jnp.float64), yg, ug)
            gp64 = grad_rel_err(g64)
            _, g32 = make_grad_step(tab, jnp.float32)(
                grad_params(tab, jnp.float32),
                yg.astype(np.float32), ug.astype(np.float32))
            gp32 = grad_rel_err(g32)
            log("grad parity vs CPU f64: tpu-f64 %.3g, tpu-f32 %.3g"
                % (gp64, gp32))

            # throughput: one full merit gradient step at 2^22 rays
            n_g = 1 << 22
            kxg, kyg = jax.random.split(jax.random.PRNGKey(1))
            yg_dev = jnp.stack(
                [jax.random.uniform(kxg, (n_g,), dtype, -11., 11.),
                 jax.random.uniform(kyg, (n_g,), dtype, -11., 11.),
                 jnp.zeros(n_g, dtype)], axis=1)
            ug_dev = jnp.stack(
                [jnp.zeros(n_g, dtype), jnp.zeros(n_g, dtype),
                 jnp.ones(n_g, dtype)], axis=1)
            # the unrolled specialized engine: its VJP runs 6.4x the
            # scan engine's (71.5 vs 456 ms at 2^22; 2^23 OOMs on VJP
            # residuals -- 22.6G of (12, N) temps vs 15.75G HBM)
            step32 = make_grad_step(tab, jnp.float32, unroll=True)
            p32 = grad_params(tab, jnp.float32)
            log("timing grad_step (f32, 2^22 rays, curvature+"
                "distance, unrolled engine)...")
            stats = {}
            tb = best_of(lambda a: float(step32(a, yg_dev,
                                                ug_dev)[0]),
                         p32, stats=stats)
            # nan-safe spot_rms runs a stop-gradient pre-trace, the
            # differentiated forward, and the VJP sweep: >= 3 forward-
            # equivalent passes; the conservative user-visible rate
            # counts the bundle once per step
            rate_g = n_g*nsurf/tb
            # one nan-safe gradient step = stop-gradient pre-trace +
            # differentiated forward + VJP sweep (~2 forward-
            # equivalents) = ~4 forward passes over the bundle
            details["grad_step"] = {
                "config": "value_and_grad(spot RMS) wrt curvature+"
                          "distance, nan-safe, unrolled specialized "
                          "engine",
                "rays": n_g, "best_time_s": tb,
                "steps_per_s": 1./tb,
                "intersections_per_s_per_step": rate_g,
                "fwd_equivalent_rate_est": 4*rate_g,
                "vs_target": rate_g/BASELINE_RATE,
                "grad_rel_err_f64_vs_cpu": gp64,
                "grad_rel_err_f32_vs_cpu": gp32,
                **stats,
            }
            log("  grad_step: %.1f ms/step (%.2f steps/s) -> %.3f G "
                "intersections/s per step through value_and_grad "
                "(~%.1f G fwd-equivalent)"
                % (tb*1e3, 1./tb, rate_g/1e9, 4*rate_g/1e9))

            # fused-step optimization (parallel.grad jit_steps): k
            # value_and_grad+adam steps inside one lax.scan dispatch,
            # amortizing the ~40 ms tunnel roundtrip that dominates a
            # single 2^22-ray step
            import optax
            kf = 4
            opt = optax.adam(1e-9)

            def loss32(params):
                t2 = tab.replace(
                    curvature=params["curvature"],
                    offset=jnp.asarray(unit64, jnp.float32)
                    * params["distance"][:, None])
                return spot_rms(t2, yg_dev, ug_dev, specs=specs,
                                unroll=True)

            @jax.jit
            def fused_chunk(params, state):
                def body(carry, _):
                    params, state = carry
                    value, grads = jax.value_and_grad(loss32)(params)
                    updates, state = opt.update(grads, state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, state), value
                (params, state), values = jax.lax.scan(
                    body, (params, state), None, length=kf)
                return params, state, values[-1]

            opt_state = opt.init(p32)
            log("timing grad_step_fused (jit_steps=%d)..." % kf)
            stats = {}
            tb_f = best_of(
                lambda a: float(fused_chunk(a, opt_state)[2]), p32,
                stats=stats)
            rate_f = kf*n_g*nsurf/tb_f
            details["grad_step_fused"] = {
                "jit_steps": kf, "rays": n_g,
                "best_time_s": tb_f,
                "steps_per_s": kf/tb_f,
                "intersections_per_s_per_step": rate_f,
                "vs_target": rate_f/BASELINE_RATE,
                **stats,
            }
            log("  grad_step_fused: %.1f ms/chunk = %.1f ms/step "
                "(%.2f steps/s) -> %.3f G intersections/s per step"
                % (tb_f*1e3, tb_f/kf*1e3, kf/tb_f, rate_f/1e9))
        except Exception as e:
            log("grad_step failed (non-fatal):", e)
            details["grad_step"] = {"error": str(e)}

        # analytic-adjoint Pallas merit (ops.pallas_grad): the
        # backward pass runs IN-KERNEL (per-surface states live in
        # VMEM, parameter cotangents reduce per tile) -- no VJP
        # residuals, so the bundle scales to 2^26 rays where the XLA
        # VJP OOMs at 2^23
        try:
            from rayopt_tpu.ops.pallas_grad import pallas_spot_rms

            # gradient parity on the same seed bundle as gp32
            def loss_adj_of(tab_l, y_l, u_l, w_l):
                def loss(params):
                    t2 = tab_l.replace(
                        curvature=params["curvature"],
                        offset=jnp.asarray(unit64, jnp.float32)
                        * params["distance"][:, None])
                    return pallas_spot_rms(t2, y_l, u_l, w_l,
                                           specs=specs, tile=8*1024)
                return loss

            p32a = grad_params(tab, jnp.float32)
            kfa = 4
            wg_par = jnp.ones(mg, jnp.float32)/mg
            _, g_adj = jax.jit(jax.value_and_grad(loss_adj_of(
                tab, yg.astype(np.float32), ug.astype(np.float32),
                wg_par)))(p32a)
            # parity reference with the SAME gradient semantics: the
            # adjoint kernel mirrors the specialized unrolled engine,
            # which bakes flat rows' curvature out of the graph (zero
            # gradient BY DESIGN, see ops/pallas_grad.py) -- the scan
            # reference g_cpu carries those components and would
            # report the ~1% semantic difference as if it were
            # numeric error
            with jax.default_device(cpu):
                _, g_cpu_spec = make_grad_step(
                    tab64, jnp.float64, unroll=True)(
                        grad_params(tab64, jnp.float64), yg, ug)
                g_cpu_spec = {k: np.asarray(v)
                              for k, v in g_cpu_spec.items()}

            def grad_rel_err_spec(g):
                num = sum(float(np.square(np.asarray(g[k])
                                          - g_cpu_spec[k]).sum())
                          for k in g_cpu_spec)
                den = sum(float(np.square(g_cpu_spec[k]).sum())
                          for k in g_cpu_spec)
                return float(np.sqrt(num/den))

            gp_adj = grad_rel_err_spec(g_adj)
            log("adjoint-kernel grad parity vs CPU f64 (spec-engine "
                "reference): %.3g" % gp_adj)

            # 2^23 rays: exactly the scale where the XLA VJP OOMs
            # on residuals (22.6G of temps vs 15.75G HBM) while the
            # in-kernel adjoint runs in O(N).  Bigger bundles work
            # too, but Mosaic/XLA compile time scales superlinearly
            # with the Pallas grid count on the remote compiler
            # (2^20: 19 s, 2^23: 44 s, 2^26: >35 min and a tunnel
            # reset), so the bench pins the OOM-boundary size
            n_a = 1 << 23
            kxa, kya = jax.random.split(jax.random.PRNGKey(2))
            y_adj = jnp.stack(
                [jax.random.uniform(kxa, (n_a,), dtype, -11., 11.),
                 jax.random.uniform(kya, (n_a,), dtype, -11., 11.),
                 jnp.zeros(n_a, dtype)], axis=1)
            u_adj = jnp.stack(
                [jnp.zeros(n_a, dtype), jnp.zeros(n_a, dtype),
                 jnp.ones(n_a, dtype)], axis=1)
            w_adj = jnp.ones(n_a, dtype)/n_a
            step_adj = jax.jit(jax.value_and_grad(loss_adj_of(
                tab, y_adj, u_adj, w_adj)))
            log("timing grad_step_adjoint (f32, 2^23 rays -- the "
                "XLA-VJP OOM boundary -- in-kernel backward)...")
            stats = {}
            tb_a = best_of(lambda a: float(step_adj(a)[0]), p32a,
                           stats=stats)
            rate_a = n_a*nsurf/tb_a
            details["grad_step_adjoint"] = {
                "config": "value_and_grad(pallas_spot_rms) wrt "
                          "curvature+distance, analytic in-kernel "
                          "adjoint, no VJP residuals",
                "rays": n_a, "best_time_s": tb_a,
                "steps_per_s": 1./tb_a,
                "intersections_per_s_per_step": rate_a,
                "vs_target": rate_a/BASELINE_RATE,
                "grad_rel_err_f32_vs_cpu_spec_ref": gp_adj,
                **stats,
            }
            log("  grad_step_adjoint: %.1f ms/step (%.2f steps/s) -> "
                "%.3f G intersections/s per step through the "
                "in-kernel adjoint"
                % (tb_a*1e3, 1./tb_a, rate_a/1e9))

            # fused adam steps on the adjoint merit
            import optax
            opt_a = optax.adam(1e-9)

            @jax.jit
            def fused_adj(params, state):
                def body(carry, _):
                    params, state = carry
                    value, grads = jax.value_and_grad(
                        loss_adj_of(tab, y_adj, u_adj, w_adj))(params)
                    updates, state = opt_a.update(grads, state,
                                                  params)
                    params = optax.apply_updates(params, updates)
                    return (params, state), value
                (params, state), values = jax.lax.scan(
                    body, (params, state), None, length=kfa)
                return params, state, values[-1]

            log("timing grad_step_adjoint_fused (jit_steps=%d)..."
                % kfa)
            stats = {}
            opt_state_a = opt_a.init(p32a)
            tb_af = best_of(
                lambda a: float(fused_adj(a, opt_state_a)[2]),
                p32a, stats=stats)
            rate_af2 = kfa*n_a*nsurf/tb_af
            details["grad_step_adjoint_fused"] = {
                "jit_steps": kfa, "rays": n_a,
                "best_time_s": tb_af,
                "steps_per_s": kfa/tb_af,
                "intersections_per_s_per_step": rate_af2,
                "vs_target": rate_af2/BASELINE_RATE,
                **stats,
            }
            log("  grad_step_adjoint_fused: %.1f ms/chunk = %.1f "
                "ms/step (%.2f steps/s) -> %.3f G intersections/s "
                "per step" % (tb_af*1e3, tb_af/kfa*1e3, kfa/tb_af,
                              rate_af2/1e9))

        except Exception as e:
            log("grad_step_adjoint failed (non-fatal):", e)
            details["grad_step_adjoint"] = {"error": str(e)}

        # the ALIGNMENT gradient (late round 5) in its OWN guard so a
        # pose-row failure cannot clobber the main adjoint rows
        try:
            from rayopt_tpu.ops.pallas_grad import pallas_spot_rms

            # the ALIGNMENT gradient: d(RMS)/d(tilt,
            # decenter) through the same in-kernel adjoint, every
            # pose row kept live by kernels.with_pose (rot reads
            # become Mat3 scalars, so the kernel is the honest
            # alignment workload: 2 extra rotations + offset per
            # surface).  Parity vs the CPU f64 scan engine on the
            # element rows (rows 1+; the scan engine additionally
            # differentiates the object row's entry rotation, which
            # specialized engines structurally drop).
            from rayopt_tpu.ops.kernels import with_pose
            specs_pose = with_pose(specs)
            nrows = nsurf + 1         # table rows incl. the object
            zero_pose = {
                "tilt": jnp.zeros((nrows, 3), jnp.float32),
                "decenter": jnp.zeros((nrows, 3), jnp.float32)}

            def loss_pose_of(tab_l, y_l, u_l, w_l):
                def loss(pose):
                    t2 = tab_l.replace(tilt=pose["tilt"],
                                       decenter=pose["decenter"])
                    return pallas_spot_rms(t2, y_l, u_l, w_l,
                                           specs=specs_pose,
                                           tile=8*1024)
                return loss

            wg_p = jnp.ones(mg, jnp.float32)/mg
            _, g_pose = jax.jit(jax.value_and_grad(loss_pose_of(
                tab, yg.astype(np.float32), ug.astype(np.float32),
                wg_p)))(zero_pose)
            with jax.default_device(cpu):
                def loss_pose_cpu(pose):
                    t2 = tab64.replace(tilt=pose["tilt"],
                                       decenter=pose["decenter"])
                    return spot_rms(t2, yg, ug,
                                    jnp.ones(mg, jnp.float64)/mg)
                _, g_pose_cpu = jax.jit(jax.value_and_grad(
                    loss_pose_cpu))({
                        "tilt": jnp.zeros((nrows, 3), jnp.float64),
                        "decenter": jnp.zeros((nrows, 3),
                                              jnp.float64)})
            num = sum(float(np.square(
                np.asarray(g_pose[k])[1:]
                - np.asarray(g_pose_cpu[k])[1:]).sum())
                for k in g_pose)
            den = sum(float(np.square(
                np.asarray(g_pose_cpu[k])[1:]).sum())
                for k in g_pose)
            gp_pose = float(np.sqrt(num/den))
            log("pose-adjoint grad parity vs CPU f64 scan (element "
                "rows): %.3g" % gp_pose)

            step_pose = jax.jit(jax.value_and_grad(loss_pose_of(
                tab, y_adj, u_adj, w_adj)))
            log("timing grad_step_adjoint_pose (f32, 2^23 rays, "
                "tilt+decenter of every element row)...")
            stats = {}
            tb_p = best_of(lambda p: float(step_pose(p)[0]),
                           zero_pose, stats=stats)
            rate_p = n_a*nsurf/tb_p
            details["grad_step_adjoint_pose"] = {
                "config": "value_and_grad(pallas_spot_rms) wrt "
                          "tilt+decenter (alignment gradient), "
                          "with_pose specs, in-kernel adjoint",
                "rays": n_a, "best_time_s": tb_p,
                "steps_per_s": 1./tb_p,
                "intersections_per_s_per_step": rate_p,
                "vs_target": rate_p/BASELINE_RATE,
                "grad_rel_err_f32_vs_cpu_f64_rows1plus": gp_pose,
                **stats,
            }
            log("  grad_step_adjoint_pose: %.1f ms/step (%.2f "
                "steps/s) -> %.3f G intersections/s per step"
                % (tb_p*1e3, 1./tb_p, rate_p/1e9))
        except Exception as e:
            log("grad_step_adjoint_pose failed (non-fatal):", e)
            details["grad_step_adjoint_pose"] = {"error": str(e)}

        # polychromatic analytic-adjoint merit (round-5): ONE ray tile
        # traced through all 3 wavelength chains in VMEM, in-kernel
        # backward per chain -- the chromatic-optimization path that
        # used to ride the residual-bound XLA VJP (VERDICT r4 task 2)
        try:
            from rayopt_tpu.ops.pallas_grad import (
                pallas_polychromatic_spot_rms)
            from rayopt_tpu.glass import polychromatic_spot_rms
            tabs32 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype=dtype), s.tables())
            tabs64 = jax.tree_util.tree_map(jnp.asarray, s.tables())
            nlam = int(np.asarray(tabs32.curvature).shape[0])

            def loss_poly_of(tabs_l, y_l, u_l, w_l, dt):
                unit = jnp.asarray(unit64, dt)
                shape = tabs_l.curvature.shape

                def loss(params):
                    t2 = tabs_l.replace(
                        curvature=jnp.broadcast_to(params["curvature"],
                                                   shape),
                        offset=jnp.broadcast_to(
                            unit*params["distance"][:, None],
                            shape + (3,)))
                    return pallas_polychromatic_spot_rms(
                        t2, y_l, u_l, w_l, specs=specs, tile=8*1024)
                return loss

            # grad parity vs the stacked-table XLA reference (same
            # specialized gradient semantics), emulated f64 on-chip
            def loss_poly_xla(params):
                unit = jnp.asarray(unit64, jnp.float64)
                shape = tabs64.curvature.shape
                t2 = tabs64.replace(
                    curvature=jnp.broadcast_to(params["curvature"],
                                               shape),
                    offset=jnp.broadcast_to(
                        unit*params["distance"][:, None],
                        shape + (3,)))
                return polychromatic_spot_rms(
                    t2, jnp.asarray(yg), jnp.asarray(ug),
                    jnp.full(mg, 1./mg), specs=specs, unroll=True)

            p64 = grad_params(tab64, jnp.float64)
            _, g_poly_ref = jax.jit(
                jax.value_and_grad(loss_poly_xla))(p64)
            g_poly_ref = {k: np.asarray(v)
                          for k, v in g_poly_ref.items()}
            wg_par32 = jnp.full(mg, 1./mg, jnp.float32)
            _, g_poly = jax.jit(jax.value_and_grad(loss_poly_of(
                tabs32, yg.astype(np.float32),
                ug.astype(np.float32), wg_par32, jnp.float32)))(p32a)
            num = sum(float(np.square(np.asarray(g_poly[k])
                                      - g_poly_ref[k]).sum())
                      for k in g_poly_ref)
            den = sum(float(np.square(g_poly_ref[k]).sum())
                      for k in g_poly_ref)
            gp_poly = float(np.sqrt(num/den))
            log("poly-adjoint grad parity vs stacked-table XLA "
                "(f64-on-chip, spec semantics): %.3g" % gp_poly)

            n_p = 1 << 23
            w_p = jnp.full(n_p, 1./n_p, dtype)
            step_poly = jax.jit(jax.value_and_grad(loss_poly_of(
                tabs32, y_adj, u_adj, w_p, jnp.float32)))
            log("timing grad_step_adjoint_poly (f32, %d wavelengths, "
                "2^23 rays, in-kernel multi-chain backward)..."
                % nlam)
            stats = {}
            tb_p = best_of(lambda a: float(step_poly(a)[0]), p32a,
                           stats=stats)
            rate_p = n_p*nsurf*nlam/tb_p
            details["grad_step_adjoint_poly"] = {
                "config": "value_and_grad(pallas_polychromatic_spot_"
                          "rms) wrt curvature+distance, %d-wavelength "
                          "in-kernel adjoint" % nlam,
                "wavelengths": nlam, "rays": n_p,
                "best_time_s": tb_p, "steps_per_s": 1./tb_p,
                "intersections_per_s_per_step": rate_p,
                "vs_target": rate_p/BASELINE_RATE,
                "grad_rel_err_f32_vs_xla_f64_ref": gp_poly,
                **stats,
            }
            log("  grad_step_adjoint_poly: %.1f ms/step (%.2f "
                "steps/s) -> %.3f G intersections/s per step "
                "(x%d colors per HBM read)"
                % (tb_p*1e3, 1./tb_p, rate_p/1e9, nlam))
        except Exception as e:
            log("grad_step_adjoint_poly failed (non-fatal):", e)
            details["grad_step_adjoint_poly"] = {"error": str(e)}

        # wavefront-RMS analytic-adjoint merit (round-5): per-ray OPD
        # on the exit-pupil sphere with in-kernel backward -- the
        # diffraction-merit path that used to be memory-bound
        # (VERDICT r4 task 3)
        try:
            from rayopt_tpu.ops.pallas_grad import pallas_wavefront_rms
            from rayopt_tpu.parallel.grad import wavefront_rms
            wf_radius = float(-s.image.pupil.distance)
            wf_lam = float(s.wavelengths[0])
            # the reference ray (index 0) must be the live axis ray
            yg_wf = yg.copy()
            yg_wf[0] = 0.

            def loss_wf_of(tab_l, y_l, u_l, w_l, dt):
                unit = jnp.asarray(unit64, dt)

                def loss(params):
                    t2 = tab_l.replace(
                        curvature=params["curvature"],
                        offset=unit*params["distance"][:, None])
                    return pallas_wavefront_rms(
                        t2, y_l, u_l, w=w_l, ref=0, radius=wf_radius,
                        wavelength=wf_lam, scale=s.scale,
                        specs=specs, tile=8*1024)
                return loss

            def loss_wf_xla(params):
                unit = jnp.asarray(unit64, jnp.float64)
                t2 = tab64.replace(
                    curvature=params["curvature"],
                    offset=unit*params["distance"][:, None])
                return wavefront_rms(
                    t2, jnp.asarray(yg_wf), jnp.asarray(ug),
                    w=jnp.full(mg, 1./mg), ref=0, radius=wf_radius,
                    wavelength=wf_lam, scale=s.scale, specs=specs,
                    unroll=True)

            with jax.default_device(cpu):
                _, g_wf_ref = jax.jit(jax.value_and_grad(
                    loss_wf_xla))(grad_params(tab64, jnp.float64))
                g_wf_ref = {k: np.asarray(v)
                            for k, v in g_wf_ref.items()}
            _, g_wf = jax.jit(jax.value_and_grad(loss_wf_of(
                tab, yg_wf.astype(np.float32),
                ug.astype(np.float32), wg_par, jnp.float32)))(p32a)
            num = sum(float(np.square(np.asarray(g_wf[k])
                                      - g_wf_ref[k]).sum())
                      for k in g_wf_ref)
            den = sum(float(np.square(g_wf_ref[k]).sum())
                      for k in g_wf_ref)
            gp_wf = float(np.sqrt(num/den))
            log("wavefront-adjoint grad parity vs CPU f64 "
                "(spec-engine reference): %.3g" % gp_wf)

            y_wf_dev = y_adj.at[0].set(jnp.zeros(3, dtype))
            w_wf = jnp.full(n_a, 1./n_a, dtype)
            step_wf = jax.jit(jax.value_and_grad(loss_wf_of(
                tab, y_wf_dev, u_adj, w_wf, jnp.float32)))
            log("timing grad_step_wavefront_adjoint (f32, 2^23 rays, "
                "per-ray OPD in-kernel backward)...")
            stats = {}
            tb_w = best_of(lambda a: float(step_wf(a)[0]), p32a,
                           stats=stats)
            rate_w = n_a*nsurf/tb_w
            details["grad_step_wavefront_adjoint"] = {
                "config": "value_and_grad(pallas_wavefront_rms) wrt "
                          "curvature+distance, in-kernel OPD adjoint",
                "rays": n_a, "best_time_s": tb_w,
                "steps_per_s": 1./tb_w,
                "intersections_per_s_per_step": rate_w,
                "vs_target": rate_w/BASELINE_RATE,
                "grad_rel_err_f32_vs_cpu_spec_ref": gp_wf,
                **stats,
            }
            log("  grad_step_wavefront_adjoint: %.1f ms/step (%.2f "
                "steps/s) -> %.3f G intersections/s per step"
                % (tb_w*1e3, 1./tb_w, rate_w/1e9))
        except Exception as e:
            log("grad_step_wavefront_adjoint failed (non-fatal):", e)
            details["grad_step_wavefront_adjoint"] = {"error": str(e)}

        # realistic composite design-merit step (round-5, VERDICT r4
        # task 6): 3 fields x 3 wavelengths aimed spot bundles + an
        # axial wavefront merit + a first-order focal-length penalty,
        # fused jit_steps=4 -- the workload a designer actually runs,
        # not a single-field monochromatic row
        try:
            from rayopt_tpu.parallel.grad import (
                bundles_from_system, first_order_penalty,
                paraxial_seed, wavefront_rms)
            import optax
            wf_radius = float(-s.image.pupil.distance)
            wf_lam = float(s.wavelengths[0])
            fields_d = (0., .7, 1.)
            bundles_h = bundles_from_system(s, fields=fields_d,
                                            nrays=4096, pad_to=128)
            bundles_dev = []
            rays_total = 0
            for (y0b, u0b, w0b, chroma) in bundles_h:
                ov = {k: jnp.asarray(v, dtype)
                      for k, v in chroma.items() if k != "wavelength"}
                bundles_dev.append((jnp.asarray(y0b, dtype),
                                    jnp.asarray(u0b, dtype),
                                    jnp.asarray(w0b, dtype), ov))
                rays_total += y0b.shape[0]
            # axial wavefront bundle (padded to the tile quantum)
            n_wfb = 8192
            kwx, kwy = jax.random.split(jax.random.PRNGKey(3))
            y_wfb = jnp.stack(
                [jax.random.uniform(kwx, (n_wfb,), dtype, -11., 11.),
                 jax.random.uniform(kwy, (n_wfb,), dtype, -11., 11.),
                 jnp.zeros(n_wfb, dtype)], axis=1).at[0].set(
                     jnp.zeros(3, dtype))
            u_wfb = jnp.stack(
                [jnp.zeros(n_wfb, dtype), jnp.zeros(n_wfb, dtype),
                 jnp.ones(n_wfb, dtype)], axis=1)
            rays_total += n_wfb
            seed_d = paraxial_seed(s)
            f_tgt = float(s.paraxial.focal_length[1])

            from rayopt_tpu.ops.pallas_grad import (
                pallas_spot_rms, pallas_wavefront_rms)

            def _tile_of(nb):
                t = min(nb, 8*1024)
                while nb % t or t % 128:
                    t -= 128
                return t

            def design_merit(tab_l, dt, adjoint):
                # the timed (adjoint=True) variant runs the spot and
                # wavefront terms through the analytic-adjoint Pallas
                # kernels: in-kernel backward AND exact Mosaic f32 ops
                # -- the XLA f32 wavefront on TPU is poisoned by the
                # hardware's ~1e-4-approximate sqrt/div in the OPD
                # path sums (~126 waves of numeric noise); the
                # reference (adjoint=False) is the CPU f64 scan engine
                def merit(params):
                    unit = jnp.asarray(unit64, dt)
                    t2 = tab_l.replace(
                        curvature=params["curvature"],
                        offset=unit*params["distance"][:, None])
                    total = 0.
                    for (y0b, u0b, w0b, ov) in bundles_dev:
                        ovd = {k: jnp.asarray(v, dt)
                               for k, v in ov.items()}
                        if adjoint:
                            total = total + pallas_spot_rms(
                                t2.replace(**ovd),
                                jnp.asarray(y0b, dt),
                                jnp.asarray(u0b, dt),
                                jnp.asarray(w0b, dt), specs=specs,
                                tile=_tile_of(y0b.shape[0]))
                        else:
                            total = total + spot_rms(
                                t2.replace(**ovd),
                                jnp.asarray(y0b, dt),
                                jnp.asarray(u0b, dt),
                                jnp.asarray(w0b, dt))
                    if adjoint:
                        total = total + pallas_wavefront_rms(
                            t2, jnp.asarray(y_wfb, dt),
                            jnp.asarray(u_wfb, dt), ref=0,
                            radius=wf_radius, wavelength=wf_lam,
                            scale=s.scale, specs=specs, tile=8*1024)
                    else:
                        total = total + wavefront_rms(
                            t2, jnp.asarray(y_wfb, dt),
                            jnp.asarray(u_wfb, dt), ref=0,
                            radius=wf_radius, wavelength=wf_lam,
                            scale=s.scale)
                    # the paraxial ABCD scan promotes mixed dtypes to
                    # f64 mid-carry; the penalty is 13 tiny matrices,
                    # so just run it uniformly in f64
                    t64 = jax.tree_util.tree_map(
                        lambda a: jnp.asarray(a, jnp.float64), t2)
                    total = total + 1e-4*first_order_penalty(
                        t64, (jnp.asarray(seed_d[0], jnp.float64),
                              jnp.asarray(seed_d[1], jnp.float64)),
                        {"focal_length": (1, f_tgt)})
                    return total
                return merit

            # value + gradient parity vs CPU f64 (scan engine on the
            # CPU side -- XLA:CPU compiles the unrolled composite
            # pathologically; gradients compared on LIVE entries only,
            # the documented specialized-engine semantics)
            merit32 = design_merit(tab, jnp.float32, True)
            merit_cpu = design_merit(tab64, jnp.float64, False)
            with jax.default_device(cpu):
                v_ref, g_ref_d = jax.jit(jax.value_and_grad(
                    merit_cpu))(grad_params(tab64, jnp.float64))
                v_ref = float(v_ref)
                g_ref_d = {k: np.asarray(v)
                           for k, v in g_ref_d.items()}
            v32, g32_d = jax.jit(jax.value_and_grad(merit32))(p32a)
            v32 = float(v32)
            from rayopt_tpu.ops.pallas_grad import _baked_out_rows
            live = {
                "curvature": np.asarray(
                    [j not in _baked_out_rows(specs, "curvature")
                     for j in range(len(specs))]),
                "distance": np.ones(len(specs), bool),
            }
            num = sum(float(np.square((np.asarray(g32_d[k])
                                       - g_ref_d[k])[live[k]]).sum())
                      for k in g_ref_d)
            den = sum(float(np.square(g_ref_d[k][live[k]]).sum())
                      for k in g_ref_d)
            gp_d = float(np.sqrt(num/den))
            vp_d = abs(v32 - v_ref)/abs(v_ref)
            log("design merit parity vs CPU f64: value %.3g, grad "
                "(live entries) %.3g" % (vp_d, gp_d))

            opt_d = optax.adam(1e-9)
            kd = 4

            @jax.jit
            def fused_design(params, state):
                def body(carry, _):
                    params, state = carry
                    value, grads = jax.value_and_grad(merit32)(params)
                    updates, state = opt_d.update(grads, state,
                                                  params)
                    params = optax.apply_updates(params, updates)
                    return (params, state), value
                (params, state), values = jax.lax.scan(
                    body, (params, state), None, length=kd)
                return params, state, values[-1]

            st_d = opt_d.init(p32a)
            log("timing design_merit_step (3 fields x 3 wavelengths "
                "spot + wavefront + first-order penalty, fused "
                "jit_steps=%d)..." % kd)
            stats = {}
            tb_d = best_of(
                lambda a: float(fused_design(a, st_d)[2]), p32a,
                stats=stats)
            details["design_merit_step"] = {
                "config": "composite merit on the analytic-adjoint "
                          "kernels: 9 aimed spot bundles (3 fields x "
                          "3 wavelengths, ~4k rays each) + axial "
                          "wavefront RMS (8192 rays) + focal-length "
                          "penalty, adam, jit_steps=4",
                "rays_per_step": rays_total,
                "best_time_s": tb_d, "steps_per_s": kd/tb_d,
                "value_rel_err_f32_vs_cpu_f64": vp_d,
                "grad_rel_err_f32_vs_cpu_f64_live": gp_d,
                **stats,
            }
            log("  design_merit_step: %.1f ms/chunk = %.1f ms/step "
                "(%.2f steps/s, %d rays/step)"
                % (tb_d*1e3, tb_d/kd*1e3, kd/tb_d, rays_total))
        except Exception as e:
            log("design_merit_step failed (non-fatal):", e)
            details["design_merit_step"] = {"error": str(e)}
    else:
        gp = grad_rel_err(g_cpu)  # trivially 0; records the path ran
        details["grad_step"] = {"grad_rel_err_f64_vs_cpu": gp}

    # the flagship Pallas engine under a real 1-device TPU mesh,
    # running the IDENTICAL 8-chained workload as the unsharded
    # pallas_f32 row above -- the gap between the two numbers is the
    # shard_map overhead alone (round-4 VERDICT weak #3: the old row
    # timed a single trace + moments, apples-to-oranges).  The
    # 8-device variant is CI-tested on the virtual CPU mesh.
    if on_tpu:
        try:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            from rayopt_tpu.parallel import ray_mesh, shard_components
            mesh1 = ray_mesh(jax.devices()[:1])
            st_m = shard_components(comps, mesh1)

            def local_chain(tab_l, *st):
                acc = 0.
                state = st
                for _ in range(chain):
                    out, t = pallas_trace_final(tab_l, state,
                                                specs=specs,
                                                tile=16*1024)
                    acc = acc + jnp.nanmean(out[0]**2 + out[1]**2)
                    state = (out[0]*1e-3, out[1]*1e-3, state[2],
                             state[3], state[4], state[5])
                return jax.lax.pmean(acc, "rays")

            mesh_chain = jax.jit(shard_map(
                local_chain, mesh=mesh1,
                in_specs=(P(),) + (P("rays"),)*6, out_specs=P(),
                check_vma=False))
            log("timing pallas_f32 under shard_map (1-device TPU "
                "mesh, same 8-chained workload)...")
            stats = {}
            tb = best_of(lambda a: float(mesh_chain(tab, *a)), st_m,
                         stats=stats)
            rate_m1 = chain*n*nsurf/tb
            unsharded = rates.get("pallas_f32")
            details["pallas_f32_sharded_mesh1"] = {
                "best_time_s": tb, "rate": rate_m1,
                "vs_baseline": rate_m1/BASELINE_RATE,
                "workload": "identical 8-chained trace as pallas_f32",
                "shard_map_overhead": (1. - rate_m1/unsharded)
                if unsharded else None, **stats}
            log("  pallas_f32 sharded (mesh=1): %.1f ms -> %.3f G "
                "intersections/s (shard_map overhead vs unsharded: "
                "%.1f%%)" % (tb*1e3, rate_m1/1e9,
                             100*(1 - rate_m1/unsharded)
                             if unsharded else float("nan")))
        except Exception as e:
            log("sharded pallas mesh row failed (non-fatal):", e)
            details["pallas_f32_sharded_mesh1"] = {"error": str(e)}

    # df32 merit mode: fused parity-grade trace + in-kernel moment
    # reduction (no per-ray writeback) -- the optimization-merit path
    if on_tpu:
        try:
            from rayopt_tpu.ops.pallas_trace import \
                spot_rms_from_moments
            n_dm = 1 << 26
            reps = n_dm // yp.shape[0]
            state_dm = jax.tree_util.tree_map(
                jnp.asarray, df32.state_from_f64(yp, up))
            state_dm = jax.jit(
                lambda s: jax.tree_util.tree_map(
                    lambda a: jnp.tile(a, reps), s))(state_dm)
            float(state_dm[0][0][0])

            def df_merit(st):
                mom = df32.pallas_trace_df32_merit(steps, st,
                                                   tile=8*1024)
                return spot_rms_from_moments(*mom)
            df_merit = jax.jit(df_merit)
            log("timing pallas_df32_merit (fused moments, no "
                "writeback)...")
            stats = {}
            tb = best_of(lambda a: float(df_merit(a)), state_dm,
                         stats=stats)
            rate_dm = n_dm*nsurf/tb
            r_dm = float(df_merit(state_dm))
            # replicated seed bundle: same RMS as the f64 CPU seeds
            parity_dm = abs(r_dm - r_cpu)/max(r_cpu, 1e-30)
            details["pallas_df32_merit"] = {
                "best_time_s": tb, "rate": rate_dm,
                "vs_target": rate_dm/BASELINE_RATE,
                "spot_rms_parity_vs_f64": parity_dm, **stats}
            log("  pallas_df32_merit: %.1f ms -> %.3f G "
                "intersections/s, parity %.3g"
                % (tb*1e3, rate_dm/1e9, parity_dm))
        except Exception as e:
            log("df32 merit row failed (non-fatal):", e)
            details["pallas_df32_merit"] = {"error": str(e)}

    # aberration-polynomial trace (reference simplex.py:41-49 is the
    # only upstream perf number): re-measure every round.  All
    # timings synchronize by fetching a scalar -- block_until_ready
    # is a no-op on the tunnel, which made earlier async "device"
    # numbers (benchmarks/bench_poly_v5e.json round 3) meaningless.
    # The single-system trace is tiny-tensor serial work the TPU is
    # BAD at; the device case is the vmapped tolerancing batch.
    try:
        from rayopt_tpu.ops.poly_jax import poly_trace_table
        kmax = 11
        pd_poly = s.object.pupil.distance
        one = jax.jit(lambda t: poly_trace_table(t, specs, kmax,
                                                 pd_poly)[0])
        log("timing poly trace single (kmax=11, q=286)...")
        stats = {}
        tb1 = best_of(
            lambda t: float(np.asarray(one(t)).ravel()[0]), tab64,
            stats=stats, k=5)
        batch = 256
        tabs_b = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(
                jnp.asarray(a)[None], (batch,) + np.shape(a)).copy(),
            tab64)
        curv_b = tabs_b.curvature*(1 + 1e-6*jnp.arange(batch)[:, None])
        tabs_b = tabs_b.replace(curvature=jnp.where(
            tabs_b.curvature == 0, 0., curv_b))
        many = jax.jit(jax.vmap(
            lambda t: poly_trace_table(t, specs, kmax,
                                       pd_poly)[0][-1, :2]))
        log("timing poly trace batch-%d (tolerancing shape)..."
            % batch)
        stats_b = {}
        tbb = best_of(
            lambda ts: float(np.asarray(many(ts)).ravel()[0]), tabs_b,
            stats=stats_b, k=5)
        details["poly_trace"] = {
            "kmax": kmax, "device_single_ms": tb1*1e3,
            "single": stats,
            "device_batch%d_ms" % batch: tbb*1e3,
            "per_member_ms": tbb*1e3/batch, "batch": stats_b,
            "note": "single-system on-device cost is dispatch/serial-"
                    "bound (tiny tensors); the device story is batch-"
                    "only (tolerancing shape) -- single-system poly "
                    "work runs on the host by design"}
        log("  poly trace: single %.1f ms; batch-%d %.1f ms = %.3f "
            "ms/member" % (tb1*1e3, batch, tbb*1e3, tbb*1e3/batch))
    except Exception as e:
        log("poly row failed (non-fatal):", e)
        details["poly_trace"] = {"error": str(e)}

    # f64 accel-vs-CPU parity (legacy metric from round 1)
    yf_acc = np.asarray(trace_rays_final(tab64, yp, up)[0])
    r_acc = rms_xy(yf_acc[:, 0], yf_acc[:, 1])
    details["spot_rms_rel_err_f64_accel_vs_cpu"] = \
        abs(r_acc - r_cpu)/max(r_cpu, 1e-30)
    details["dtype"] = "float32 headline + df32 parity-grade"
    # one-glance tunnel health: rows whose 5-rep spread crossed the
    # sickness threshold (perf_gate prints these on a floor miss)
    details["tunnel_sick_rows"] = sorted(
        k for k, v in details.items()
        if isinstance(v, dict) and v.get("tunnel_sick"))

    print(json.dumps({
        "metric": "ray_surface_intersections_per_sec_per_chip",
        "value": headline,
        "unit": "1/s",
        "vs_baseline": headline/BASELINE_RATE,
        "details": details,
    }))


if __name__ == "__main__":
    main()
