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
    else:
        gp = grad_rel_err(g_cpu)  # trivially 0; records the path ran
        details["grad_step"] = {"grad_rel_err_f64_vs_cpu": gp}

    # the flagship Pallas merit kernel under a real 1-device TPU mesh:
    # proves the shard_map composition compiles and runs on hardware
    # (the 8-device variant is CI-tested on the virtual CPU mesh)
    if on_tpu:
        try:
            from rayopt_tpu.parallel import (
                ray_mesh, shard_components, sharded_pallas_moments)
            from rayopt_tpu.ops.pallas_trace import \
                spot_rms_from_moments
            mesh1 = ray_mesh(jax.devices()[:1])
            st_m = shard_components(comps, mesh1)

            def mesh_merit(st):
                mom = sharded_pallas_moments(tab, st, mesh1,
                                             specs=specs,
                                             tile=16*1024)
                return spot_rms_from_moments(*mom)
            log("timing pallas_f32 under shard_map (1-device TPU "
                "mesh)...")
            stats = {}
            tb = best_of(lambda a: float(mesh_merit(a)), st_m,
                         stats=stats)
            rate_m1 = n*nsurf/tb
            details["pallas_f32_sharded_mesh1"] = {
                "best_time_s": tb, "rate": rate_m1, **stats}
            log("  pallas_f32 sharded (mesh=1): %.1f ms -> %.3f G "
                "intersections/s" % (tb*1e3, rate_m1/1e9))
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
            "per_member_ms": tbb*1e3/batch, "batch": stats_b}
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

    print(json.dumps({
        "metric": "ray_surface_intersections_per_sec_per_chip",
        "value": headline,
        "unit": "1/s",
        "vs_baseline": headline/BASELINE_RATE,
        "details": details,
    }))


if __name__ == "__main__":
    main()
