"""Multi-process (DCN) tolerancing farm demo.

Launches N real processes (default 2), brings them up as one
jax.distributed job over CPU devices (gloo collectives -- the DCN
stand-in on one machine), builds ONE global mesh spanning every
device of every process, and farms the tolerancing Monte-Carlo of
rayopt_tpu.parallel.multihost.farmed_monte_carlo_rms across it.  Each
process materializes only its own sample shard; the per-sample keys
are topology-independent, so the summary statistics are identical to
a single-process run with the same seed -- the "multi-node without a
real cluster" pattern of SURVEY.md section 4/5.

Run:  python tools/dcn_farm.py [--nprocs 2] [--samples 128]
Emits one JSON line (the farm summary) from process 0.

On a real multi-host TPU slice the same code path runs unchanged:
jax.distributed.initialize picks up the cluster environment, the farm
mesh spans all hosts' chips, and the shards ride ICI/DCN instead of
gloo.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def child_main(args):
    import jax
    # pin BEFORE any backend touch; each process owns its own devices
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.nprocs, process_id=args.proc_id)

    import numpy as np
    sys.path.insert(0, REPO)
    from rayopt_tpu.models import doublet
    from rayopt_tpu.parallel.multihost import farmed_monte_carlo_rms

    s = doublet()
    tab = s.table()
    rng = np.random.RandomState(0)
    n = 128
    y0 = np.zeros((n, 3))
    y0[:, :2] = rng.uniform(-1, 1, (n, 2))*.9
    u0 = np.zeros((n, 3))
    u0[:, 2] = 1.
    stats = farmed_monte_carlo_rms(tab, y0, u0,
                                   n_samples=args.samples,
                                   seed=args.seed)
    if jax.process_index() == 0:
        out = {k: (float(v) if np.isscalar(v) or np.ndim(v) == 0
                   else None)
               for k, v in stats.items() if k != "rms"}
        out["rms_sha"] = float(np.nansum(stats["rms"]))
        print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4,
                    dest="local_devices")
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--port", type=int, default=29741)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--proc-id", type=int, default=None,
                    dest="proc_id")
    args = ap.parse_args()

    if args.proc_id is not None:
        # we are a farm worker
        child_main(args)
        return

    args.coordinator = args.coordinator or ("localhost:%d" % args.port)
    procs = []
    try:
        for i in range(args.nprocs):
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--nprocs", str(args.nprocs),
                 "--local-devices", str(args.local_devices),
                 "--samples", str(args.samples),
                 "--seed", str(args.seed),
                 "--coordinator", args.coordinator,
                 "--proc-id", str(i)],
                stdout=(None if i else subprocess.PIPE),
                text=True, cwd=REPO))
        out = procs[0].communicate(timeout=600)[0]
        rcs = [procs[0].returncode] + [p.wait(timeout=600)
                                       for p in procs[1:]]
    finally:
        # a worker dying during distributed bring-up leaves its peers
        # blocked in a collective (holding the coordinator port);
        # never orphan them
        for p in procs:
            if p.poll() is None:
                p.kill()
    if any(rcs):
        raise SystemExit("farm worker failed: rcs=%s" % rcs)
    sys.stdout.write(out)


if __name__ == "__main__":
    main()
