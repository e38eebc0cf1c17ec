"""Capture a device profile of the VMEC/EFIT RK4 substep; print top ops.

Writes a jax.profiler trace, then parses the .trace.json.gz for TPU-side
op durations aggregated by op name prefix.

Run: python tools/profile_vmec.py              (VMEC; BENCH_VMEC_FUSED=1
                                                for the fused kernel path)
     PROFILE_EQ=efit python tools/profile_vmec.py   (EFIT headline config)
"""

import glob
import gzip
import json
import os
import pathlib
import sys
import time
from collections import defaultdict

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_framework_tpu.models import make_vmec, make_efit, \
    dispersion as disp
from graph_framework_tpu.solver import Solver, make_ray_state

VMEC_FILE = "/root/reference/graph_tests/vmec.nc"
EFIT_FILE = "/root/reference/graph_tests/efit.nc"
N = int(os.environ.get("BENCH_RAYS", 100_000))
LOGDIR = "/tmp/vmec_prof"


def main():
    if os.environ.get("PROFILE_EQ", "vmec") == "efit":
        # the bench headline configuration (bench._make)
        eq = make_efit(EFIT_FILE, dtype=jnp.float32)
        state = make_ray_state(N, w=500.0, x=2.5, y=0.0, z=0.0,
                               kx=-477.723, ky=150.0, kz=0.0,
                               dtype=jnp.float32)
        sol = Solver(
            disp.cold_plasma, eq,
            method=os.environ.get("BENCH_SOLVER", "rk4"), dt=1e-4,
            sub_steps=10,
            frozen_cells=os.environ.get("BENCH_FROZEN", "0") == "1")
        return run(eq, state, sol)
    fused = os.environ.get("BENCH_VMEC_FUSED", "0") == "1"
    eq = make_vmec(VMEC_FILE, dtype=jnp.float32, fused_mode_sums=fused)
    state = make_ray_state(N, w=900.0, x=0.5, y=0.5, z=0.0,
                           kx=54.6, ky=0.0, kz=0.0, dtype=jnp.float32)
    sol = Solver(disp.cold_plasma, eq, method="rk4", dt=2e-7, sub_steps=10)
    return run(eq, state, sol)


def run(eq, state, sol):
    step = sol.step_fn()
    state = step(state)
    jax.block_until_ready(state)

    states = [state._replace(t=state.t + jnp.float32(1e-6 * i))
              for i in range(6)]
    with jax.profiler.trace(LOGDIR):
        outs = [step(s) for s in states]
        jax.block_until_ready(outs)

    # parse newest trace
    paths = sorted(glob.glob(LOGDIR + "/**/*.trace.json.gz",
                             recursive=True), key=os.path.getmtime)
    assert paths, "no trace written"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # find TPU device-side pids (XLA Ops rows)
    dev_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name.lower():
                dev_pids.add(ev["pid"])

    agg = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0) / 1e3      # us -> ms
        name = ev.get("name", "?")
        # aggregate by leading op kind (strip .NNN suffixes)
        key = name.split(".")[0]
        agg[key] += dur
        total += dur
    print(f"total device op time: {total:.2f} ms over 6 steps "
          f"({total / 60:.3f} ms/substep)")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {k:40s} {v:9.2f} ms  {100 * v / total:5.1f}%")


if __name__ == "__main__":
    main()
