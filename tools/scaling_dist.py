"""SCALING_DIST artifact: constant-work 1-process vs 2-process timing.

Same 8 virtual CPU devices, same global mesh, same sharded EFIT
cold-plasma step over the same ray ensemble - arranged as ONE process
owning all 8 devices vs TWO jax.distributed processes owning 4 each.
Three step variants isolate where multi-process time goes:

  * collective_per_step - the Newton-style ensemble max (the workload's
    one collective, SURVEY.md section 2.6) crosses processes and is read
    back on the host EVERY step: the r4 configuration (86% parity), an
    upper bound on coordination cost;
  * collective_every_10 - the converge-item amortization: steps dispatch
    asynchronously, the max is computed per step on device but only read
    back (forcing the cross-process sync) every 10th step - the
    reference's converge loop reads its max every iteration, but nothing
    in the Newton criterion needs the HOST to see it every step;
  * collective_free - the production trace configuration: the blocked
    shard_map step (parallel/mesh.run_blocked_sharded) with no residual
    reduction at all, one device sync at the end - the reference's
    actual step loop (zero communication, xrays.cpp:419-527).

HONEST CAVEAT (carried from SCALING_r03): these are virtual XLA:CPU
devices on one physical host - the artifact measures SPMD partitioning +
process-coordination overhead, not real-pod ICI behavior.  Both
processes share the same cores, so wall-clock parity (efficiency ~ 1.0)
is the ideal result, not speedup.

Writes SCALING_DIST_r05.json at the repo root.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

_BODY = r"""
import os, sys, time, json
nproc = int(sys.argv[1]); pid = int(sys.argv[2]); port = sys.argv[3]
repo = sys.argv[4]
ndev_local = 8 // nproc
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev_local}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, repo)
if nproc > 1:
    from graph_framework_tpu.parallel import distributed
    distributed.initialize("localhost:" + port, num_processes=nproc,
                           process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.device_count() == 8, jax.device_count()

from graph_framework_tpu.models import make_efit
from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.models.rays import RayState, residual_fn
from graph_framework_tpu.solver import Solver
from graph_framework_tpu.parallel.mesh import make_blocked_sharded_fn

mesh = Mesh(np.asarray(jax.devices()), ("rays",))
sharding = NamedSharding(mesh, P("rays"))

N = 16384
host_vals = dict(
    t=np.zeros(N), w=np.full(N, 500.0),
    x=np.full(N, 2.2), y=np.zeros(N), z=np.zeros(N),
    kx=np.full(N, -300.0), ky=np.full(N, 150.0), kz=np.zeros(N))

def dist_arr(a):
    a = a.astype(np.float32)
    return jax.make_array_from_callback(a.shape, sharding, lambda i: a[i])

state = RayState(**dict((k, dist_arr(v)) for k, v in host_vals.items()))
eq = make_efit("/root/reference/graph_tests/efit.nc", dtype=jnp.float32)
sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1.0e-5, sub_steps=2)
res = residual_fn(disp.cold_plasma, eq)
raw = sol.raw_step_fn()
K = 120     # long enough that per-variant wall clock is O(seconds):
#             30-step runs measured +/-20% run-to-run on the shared host
out = dict(nproc=nproc, steps=K, rays=N)

@jax.jit
def step(s):
    s2 = raw(s)
    # the workload's one collective: the Newton-style ensemble max
    return s2, jnp.max(res(s2))

REPS = 3      # best-of: the shared-host scheduler adds +/-10-20% noise
#               per run; the MIN estimates the coordination floor

# -- variant A: collective + host readback every step ---------------------
s, m = step(state); jax.block_until_ready(m)          # compile
times = []
for _ in range(REPS):
    s = state
    t0 = time.perf_counter()
    for _ in range(K):
        s, m = step(s)
        float(m)                 # host sync each step (collective + readback)
    times.append(time.perf_counter() - t0)
el = min(times)
out["collective_per_step"] = dict(t_steps_s=round(el, 3),
    t_all=[round(t, 3) for t in times],
    ray_steps_per_s=round(N * K * 2 / el, 1), gmax=float(m))

# -- variant B: collective amortized - readback every 10th step -----------
times = []
for _ in range(REPS):
    s = state
    t0 = time.perf_counter()
    for i in range(K):
        s, m = step(s)
        if (i + 1) % 10 == 0:
            float(m)             # converge check cadence
    float(m)
    times.append(time.perf_counter() - t0)
el = min(times)
out["collective_every_10"] = dict(t_steps_s=round(el, 3),
    t_all=[round(t, 3) for t in times],
    ray_steps_per_s=round(N * K * 2 / el, 1), gmax=float(m))

# -- variant C: collective-free blocked shard_map (production trace) ------
cfree = make_blocked_sharded_fn(sol, K, mesh, block_rays=1024)
warm = cfree(state)
jax.block_until_ready(warm)
times = []
for _ in range(REPS):
    t0 = time.perf_counter()
    got = cfree(state)
    jax.block_until_ready(got)
    times.append(time.perf_counter() - t0)
el = min(times)
out["collective_free"] = dict(t_steps_s=round(el, 3),
    t_all=[round(t, 3) for t in times],
    ray_steps_per_s=round(N * K * 2 / el, 1),
    # multi-process global array: only local shards are addressable
    x0=float(np.asarray(got.x.addressable_shards[0].data)[0]))

if pid == 0:
    print(json.dumps(out), flush=True)
"""


def run_mode(nproc):
    body = _BODY
    with socket.socket() as so:
        so.bind(("", 0))
        port = so.getsockname()[1]
    script = "/tmp/scaling_dist_worker.py"
    with open(script, "w") as fh:
        fh.write(body)
    procs = [subprocess.Popen(
        [sys.executable, script, str(nproc), str(pid), str(port),
         str(REPO)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)]
    outs = [p.communicate(timeout=1800) for p in procs]
    for p, (o, e) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{e[-2000:]}")
    line = [ln for ln in outs[0][0].splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    r1 = run_mode(1)
    r2 = run_mode(2)
    effs = {v: round(r1[v]["t_steps_s"] / r2[v]["t_steps_s"], 4)
            for v in ("collective_per_step", "collective_every_10",
                      "collective_free")}
    out = dict(
        metric="constant-work 8-device step time: 1 process vs 2 "
               "jax.distributed processes (EFIT cold-plasma rk4, "
               "16384 rays f32) across coordination variants",
        one_process=r1, two_process=r2,
        efficiency_1p_over_2p=effs,
        caveat="virtual XLA:CPU devices on one physical host: measures "
               "SPMD partitioning + multi-process coordination overhead "
               "at constant silicon, not real-pod ICI; ideal result is "
               "parity (~1.0), not speedup",
    )
    g1 = r1["collective_per_step"]["gmax"]
    g2 = r2["collective_per_step"]["gmax"]
    assert g1 == g2 or abs(g1 - g2) <= 1e-6 * abs(g1), (g1, g2)
    with open(REPO / "SCALING_DIST_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
