"""Round-4 probe: why does the 1M-ray EFIT bench run 30% below 100k?

Hypothesis (VERDICT r3 next-1): working-set locality - the 10-substep
kernel at 1M rays streams 8 x 4 MB state arrays plus every fused
intermediate through HBM, where the 100k shape keeps more of the substep
chain resident.  If true, scanning the ensemble in 100k-ray blocks
inside one jitted call should restore ~100k-shape throughput.

Usage: python tools/probe_1m_chunking.py [rays] [steps]
Writes one JSON line per configuration.  TPU-serialized: run alone.
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_framework_tpu.models import make_efit
from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.solver import Solver, make_ray_state

EFIT_FILE = "/root/reference/graph_tests/efit.nc"

RAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 60
SUB = 10


def run(block):
    eq = make_efit(EFIT_FILE, dtype=jnp.float32)
    state = make_ray_state(RAYS, w=500.0, x=2.5, y=0.0, z=0.0,
                           kx=-477.723, ky=150.0, kz=0.0,
                           dtype=jnp.float32)
    sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1.0e-4,
                 sub_steps=SUB)
    raw = sol.raw_step_fn()

    if block and block < RAYS:
        nb = RAYS // block

        def stepper(carry):
            return jax.lax.map(raw, carry)

        carry = jax.tree.map(lambda a: a.reshape(nb, block), state)
    else:
        stepper = raw
        carry = state

    step = jax.jit(stepper, donate_argnums=(0,))

    t0 = time.perf_counter()
    carry = step(carry)
    jax.block_until_ready(carry)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(STEPS - 1):
        carry = step(carry)
    jax.block_until_ready(carry)
    elapsed = time.perf_counter() - t0
    rsps = RAYS * (STEPS - 1) * SUB / elapsed
    print(json.dumps({
        "block": block or RAYS, "rays": RAYS, "steps": STEPS,
        "t_compile_s": round(t_compile, 2),
        "t_steps_s": round(elapsed, 2),
        "ray_steps_per_s": round(rsps, 1),
        "final_x0": float(jax.tree.leaves(carry)[0].ravel()[0]),
    }), flush=True)


if __name__ == "__main__":
    blocks = os.environ.get("PROBE_BLOCKS", "0,500000,250000,125000,62500")
    for b in [int(x) for x in blocks.split(",")]:
        run(b)
