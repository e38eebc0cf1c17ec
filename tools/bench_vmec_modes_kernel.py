"""Time the fused VMEC mode-sum kernel vs the plain-JAX path on the chip.

Run: python tools/bench_vmec_modes_kernel.py
"""

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_framework_tpu.pallas.vmec_modes import (
    make_mode_sums, _reference_forward)

N = int(os.environ.get("BENCH_RAYS", 100_000))
M = 90


def timeit(name, fn, args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    argsets = [[a + jnp.asarray(1e-6 * (i + 1), a.dtype) for a in args]
               for i in range(reps)]
    t0 = time.perf_counter()
    outs = [fn(*aa) for aa in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:32s} {dt * 1e3:8.3f} ms", flush=True)


def main():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 7)
    u = jax.random.uniform(ks[0], (N,), jnp.float32, 0.0, 6.0)
    v = jax.random.uniform(ks[1], (N,), jnp.float32, 0.0, 6.0)
    blocks = [jax.random.normal(ks[i], (N, M), jnp.float32)
              for i in range(2, 7)]
    xm = jnp.asarray(np.repeat(np.arange(10.0), 9), jnp.float32)
    xn = jnp.asarray(np.tile(np.arange(9.0) - 4.0, 10), jnp.float32)
    args = (u, v, *blocks)

    fused = make_mode_sums(xm, xn, block=1024)
    plain = jax.jit(lambda *a: _reference_forward(*a, xm, xn))

    timeit("pallas fused fwd", jax.jit(fused), args)
    timeit("plain-JAX fwd", plain, args)

    # fwd+bwd (the RHS pattern: cotangent through everything)
    def mk_loss(f):
        def loss(*a):
            out = f(*a)
            return sum(jnp.sum(o) for o in out)
        return jax.jit(jax.grad(loss, argnums=tuple(range(7))))

    timeit("pallas fused fwd+bwd", mk_loss(fused), args)
    timeit("plain-JAX fwd+bwd", mk_loss(
        lambda *a: _reference_forward(*a, xm, xn)), args)

    # value check on-chip
    got = fused(*args)
    want = plain(*args)
    err = max(float(jnp.max(jnp.abs(g - w))) for g, w in zip(got, want))
    print("max |fused - plain| on-chip:", err)


if __name__ == "__main__":
    main()
