"""Pallas TPU kernels.

Status of the Pallas investigation for this framework (measured on the
v5e backend, see commit history):

* The ray-tracing hot loop is dominated by spline-coefficient gathers.
  Mosaic lowers only same-shape shuffle gathers, so a VMEM-table
  ``jnp.take`` inside a kernel fails to lower; the workable in-kernel
  alternative (one-hot matmul on the MXU) measures within ~25% of XLA's
  native gather (2.5 ms vs 3.1 ms per 1e5 bicubic evals), which does not
  justify a hand-written kernel for the spline path.
* Elementwise physics (Boris rotation, split-complex weak damping) is
  already fully fused by XLA.
* The PIC deposit is a genuine block-reduction workload and ships here as
  a Pallas kernel (``deposit_pallas``, validated on-chip against the dense
  sum to f32 precision).  Measured on v5e (1M particles x 1024 grid):
  Pallas 12.8 ms vs XLA-scan 6.5 ms - XLA's pipelining wins, so
  models/pic keeps the XLA path as default and the kernel stands as the
  documented Pallas pattern for this framework.  (An unaligned (2, tile)
  output block also silently wedged the device - output blocks must
  respect the (8, 128) f32 tile.)
"""

from graph_framework_tpu.pallas.deposit import deposit_pallas  # noqa: F401
