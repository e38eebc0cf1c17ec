"""Command-line drivers mirroring the reference binaries
(xrays, xkorc, xpic, xrays_bench)."""
