"""Pure-Python/pandas batch kernels — the byte-parity core.

These functions never import Spark. They are used (a) inside Arrow
pandas UDFs on executors and (b) driver-side as the gold generator for
parity tests, guaranteeing the distributed pipeline and the oracle share
one implementation of the reference's exact text semantics.
"""
