"""blp_tpu — a TPU-native framework for description-based knowledge-graph
link prediction (the BLP model family).

Re-designed from scratch for JAX/XLA/Pallas/pjit: functional model cores over
pytrees, fixed-shape batching, SPMD sharding over device meshes, and Pallas
kernels for the hot scoring/ranking paths.

Capability parity target: dfdazac/blp (see SURVEY.md). Reference citations in
docstrings point at /root/reference files purely to document behavioural
parity; the implementation here is original TPU-first code.
"""

__version__ = "0.1.0"
