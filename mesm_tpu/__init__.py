"""MESM-TPU: a TPU-native (JAX/XLA/Pallas) framework for video moment retrieval.

Re-implements the full capability surface of the MESM reference (video moment
retrieval + highlight detection with FW-/SS- modal-enhanced semantic modeling,
AAAI 2024) as an idiomatic TPU framework:

- single jitted train/eval steps (model forward + criterion + optimizer fused
  into one XLA program),
- static shapes everywhere (length buckets + masks instead of ragged ops),
- on-device Hungarian matching (no per-step host sync),
- fused Pallas attention kernels for the hot attention variants,
- `jax.sharding.Mesh`-based data parallelism over ICI.

Layer map mirrors SURVEY.md section 1; reference citations in docstrings point
into the reference tree (reference: <file>:<line>).
"""

__version__ = "0.1.0"
