"""strive_tpu — a TPU-native rebuild of the STRIVE scenario-generation framework.

Reference: nv-tlabs/STRIVE ("Generating Useful Accident-Prone Driving Scenarios
via a Learned Traffic Prior", CVPR 2022). This package re-implements every
capability of the reference (see /root/reference) as an idiomatic JAX/Flax/
Pallas framework designed for TPU:

- dense padded scene batches (``strive_tpu.scene``) instead of
  torch-geometric dynamic graphs,
- ``lax.scan`` autoregressive rollouts instead of Python loops,
- jit-compiled latent-optimization loops instead of eager Adam steps,
- masked dense pairwise interaction instead of edge-list message passing,
- an XLA/Pallas map-gather kernel instead of advanced-indexing crops,
- vectorized oriented-box IoU instead of Shapely polygon loops.

Numerical semantics (frame transforms, bicycle dynamics, loss definitions,
normalization constants, scenario-JSON schema) match the reference exactly;
docstrings cite reference file:line for parity checking.
"""

__version__ = "0.1.0"
