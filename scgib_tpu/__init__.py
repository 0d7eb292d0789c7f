"""scgib_tpu — a TPU-native framework for the S-CGIB model family.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
S-CGIB implementation (O-JounLee/S-CGIB, AAAI 2025): self-supervised graph
pretraining with a subgraph-conditioned information bottleneck, domain
adaptation, and molecular-property fine-tuning — built for padded static
shapes, segment-reduction message passing, and `jax.sharding` data
parallelism over TPU meshes.
"""

__version__ = "0.1.0"

from .graph.container import GraphBatch, SubgraphBatch  # noqa: F401
