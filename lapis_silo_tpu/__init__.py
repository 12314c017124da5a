"""LAPIS-SILO-TPU: a TPU-native sequence-indexing and query engine.

A from-scratch reimplementation of the capabilities of GenSpectrum/LAPIS-SILO
(reference: /root/reference) designed for TPU hardware:

- The per-(position, symbol) Roaring bitmap index becomes dense packed-u32
  bitplane tensors in HBM (``[rows, words]`` where bit ``i`` of word ``w``
  is sequence id ``w*32+i``).
- The filter-expression tree compiles to a small IR of bitwise ops that is
  evaluated as fused JAX/Pallas programs (AND/OR/NOT/THRESHOLD + popcount).
- Partitions shard across a ``jax.sharding.Mesh``; queries broadcast; counts
  and per-position histograms merge via ``psum``-style collectives.

The logical model (database_config.yaml schema, the JSON query language, the
JSON responses, snapshot versioning, the two-mode CLI) is kept exactly so the
reference's end-to-end conformance corpus passes unchanged.
"""

__version__ = "0.1.0"
