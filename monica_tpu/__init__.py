"""monica_tpu — a TPU-native real-time metagenomic classification engine.

A from-scratch re-design of the capabilities of DrQuestion/monica
(reference: /root/reference — a minimap2/mappy-wrapping CPU pipeline,
see `monica/monica.py`) built TPU-first on jax/XLA/Pallas:

* the genome "database + .mmi index" stage (`monica/genomes/database.py`,
  `monica/genomes/aligner.py:31-62` in the reference) becomes a packed
  reference array + sorted minimizer table resident in HBM
  (:mod:`monica_tpu.index`);
* the per-read mappy alignment loop (`monica/genomes/aligner.py:179-279`)
  becomes a batched, jit-compiled seed→chain→extend pipeline with a
  Pallas banded Smith–Waterman kernel (:mod:`monica_tpu.ops`,
  :mod:`monica_tpu.align`);
* scaling is via `shard_map` over a ('data', 'index') device mesh with
  XLA collectives (:mod:`monica_tpu.parallel`) instead of thread pools;
* abundance accumulation/normalization (`aligner.py:282-319`) is a
  device-resident count table (:mod:`monica_tpu.stats`).
"""

__version__ = "0.1.0"

from monica_tpu.utils.units import human_readable  # noqa: F401
