"""ntsm_tpu — a TPU-native sample-swap detection framework.

A from-scratch reimplementation of the capabilities of ntsm (Nucleotide
Sequence/Sample Matcher, JustinChu/ntsm v1.2.1) designed for TPU hardware:

* k-mer counting (``ntsm count``) runs as a JAX/XLA (and Pallas) pipeline over
  batched, 2-bit-encoded reads with an HBM-resident static hash table and
  data-parallel sharding over a device mesh (reference: src/FingerPrint.hpp).
* sample comparison (``ntsm eval``) is dense linear algebra: genotype one-hot
  matmuls on the MXU for relatedness/IBS tallies and a blocked pairwise pass
  for the log-likelihood score (reference: src/CompareCounts.hpp).
* PCA projection + candidate pre-filter replace the reference's nanoflann
  kd-tree with a batched distance computation (reference: src/KDTreeUtil.h).
* ``ntsm vcf`` and ``ntsm sitegen`` cover synthetic count generation and
  offline site-set construction (reference: src/VCFConvert.hpp, ntsm-scripts/).

Output files (counts.txt, summary.tsv) are byte-compatible with the
reference implementation.
"""

import jax as _jax

# The k-mer space is 2k bits (k <= 32): the rolling encoder and the
# invertible hash64 (reference: vendor/KseqHashIterator.hpp:129-139) need
# uint64 arithmetic, which JAX only exposes with x64 enabled.  TPUs emulate
# 64-bit integer ops; all hot-path floating point stays explicitly f32.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from ntsm_tpu.options import Options  # noqa: E402,F401
