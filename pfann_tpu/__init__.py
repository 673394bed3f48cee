"""pfann_tpu — TPU-native neural audio fingerprinting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of stdio2016/pfann
(an unofficial PyTorch implementation of "Neural Audio Fingerprint for
High-specific Audio Retrieval based on Contrastive Learning", arXiv
2010.11910, plus thesis improvements).

Design principles (TPU-first, not a port):
  * The compute path (mel front-end, fingerprint encoder, NT-Xent loss,
    MIPS search, sequence rerank) is pure JAX: jittable, static shapes,
    bf16 on the MXU where it matters.
  * Retrieval replaces faiss IVF-PQ with device-resident brute-force /
    approximate MIPS top-k over an (optionally ICI-sharded) embedding
    matrix — exact search gives recall >= the reference's IVF-PQ by
    construction; `jax.lax.approx_max_k` gives the TPU-native fast path.
  * The C++/OpenMP rerank kernel (reference cpp/seqscore.cpp) becomes a
    vectorized gather + batched dot + segment-max, fully on device.
  * Parallelism is green-field: data-parallel training and DB-sharded
    search over a `jax.sharding.Mesh` (the reference is single-GPU).

Layer map mirrors SURVEY.md section 1; CLI contracts (train.py,
builder.py, matcher.py, DB directory layout) are preserved.
"""

__version__ = "0.1.0"
