"""kmcex_tpu — a TPU-native k-mer counting and frequency-encoding framework.

A from-scratch rebuild of the capabilities of kmcEx (lzhLab/kmcEx): count
canonical k-mers in FASTQ reads, encode (k-mer, count) pairs into the compact
probabilistic "KModel" (Bloom-filter bank + coupled bit arrays + exact rest
store), serialize it byte-compatibly (``header``/``km.bin``/``rest.bin``), and
answer approximate ``kmer_to_occ`` queries — with the counting and query hot
paths running batched on TPU via JAX/XLA and the sequential encode phase in
native C++.

Layer map (cf. SURVEY.md §7):
  core/      k-mer math: 2-bit codec, canonicalization, MurmurHash64A, OccuBin
  io/        FASTQ ingestion + KMC database reader/writer (KMC1 + KMC2)
  count/     the counting engine (replaces the external ``kmc`` binary)
  model/     KModel encode: Bloom bank, coupled bit arrays, rest store, ser/de
  query/     batched on-device kmer_to_occ probe kernels
  parallel/  multi-chip sharding: mesh, all_to_all k-mer routing, merged counts
  native/    C++ runtime pieces (sequential bit-array encoder, FASTQ parser)

The framework requires 64-bit integer support (k-mers are 2-bit packed into
uint64); we enable jax x64 mode at import, before any tracing happens.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: compilation on this rig goes through a
# remote-compile tunnel at ~20-60s per program, so caching across processes
# turns every warm start from minutes into milliseconds.
_cache_dir = _os.environ.get(
    "KMCEX_JAX_CACHE", _os.path.expanduser("~/.cache/kmcex_jax")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # cache flags are best-effort across jax versions
    pass

from kmcex_tpu.config import KParams  # noqa: E402
from kmcex_tpu.model.kmodel import KModel, get_model, load_model  # noqa: E402

__version__ = "0.1.0"

__all__ = ["KParams", "KModel", "get_model", "load_model", "__version__"]
