"""End-to-end pipeline: FASTQ -> counts -> KModel -> saved model dir.

The TPU-native equivalent of the reference CLI run (main.cpp:129-150):
where the reference shells out to the kmc binary and then re-reads its
database, this pipeline streams reads through the device extraction/count
kernels, optionally materializes a KMC1-format database (drop-in compatible
with the vendored KMC API), and encodes the KModel.
"""

from __future__ import annotations

import dataclasses
import pathlib
import time

import numpy as np

from kmcex_tpu.config import KParams
from kmcex_tpu.count.counter import CountAccumulator
from kmcex_tpu.io import fastq, kmc_db
from kmcex_tpu.model.kmodel import KModel, get_model


@dataclasses.dataclass
class PipelineStats:
    reads: int = 0
    bases: int = 0
    windows: int = 0
    distinct_kmers: int = 0
    count_seconds: float = 0.0
    encode_seconds: float = 0.0
    phases: dict = dataclasses.field(default_factory=dict)


def count_fastq(
    input_spec: str,
    k: int = 31,
    ci: int = 1,
    cs: int = 1023,
    seg_len: int | None = None,
    batch_segs: int = fastq.DEFAULT_BATCH_SEGS,
    accumulator: str = "device",
    mesh=None,
) -> tuple[np.ndarray, np.ndarray, PipelineStats]:
    """Count canonical k-mers in FASTQ/FASTA input.

    ``seg_len=None`` auto-sizes segments to the observed read length so no
    window slots are wasted on padding.  ``accumulator="device"`` keeps all
    run merging in HBM on one chip (one host transfer total); "sharded"
    runs the hash-routed multi-chip accumulator over ``mesh`` (defaults to
    all devices); "host" is the NumPy LSM."""
    t0 = time.time()
    if seg_len is None:
        sniffed = fastq.sniff_read_length(input_spec)
        seg_len = min(512, max(k + 33, sniffed))
    seg_len = (seg_len + 7) & ~7  # packed path needs L % 8 == 0
    # The producer threads overlap parsing+packing (one native pass) and the
    # h2d copy (the relay link on this rig is ~33MB/s; packed codes are 4x
    # smaller) with device dispatch.
    from kmcex_tpu.utils import prefetch_iterator

    if accumulator == "device":
        import jax

        from kmcex_tpu.count.device_lsm import DeviceCountAccumulator

        stream = fastq.SegmentStream(input_spec, k, seg_len, batch_segs, packed=True)
        acc = DeviceCountAccumulator(k)
        parsed = prefetch_iterator(iter(stream), depth=2)
        for packed, maskbits in prefetch_iterator(
            parsed, depth=2, transform=jax.device_put
        ):
            acc.add_batch_packed(packed, maskbits)
    elif accumulator == "sharded":
        import jax

        from kmcex_tpu.parallel.sharded import ShardedCountAccumulator, make_mesh

        if mesh is None:
            mesh = make_mesh()
        n = int(mesh.devices.size)
        batch_segs = max(n, (batch_segs // n) * n)  # rows divide the mesh
        stream = fastq.SegmentStream(input_spec, k, seg_len, batch_segs, packed=True)
        acc = ShardedCountAccumulator(mesh, k, batch_segs // n, seg_len,
                                      packed=True)
        from jax.sharding import NamedSharding, PartitionSpec

        row_sharded = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        put = lambda t: jax.device_put(t, row_sharded)
        parsed = prefetch_iterator(iter(stream), depth=2)
        for packed, maskbits in prefetch_iterator(parsed, depth=2, transform=put):
            acc.add_batch_packed(packed, maskbits)
    else:
        stream = fastq.segment_batches(input_spec, k, seg_len, batch_segs)
        acc = CountAccumulator(k)
        for codes in prefetch_iterator(iter(stream), depth=3):
            acc.add_batch(codes)
    kmers, counts = acc.finalize(ci, cs)
    stats = PipelineStats(
        reads=stream.reads,
        bases=stream.bases,
        windows=acc.total_windows,
        distinct_kmers=len(kmers),
        count_seconds=time.time() - t0,
    )
    return kmers, counts, stats


def count_encode(
    input_spec: str,
    k: int = 31,
    ci: int = 1,
    cs: int = 1023,
    num_hash: int = 7,
    num_bit: int = 5,
    seg_len: int | None = None,
    batch_segs: int = fastq.DEFAULT_BATCH_SEGS,
    keep_pairs: bool = True,
) -> tuple[KModel, np.ndarray | None, np.ndarray | None, PipelineStats]:
    """Count + encode with the device->host table pull overlapping the host
    encode (streaming chunks; bit-identical to the two-phase build).

    Returns (model, kmers, counts, stats); kmers/counts are None unless
    ``keep_pairs`` (they cost host memory, not time)."""
    from kmcex_tpu.utils.timing import Phases, device_trace

    ph = Phases()
    t0 = time.time()
    with device_trace("count_encode"):
        with ph.phase("sniff_read_length"):
            if seg_len is None:
                sniffed = fastq.sniff_read_length(input_spec)
                seg_len = min(512, max(k + 33, sniffed))
            seg_len = (seg_len + 7) & ~7
        stream = fastq.SegmentStream(input_spec, k, seg_len, batch_segs, packed=True)
        import jax

        from kmcex_tpu.count.device_lsm import DeviceCountAccumulator
        from kmcex_tpu.utils import prefetch_iterator

        acc = DeviceCountAccumulator(k)

        # two producer stages: thread A parses + 2-bit packs (one native
        # pass), thread B copies to device; the main thread only dispatches —
        # parse, h2d and device compute all overlap
        with ph.phase("stream+extract"):
            parsed = prefetch_iterator(iter(stream), depth=2)
            for packed, maskbits in prefetch_iterator(
                parsed, depth=2, transform=jax.device_put
            ):
                acc.add_batch_packed(packed, maskbits)
        with ph.phase("merge+stats"):
            total, low_hist, chunks = acc.finalize_stream(ci, cs)
        # a producer thread owns the device->host pulls, the delta decode AND
        # the per-chunk counter routing (model.kmodel.split_chunk) so the
        # (GIL-releasing) native encode on the main thread only feeds
        from kmcex_tpu.model.kmodel import split_chunk

        bf_num = 1 if ci == 1 else 3
        collected: list[tuple[np.ndarray, np.ndarray]] = []

        def produce(item):
            ku, kc = item
            if keep_pairs:
                collected.append((ku, kc))
            return split_chunk(ku, kc, ci, bf_num)

        chunks = prefetch_iterator(chunks, depth=4, transform=produce)
        t_count = time.time() - t0

        km = get_model(ci, cs, num_hash, num_bit)
        with ph.phase("transfer+encode"):
            km.init_from_chunks(chunks, k, total, low_hist)
        for name, secs in getattr(km, "encode_phases", {}).items():
            ph.add(f"encode.{name}", secs)
        t_total = time.time() - t0
    kmers = counts = None
    if keep_pairs:
        kmers = np.concatenate([x[0] for x in collected]) if collected else np.zeros(0, np.uint64)
        counts = np.concatenate([x[1] for x in collected]) if collected else np.zeros(0, np.uint32)
    stats = PipelineStats(
        reads=stream.reads,
        bases=stream.bases,
        windows=acc.total_windows,
        distinct_kmers=total,
        count_seconds=t_count,
        encode_seconds=t_total - t_count,
        phases=dict(ph.seconds),
    )
    return km, kmers, counts, stats


def run(params: KParams, save_dir: str | None = None,
        write_db: bool = True) -> tuple[KModel, PipelineStats]:
    """Full kmcEx-equivalent run: count, (optionally) write the KMC1 DB to
    ``output_file_name``, build + save the model under
    ``working_directory/<basename>`` (main.cpp:143-149)."""
    if params.t:
        from kmcex_tpu import native

        native.set_num_threads(params.t)
    km, kmers, counts, stats = count_encode(
        params.input_file_name, params.k, params.ci, params.cs,
        params.num_hash, params.num_bit,
    )
    if write_db and params.output_file_name:
        kmc_db.write_kmc1(
            params.output_file_name, kmers, counts.astype(np.uint64), params.k,
            min_count=params.ci, max_count=params.cs,
        )
    if save_dir is None and params.output_file_name:
        base = pathlib.Path(params.output_file_name).name
        save_dir = str(pathlib.Path(params.working_directory) / base)
    if save_dir:
        km.save(save_dir)
    return km, stats
