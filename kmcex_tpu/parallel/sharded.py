"""Multi-chip sharded counting: data-parallel reads, hash-sharded k-mer table.

The distributed design from SURVEY.md §5/§7: read segments are sharded
across the device mesh (data parallel); each device extracts + canonicalizes
its k-mers locally; k-mers are routed to their owner shard by a
multiplicative hash via ``all_to_all`` over ICI; each shard then
sort-counts its partition.  The shard-local results together form the global
count table (disjoint by construction), and ``psum`` provides global stats.

Mirrors the single-chip DeviceCountAccumulator's tiering (count/device_lsm):
routed k-mers buffer unsorted in a per-shard RAW TIER collapsed by one
sort+segment-count pass, collapsed runs merge pairwise in a per-shard LSM,
and runs past a spill threshold leave the device for host RAM where the
native two-pointer merge folds them — so the global table never needs to
fit on one chip (KMC's external-memory bins, rebuilt for a mesh).

Runs identically on a real TPU slice or on a virtual
``--xla_force_host_platform_device_count`` CPU mesh (how tests and the
driver's multi-chip dry run validate it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kmcex_tpu.count import extract

GOLDEN = jnp.uint64(0x9E3779B97F4A7C15)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("shard",))


def owner_of(kmers: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Owner shard by multiplicative (Fibonacci) hash of the canonical k-mer.

    Plain ``kmer % n`` would skew: canonical k-mers concentrate in the lower
    half of the value space (min of a k-mer and its reverse complement)."""
    h = kmers * GOLDEN
    return ((h >> jnp.uint64(32)).astype(jnp.uint32) % jnp.uint32(n_shards)).astype(
        jnp.int32
    )


def _route_local(kmers, n_valid, n: int, cap: int):
    """Local half of the exchange: group local k-mers by owner shard into
    [n, cap] send buffers (SENTINEL padding), then all_to_all."""
    owner = owner_of(kmers, n)
    order = jnp.argsort(owner)
    kmers_s = kmers[order]
    owner_s = owner[order]
    group_start = jnp.searchsorted(owner_s, jnp.arange(n, dtype=jnp.int32))
    slot = jnp.arange(kmers.shape[0]) - group_start[owner_s]
    send = jnp.full((n, cap), extract.SENTINEL, dtype=jnp.uint64)
    ok = slot < cap
    send = send.at[owner_s, jnp.where(ok, slot, 0)].set(
        jnp.where(ok, kmers_s, extract.SENTINEL)
    )
    recv = jax.lax.all_to_all(send, "shard", split_axis=0, concat_axis=0, tiled=True)
    windows = jax.lax.psum(n_valid, "shard")
    return recv.reshape(1, -1), windows


def build_route_step(mesh: Mesh, k: int, seg_rows: int, seg_len: int,
                     capacity: int | None = None, packed: bool = False):
    """Jitted routing step: one input batch -> per-shard RAW routed k-mers
    ([n_shards, n*cap] sharded, SENTINEL-padded) + global window count.
    No sorting here — raw tiers collapse later, amortizing the sort.

    ``capacity`` is the per-destination routing buffer (static shape for
    all_to_all); defaults to the worst case (every local k-mer to one
    shard), which is always exact.  ``packed`` selects the 2-bit transfer
    format (io/fastq packed segment batches)."""
    n = mesh.devices.size
    W = seg_len - k + 1
    cap = capacity or seg_rows * W

    if packed:
        def local_step(packed_b, maskbits):
            kmers, n_valid = extract.extract_canonical_packed(packed_b, maskbits, k)
            return _route_local(kmers, n_valid, n, cap)

        in_specs = (P("shard"), P("shard"))
    else:
        def local_step(codes):
            kmers, n_valid = extract.extract_canonical(codes, k)
            return _route_local(kmers, n_valid, n, cap)

        in_specs = P("shard")
    return jax.jit(
        jax.shard_map(local_step, mesh=mesh, in_specs=in_specs,
                      out_specs=(P("shard"), P()))
    )


def build_sharded_collapse(mesh: Mesh):
    """Jitted per-shard collapse: concat a shard's raw arrays and
    sort+segment-count them into a sorted unique run (no collectives —
    partitions are disjoint by the owner hash)."""
    def local(arrs):  # tuple of [1, R_i] local views
        flat = jnp.concatenate([a.reshape(-1) for a in arrs])
        u, c, nu = extract.sort_count_unique(flat)
        return u[None, :], c[None, :], nu[None].astype(jnp.int64)

    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(P("shard"),),
                      out_specs=(P("shard"), P("shard"), P("shard")))
    )


def build_sharded_merge(mesh: Mesh):
    """Jitted pairwise merge of two per-shard sorted (kmer,count) run sets
    ([n_shards, size] arrays sharded over the mesh); partitions are disjoint
    by the owner hash, so each shard merges independently — no collectives."""
    from kmcex_tpu.count.device_lsm import _merge_runs_kernel

    def local(ka, ca, kb, cb):  # local blocks [1, size]
        u, c, nu = _merge_runs_kernel(ka[0], ca[0], kb[0], cb[0])
        return u[None, :], c[None, :], nu[None]

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
            out_specs=(P("shard"), P("shard"), P("shard")),
        )
    )


# back-compat alias: the one-shot routed count step used by older tests
def build_sharded_count_step(mesh: Mesh, k: int, seg_rows: int, seg_len: int,
                             capacity: int | None = None):
    """Returns a jitted step: codes [n_shards*seg_rows, seg_len] uint8 ->
    (uniq [n_shards, M], counts [n_shards, M], n_unique [n_shards],
    windows_total scalar) — route + immediate per-shard sort-count."""
    n = mesh.devices.size
    W = seg_len - k + 1
    cap = capacity or seg_rows * W

    def local_step(codes):
        kmers, n_valid = extract.extract_canonical(codes, k)
        recv, windows = _route_local(kmers, n_valid, n, cap)
        uniq, counts, n_unique = extract.sort_count_unique(recv.reshape(-1))
        return uniq[None, :], counts[None, :], n_unique[None], windows

    return jax.jit(
        jax.shard_map(
            local_step, mesh=mesh, in_specs=P("shard"),
            out_specs=(P("shard"), P("shard"), P("shard"), P()),
        )
    )


def _pull(arr) -> np.ndarray:
    """Device->host for a (possibly multi-process) sharded array."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(arr, tiled=True)
    return np.asarray(arr)


class ShardedCountAccumulator:
    """Streaming multi-chip counting: every batch is extracted and routed to
    owner shards, raw routed k-mers buffer per shard and collapse by one
    sort+count pass per tier, collapsed runs merge in a per-shard LSM, and
    oversized runs spill to host RAM — the multi-chip mirror of
    count/device_lsm.DeviceCountAccumulator (SURVEY.md §5's distributed
    backend; the reference's only parallelism is OpenMP, kmodel.hpp:93,561).
    """

    RAW_TIER_ELEMS = 32 << 20   # per-shard raw k-mers before a collapse
    SPILL_THRESHOLD = 64 << 20  # per-shard run size that leaves HBM

    def __init__(self, mesh: Mesh, k: int, seg_rows: int, seg_len: int,
                 packed: bool = False, raw_tier_elems: int | None = None,
                 spill_threshold: int | None = None):
        self.mesh = mesh
        self.k = k
        self.n = mesh.devices.size
        self.seg_rows = seg_rows
        self.seg_len = seg_len
        self.step = build_route_step(mesh, k, seg_rows, seg_len, packed=packed)
        self.collapse = build_sharded_collapse(mesh)
        self.merge = build_sharded_merge(mesh)
        self.raw_tier_elems = raw_tier_elems or self.RAW_TIER_ELEMS
        self.spill_threshold = spill_threshold or self.SPILL_THRESHOLD
        self.raw: list = []          # [n, R_i] sharded raw arrays
        self.raw_elems = 0           # per-shard raw element count
        self.runs: list[tuple] = []  # (uniq [n, M], counts [n, M], M)
        self.host_runs: list[tuple[np.ndarray, np.ndarray]] = []
        self.total_windows = 0

    def add_batch(self, codes) -> None:
        recv, windows = self.step(codes)
        self._push_raw(recv, int(windows))

    def add_batch_packed(self, packed, maskbits) -> None:
        recv, windows = self.step(packed, maskbits)
        self._push_raw(recv, int(windows))

    def _push_raw(self, recv, windows: int) -> None:
        self.total_windows += windows
        self.raw.append(recv)
        self.raw_elems += recv.shape[1]
        if self.raw_elems >= self.raw_tier_elems:
            self._collapse_raw()

    def _collapse_raw(self) -> None:
        if not self.raw:
            return
        u, c, _ = self.collapse(tuple(self.raw))
        self.raw = []
        self.raw_elems = 0
        self._push_run(u, c)

    def _push_run(self, u, c) -> None:
        if u.shape[1] >= self.spill_threshold:
            self._spill(u, c)
            return
        self.runs.append((u, c, u.shape[1]))
        while len(self.runs) >= 2 and self.runs[-2][2] <= self.runs[-1][2]:
            kb, cb, _ = self.runs.pop()
            ka, ca, _ = self.runs.pop()
            u2, c2, _ = self.merge(ka, ca, kb, cb)
            if u2.shape[1] >= self.spill_threshold:
                self._spill(u2, c2)
                break
            self.runs.append((u2, c2, u2.shape[1]))

    def _spill(self, u, c) -> None:
        """Pull a per-shard run set to host RAM: per-shard partitions are
        concatenated shard-major (each shard's slice stays sorted), then
        folded into per-shard host run lists by the native merge."""
        ku = _pull(u)
        kc = _pull(c).astype(np.uint32, copy=False)
        from kmcex_tpu import native

        parts_k, parts_c = [], []
        for s in range(self.n):
            row_k, row_c = ku[s], kc[s]
            real = row_k != np.uint64(0xFFFFFFFFFFFFFFFF)
            parts_k.append(row_k[real])
            parts_c.append(row_c[real])
        # merge against the existing host level, shard by shard
        if not self.host_runs:
            self.host_runs = [(parts_k[s], parts_c[s]) for s in range(self.n)]
        else:
            self.host_runs = [
                native.merge_runs(self.host_runs[s][0], self.host_runs[s][1],
                                  parts_k[s], parts_c[s])
                for s in range(self.n)
            ]

    def _merge_all_device(self):
        self._collapse_raw()
        while len(self.runs) >= 2:
            kb, cb, _ = self.runs.pop()
            ka, ca, _ = self.runs.pop()
            u, c, _ = self.merge(ka, ca, kb, cb)
            self.runs.append((u, c, u.shape[1]))

    def _host_table(self, ci: int, cs: int) -> tuple[np.ndarray, np.ndarray]:
        """Merge everything down to one global host-side sorted table."""
        self._merge_all_device()
        if self.runs:
            u, c, _ = self.runs.pop()
            self._spill(u, c)
        if not self.host_runs:
            return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint32)
        ku = np.concatenate([r[0] for r in self.host_runs])
        kc = np.concatenate([r[1] for r in self.host_runs])
        keep = kc >= ci
        ku, kc = ku[keep], np.minimum(kc[keep], np.uint32(cs))
        order = np.argsort(ku, kind="stable")
        return ku[order], kc[order]

    def finalize(self, ci: int = 1, cs: int = 0xFFFFFFFF):
        """Returns global host-side (kmers, counts) sorted ascending."""
        return self._host_table(ci, cs)

    def finalize_stream(self, ci: int = 1, cs: int = 0xFFFFFFFF,
                        n_chunks: int = 16):
        """Streaming finalize with the same (total, low_hist, chunk_iter)
        contract as DeviceCountAccumulator.finalize_stream, so the encode
        pipeline can consume either accumulator."""
        kmers, counts = self._host_table(ci, cs)
        total = len(kmers)
        hist = np.array(
            [np.count_nonzero(counts == ci + i) for i in range(3)],
            dtype=np.int64,
        )
        m = max(1, -(-total // max(n_chunks, 1)))

        def it():
            for a in range(0, total, m):
                yield kmers[a : a + m], counts[a : a + m]

        return total, hist, it()


def sharded_count(codes: np.ndarray, mesh: Mesh, k: int):
    """Count canonical k-mers of one batch across the mesh; returns merged
    host-side (kmers, counts) plus the per-shard partitions."""
    n = mesh.devices.size
    rows = codes.shape[0]
    assert rows % n == 0, "batch rows must divide the mesh"
    step = build_sharded_count_step(mesh, k, rows // n, codes.shape[1])
    uniq, counts, n_unique, windows = step(codes)
    uniq = np.asarray(uniq)
    counts = np.asarray(counts)
    n_unique = np.asarray(n_unique)
    parts = [(uniq[i, : n_unique[i]], counts[i, : n_unique[i]]) for i in range(n)]
    merged_k = np.concatenate([p[0] for p in parts])
    merged_c = np.concatenate([p[1] for p in parts])
    order = np.argsort(merged_k)
    return merged_k[order], merged_c[order], parts, int(windows)
