"""Multi-chip sharded counting: data-parallel reads, hash-sharded k-mer table.

The distributed design from SURVEY.md §5/§7: read segments are sharded
across the device mesh (data parallel); each device extracts + canonicalizes
its k-mers locally; k-mers are routed to their owner shard by a
multiplicative hash via ``all_to_all`` over ICI; each shard then
sort-counts its partition.  The shard-local results together form the global
count table (disjoint by construction), and ``psum`` provides global stats.

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


def build_sharded_count_step(mesh: Mesh, k: int, seg_rows: int, seg_len: int,
                             capacity: int | None = None):
    """Returns a jitted step: codes [n_shards*seg_rows, seg_len] uint8 ->
    (uniq [n_shards, M], counts [n_shards, M], n_unique [n_shards],
    windows_total scalar), where row-blocks of codes are sharded over the
    mesh and the outputs are shard-local count tables.

    ``capacity`` is the per-destination routing buffer (static shape for
    all_to_all); defaults to the worst case (every local k-mer to one shard),
    which is always exact.  Smaller values trade memory for an overflow that
    drops k-mers (asserted against in tests), so the default stays exact.
    """
    n = mesh.devices.size
    W = seg_len - k + 1
    local_kmers = seg_rows * W
    cap = capacity or local_kmers
    M = n * cap

    def local_step(codes):  # codes: [seg_rows, seg_len] per shard
        kmers, n_valid = extract.extract_canonical(codes, k)  # [seg_rows*W]
        owner = owner_of(kmers, n)
        # sentinels route to shard of their hash; they sort to the tail and
        # are dropped by sort_count_unique anyway.
        order = jnp.argsort(owner)
        kmers_s = kmers[order]
        owner_s = owner[order]
        # slot within destination group
        group_start = jnp.searchsorted(owner_s, jnp.arange(n, dtype=jnp.int32))
        slot = jnp.arange(kmers.shape[0]) - group_start[owner_s]
        send = jnp.full((n, cap), extract.SENTINEL, dtype=jnp.uint64)
        ok = slot < cap
        send = send.at[owner_s, jnp.where(ok, slot, 0)].set(
            jnp.where(ok, kmers_s, extract.SENTINEL)
        )
        # exchange: piece j -> shard j
        recv = jax.lax.all_to_all(send, "shard", split_axis=0, concat_axis=0, tiled=True)
        uniq, counts, n_unique = extract.sort_count_unique(recv.reshape(-1))
        windows = jax.lax.psum(n_valid, "shard")
        return (
            uniq[None, :],
            counts[None, :],
            n_unique[None],
            windows,
        )

    step = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=P("shard"),
            out_specs=(P("shard"), P("shard"), P("shard"), P()),
        )
    )
    return step


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


class ShardedCountAccumulator:
    """Streaming multi-chip counting: every batch is extracted and routed to
    owner shards (``build_sharded_count_step``), producing per-shard sorted
    runs that accumulate in a per-shard LSM (pairwise sharded merges, no
    collectives after the initial all_to_all).  The TPU analogue of KMC's
    out-of-core bins: the global table never exists on one chip.

    Cites: the distributed design in SURVEY.md §5; single-chip counterpart
    count/device_lsm.DeviceCountAccumulator."""

    def __init__(self, mesh: Mesh, k: int, seg_rows: int, seg_len: int):
        self.mesh = mesh
        self.k = k
        self.n = mesh.devices.size
        self.seg_rows = seg_rows
        self.seg_len = seg_len
        self.step = build_sharded_count_step(mesh, k, seg_rows, seg_len)
        self.merge = build_sharded_merge(mesh)
        self.runs: list[tuple[jnp.ndarray, jnp.ndarray, int]] = []
        self.total_windows = 0

    def add_batch(self, codes: np.ndarray) -> None:
        uniq, counts, _, windows = self.step(codes)
        self.total_windows += int(windows)
        self.runs.append((uniq, counts, uniq.shape[1]))
        while len(self.runs) >= 2 and self.runs[-2][2] <= self.runs[-1][2]:
            kb, cb, _ = self.runs.pop()
            ka, ca, _ = self.runs.pop()
            u, c, _ = self.merge(ka, ca, kb, cb)
            self.runs.append((u, c, u.shape[1]))

    def finalize(self, ci: int = 1, cs: int = 0xFFFFFFFF):
        """Merge everything; returns global host-side (kmers, counts) sorted
        ascending (per-shard partitions are pulled and merged on host)."""
        while len(self.runs) >= 2:
            kb, cb, _ = self.runs.pop()
            ka, ca, _ = self.runs.pop()
            u, c, _ = self.merge(ka, ca, kb, cb)
            self.runs.append((u, c, u.shape[1]))
        if not self.runs:
            return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint32)
        u, c, _ = self.runs[0]
        if jax.process_count() > 1:
            # per-shard partitions live on remote hosts too: gather the
            # global value to every process (model building replicates).
            from jax.experimental import multihost_utils

            u = multihost_utils.process_allgather(u, tiled=True)
            c = multihost_utils.process_allgather(c, tiled=True)
        ku = np.asarray(u).reshape(-1)
        kc = np.asarray(c).reshape(-1).astype(np.uint32)
        real = (ku != np.uint64(0xFFFFFFFFFFFFFFFF)) & (kc >= ci)
        ku, kc = ku[real], kc[real]
        order = np.argsort(ku, kind="stable")
        return ku[order], np.minimum(kc[order], np.uint32(cs))


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
