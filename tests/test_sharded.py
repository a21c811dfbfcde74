"""Multi-device sharded counting on the virtual 8-device CPU mesh."""

import numpy as np

from kmcex_tpu.core import codec
from kmcex_tpu.count import extract
from kmcex_tpu.parallel import sharded


def _random_codes(rng, rows, seg_len, n_rate=0.02):
    codes = rng.integers(0, 4, size=(rows, seg_len)).astype(np.uint8)
    codes[rng.random(codes.shape) < n_rate] = 255
    return codes


def test_sharded_count_matches_single_device():
    rng = np.random.default_rng(0)
    k = 21
    codes = _random_codes(rng, 64, 96)
    mesh = sharded.make_mesh(8)
    kmers, counts, parts, windows = sharded.sharded_count(codes, mesh, k)

    # single-device truth
    flat, n_valid = extract.extract_canonical(codes, k)
    flat = np.asarray(flat)
    flat = flat[flat != 0xFFFFFFFFFFFFFFFF]
    want_k, want_c = np.unique(flat, return_counts=True)
    np.testing.assert_array_equal(kmers, want_k)
    np.testing.assert_array_equal(counts, want_c.astype(counts.dtype))
    assert windows == int(n_valid)

    # shards are disjoint and complete
    total = sum(len(p[0]) for p in parts)
    assert total == len(want_k)
    for i, (pk, _) in enumerate(parts):
        if len(pk):
            owners = np.asarray(sharded.owner_of(pk, 8))
            assert (owners == i).all()


def test_owner_balance():
    rng = np.random.default_rng(1)
    k = 31
    kmers = codec.canonical_np(rng.integers(0, 1 << 62, size=200000, dtype=np.uint64), k)
    owners = np.asarray(sharded.owner_of(kmers, 8))
    frac = np.bincount(owners, minlength=8) / len(owners)
    assert frac.max() < 0.16 and frac.min() > 0.09  # ~0.125 each


def test_sharded_accumulator_matches_single_device():
    import numpy as np
    from kmcex_tpu.count.device_lsm import DeviceCountAccumulator
    from kmcex_tpu.parallel import sharded

    rng = np.random.default_rng(11)
    k = 19
    n = 8
    rows, L = 16, 72
    mesh = sharded.make_mesh(n)
    acc = sharded.ShardedCountAccumulator(mesh, k, rows // n, L)
    ref = DeviceCountAccumulator(k)
    for _ in range(5):
        codes = rng.integers(0, 4, size=(rows, L)).astype(np.uint8)
        codes[rng.random(codes.shape) < 0.02] = 255
        acc.add_batch(codes)
        ref.add_batch(codes)
    got_k, got_c = acc.finalize(ci=1, cs=1023)
    want_k, want_c = ref.finalize(ci=1, cs=1023)
    np.testing.assert_array_equal(got_k, want_k)
    np.testing.assert_array_equal(got_c, want_c)


def test_sharded_query_matches_host():
    """Data-parallel serving (parallel.serve): replicated model, queries
    sharded over the mesh -> answers identical to the host query path."""
    from kmcex_tpu.model.kmodel import get_model
    from kmcex_tpu.parallel.serve import ShardedKModelServer

    rng = np.random.default_rng(42)
    k = 31
    mask = (np.uint64(1) << np.uint64(2 * k)) - np.uint64(1)
    can = np.unique(codec.canonical_np(
        rng.integers(0, 1 << 62, size=40000, dtype=np.uint64) & mask, k))
    counts = np.clip(rng.zipf(1.5, size=len(can)), 1, 1023).astype(np.uint32)
    km = get_model(1, 1023, 7, 5)
    km.init_from_pairs(can, counts, k)

    mesh = sharded.make_mesh(8)
    srv = ShardedKModelServer(km, mesh, tile=1 << 13)
    q = np.concatenate([
        can[:: max(1, len(can) // 4000)],
        rng.integers(0, 1 << 62, size=3000, dtype=np.uint64) & mask,
        can[:7] ^ np.uint64(0b1100),  # near-miss neighbors
    ])
    got = srv.kmer_to_occ(q)
    want = km.kmer_to_occ_u64(q)
    np.testing.assert_array_equal(got, want)
    # ragged tail exercises pad-to-mesh-quantum
    got_small = srv.kmer_to_occ(q[:13])
    np.testing.assert_array_equal(got_small, want[:13])
