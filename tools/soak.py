"""Scale soak on the real TPU: >=10x the bench workload, real spill
thresholds, sustained-throughput + tier-transition + peak-RSS record, and
an independent numpy oracle check of the full table (VERDICT r4 item 4 —
the closest NA12878-config proxy this single-chip rig allows).

Usage: python tools/soak.py [n_reads] [out_json]
Writes the JSON artifact (default SOAK_r05.json in the repo root).
"""

import json
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
OUT = pathlib.Path(sys.argv[2]) if len(sys.argv) > 2 else (
    pathlib.Path(__file__).parent.parent / "SOAK_r05.json")
GENOME = 20_000_000
K = 31


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import bench

    fq = bench.BENCH_DIR / f"reads_soak_{N_READS}.fastq"
    bench.BENCH_DIR.mkdir(exist_ok=True)
    if not fq.exists():
        log(f"generating soak FASTQ ({N_READS} reads, {GENOME} base genome)")
        bench.make_fastq(fq, genome_len=GENOME, n_reads=N_READS, seed=2025)

    from kmcex_tpu.count.pipeline import count_encode

    # pass 1 warms this scale's compile shapes; pass 2 is the record
    log("pass 1 (warm) ...")
    t0 = time.time()
    count_encode(str(fq), k=K, ci=1, cs=1023, num_hash=7, num_bit=5,
                 keep_pairs=False)
    t_warm = time.time() - t0
    log(f"pass 1: {t_warm:.1f}s")
    log("pass 2 (timed) ...")
    t0 = time.time()
    km, _, _, stats = count_encode(str(fq), k=K, ci=1, cs=1023, num_hash=7,
                                   num_bit=5, keep_pairs=False)
    wall = time.time() - t0
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    rate = stats.reads / wall / 1e6
    log(f"soak: {stats.reads} reads, {stats.windows} windows, "
        f"{stats.distinct_kmers} distinct in {wall:.1f}s -> {rate:.3f} "
        f"Mreads/s; tiers {stats.tiers}; peak RSS {rss_mb}MB")

    # verification pass (keeps pairs) + independent numpy oracle
    log("verification pass + oracle ...")
    km2, kmers, counts, _ = count_encode(str(fq), k=K, ci=1, cs=1023,
                                         num_hash=7, num_bit=5)
    code = np.full(256, 255, np.uint8)
    for i, b in enumerate(b"ACGT"):
        code[b] = i
    seqs = []
    with open(fq, "rb") as f:
        for ln, line in enumerate(f):
            if ln % 4 == 1:
                seqs.append(code[np.frombuffer(line.strip(), np.uint8)])
    parts = []
    for a in range(0, len(seqs), 50000):
        mat = np.stack(seqs[a : a + 50000])
        w = np.lib.stride_tricks.sliding_window_view(mat, K, axis=1)
        valid = (w < 4).all(axis=2)
        wv = w.reshape(-1, K)[valid.reshape(-1)].astype(np.uint64)
        fwd = np.zeros(len(wv), np.uint64)
        rc = np.zeros(len(wv), np.uint64)
        for j in range(K):
            fwd = (fwd << np.uint64(2)) | wv[:, j]
            rc = (rc << np.uint64(2)) | (np.uint64(3) ^ wv[:, K - 1 - j])
        parts.append(np.minimum(fwd, rc))
    allk = np.concatenate(parts)
    del parts, seqs
    want_k, want_c = np.unique(allk, return_counts=True)
    ok_keys = np.array_equal(kmers, want_k)
    ok_counts = np.array_equal(counts.astype(np.uint64),
                               np.minimum(want_c, 1023).astype(np.uint64))
    log(f"oracle: keys {'OK' if ok_keys else 'MISMATCH'}, counts "
        f"{'OK' if ok_counts else 'MISMATCH'} ({len(want_k)} distinct)")

    # model totals line up with the table
    ok_model = km.total_kmer_count == len(want_k)

    artifact = {
        "workload": {"n_reads": N_READS, "read_len": 150,
                     "genome_len": GENOME, "k": K, "err_rate": 0.002,
                     "seed": 2025},
        "wall_seconds": round(wall, 2),
        "warm_pass_seconds": round(t_warm, 2),
        "mreads_per_s": round(rate, 4),
        "windows": stats.windows,
        "distinct_kmers": stats.distinct_kmers,
        "count_seconds": round(stats.count_seconds, 2),
        "encode_seconds": round(stats.encode_seconds, 2),
        "phases": {k_: round(v, 3) for k_, v in stats.phases.items()},
        "tiers": stats.tiers,
        "peak_rss_mb": rss_mb,
        "oracle": {"keys_exact": bool(ok_keys),
                   "counts_exact": bool(ok_counts),
                   "model_total_matches": bool(ok_model)},
    }
    OUT.write_text(json.dumps(artifact, indent=1) + "\n")
    log(f"wrote {OUT}")
    return 0 if (ok_keys and ok_counts and ok_model) else 1


if __name__ == "__main__":
    sys.exit(main())
