"""Real-TPU end-to-end oracle check at bench scale.

Runs the full count pipeline on the attached TPU and compares the table
against a pure-numpy oracle that shares NO code with kmcex_tpu (FASTQ
parse, sliding windows, canonical min(fwd, revcomp), np.unique).  This
validates the actual Mosaic kernel stack — block bitonic sort, at-arrival
flush trees, run-LSM merges, log-shift compaction, span packing, native
delta unpack — bit-for-bit at 32M-window scale, beyond what the
interpret-mode CI tests can claim (tests never touch the TPU; the axon
tunnel is single-client).

Usage:  python tools/verify_tpu_oracle.py [reads.fastq]
(generates the bench FASTQ when no input is given; last verified exact
 at 3,416,924 distinct 31-mers, round 4)
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np


def main() -> int:
    from kmcex_tpu.count.pipeline import count_encode

    if len(sys.argv) > 1:
        fq = sys.argv[1]
    else:
        import bench

        fq = str(bench.BENCH_DIR / f"reads_{bench.N_READS}.fastq")
        if not pathlib.Path(fq).exists():
            bench.BENCH_DIR.mkdir(exist_ok=True)
            print("generating bench FASTQ ...")
            bench.make_fastq(pathlib.Path(fq))
    k = 31
    km, kmers, counts, stats = count_encode(fq, k=k, ci=1, cs=1023,
                                            num_hash=7, num_bit=5)
    print(f"pipeline: {len(kmers)} distinct over {stats.windows} windows")

    code = np.full(256, 255, np.uint8)
    for i, b in enumerate(b"ACGT"):
        code[b] = i
    seqs = []
    with open(fq, "rb") as f:
        for ln, line in enumerate(f):
            if ln % 4 == 1:
                seqs.append(code[np.frombuffer(line.strip(), np.uint8)])
    t0 = time.time()
    parts_k = []
    for a in range(0, len(seqs), 50000):  # bounded RAM
        mat = np.stack(seqs[a : a + 50000])
        w = np.lib.stride_tricks.sliding_window_view(mat, k, axis=1)
        valid = (w < 4).all(axis=2)
        wv = w.reshape(-1, k)[valid.reshape(-1)].astype(np.uint64)
        fwd = np.zeros(len(wv), np.uint64)
        rc = np.zeros(len(wv), np.uint64)
        for j in range(k):
            fwd = (fwd << np.uint64(2)) | wv[:, j]
            rc = (rc << np.uint64(2)) | (np.uint64(3) - wv[:, k - 1 - j])
        parts_k.append(np.minimum(fwd, rc))
    ok, oc = np.unique(np.concatenate(parts_k), return_counts=True)
    oc = np.minimum(oc, 1023).astype(np.uint32)
    print(f"oracle: {len(ok)} distinct ({time.time() - t0:.1f}s)")
    if not np.array_equal(kmers, ok):
        print("KMER MISMATCH");  return 1
    if not np.array_equal(counts, oc):
        print("COUNT MISMATCH");  return 1
    print("EXACT MATCH: kmers and counts identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
