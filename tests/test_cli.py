"""CLI surface tests (reference flag semantics, main.cpp:64-112)."""

import numpy as np
import pytest

from kmcex_tpu.cli import main, parse_parameters


def test_parse_defaults():
    p = parse_parameters(["kmcex", "in.fastq", "out.res", "/tmp"])
    assert p.k == 31 and p.num_hash == 7 and p.num_bit == 5
    assert p.ci == 1 and p.cs == 1023 and p.t == 4
    assert p.input_file_name == "in.fastq"
    assert p.output_file_name == "out.res"
    assert p.working_directory == "/tmp"


def test_parse_flags():
    p = parse_parameters(
        ["kmcex", "-k21", "-t8", "-ci2", "-cs255", "-nh6", "-nb4", "@a.lst", "o", "/w"]
    )
    assert (p.k, p.t, p.ci, p.cs, p.num_hash, p.num_bit) == (21, 8, 2, 255, 6, 4)
    assert p.input_file_name == "@a.lst"


def test_parse_too_few_args():
    assert parse_parameters(["kmcex", "in.fastq"]) is None
    assert parse_parameters(["kmcex", "-k31", "in", "out"]) is None


def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    fq = tmp_path / "r.fastq"
    with open(fq, "w") as f:
        for i in range(200):
            s = int(rng.integers(0, len(genome) - 100))
            r = genome[s : s + 100]
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    out = tmp_path / "r.res"
    rc = main(["kmcex", "-k21", str(fq), str(out), str(tmp_path)])
    assert rc == 0
    # KMC1 database written and model dir saved
    assert (tmp_path / "r.res.kmc_pre").exists()
    assert (tmp_path / "r.res.kmc_suf").exists()
    model_dir = tmp_path / "r.res"
    for fn in ["header", "km.bin", "rest.bin"]:
        assert (model_dir / fn).exists()

    # model round-trips and answers
    from kmcex_tpu.io import kmc_db
    from kmcex_tpu.model.kmodel import load_model

    km = load_model(model_dir)
    reader = kmc_db.KMCReader(str(out))
    kmers, counts = reader.list_all()
    occ = km.kmer_to_occ_u64(kmers[:100])
    assert (occ > 0).mean() > 0.95  # approximate but mostly present


def test_parse_acc_flag():
    p = parse_parameters(["kmcex", "-accsharded", "in", "o", "/w"])
    assert p.accumulator == "sharded"
    with pytest.raises(ValueError):
        parse_parameters(["kmcex", "-accbogus", "in", "o", "/w"])


def test_cli_sharded_equals_device(tmp_path):
    """CLI -accsharded (hash-routed mesh count -> streaming finalize ->
    streaming encode + streaming KMC1 writer) produces a byte-identical
    model dir and database to the single-chip run (VERDICT r3 item 4:
    the genome-scale driver wired through the CLI)."""
    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    fq = tmp_path / "r.fastq"
    with open(fq, "w") as f:
        for i in range(2500):
            s = int(rng.integers(0, len(genome) - 90))
            r = genome[s : s + 90]
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    wd_d = tmp_path / "wd_device"
    wd_s = tmp_path / "wd_sharded"
    wd_d.mkdir()
    wd_s.mkdir()
    rc = main(["kmcex", "-k21", str(fq), str(tmp_path / "d.res"), str(wd_d)])
    assert rc == 0
    rc = main(["kmcex", "-k21", "-accsharded", str(fq),
               str(tmp_path / "s.res"), str(wd_s)])
    assert rc == 0
    for fn in ["header", "km.bin", "rest.bin"]:
        assert ((wd_s / "s.res" / fn).read_bytes()
                == (wd_d / "d.res" / fn).read_bytes()), fn
    for ext in [".kmc_pre", ".kmc_suf"]:
        assert ((tmp_path / ("s.res" + ext)).read_bytes()
                == (tmp_path / ("d.res" + ext)).read_bytes()), ext


def test_cli_stats_json(tmp_path, monkeypatch):
    import json

    rng = np.random.default_rng(9)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    fq = tmp_path / "r.fastq"
    with open(fq, "w") as f:
        for i in range(300):
            s = int(rng.integers(0, len(genome) - 80))
            f.write(f"@r{i}\n{genome[s:s+80]}\n+\n{'I'*80}\n")
    sj = tmp_path / "stats.json"
    monkeypatch.setenv("KMCEX_STATS_JSON", str(sj))
    rc = main(["kmcex", "-k21", str(fq), str(tmp_path / "o.res"),
               str(tmp_path)])
    assert rc == 0
    st = json.loads(sj.read_text())
    assert st["reads"] == 300 and st["distinct_kmers"] > 0
    assert st["reads_per_s"] > 0 and "phases" in st


def test_cli_list_input_ci2_model(tmp_path):
    """BASELINE config 2 shape: @list input (one member gzipped) with the
    ci=2 counter>1 model path (bf_num=3, probe order {1,0,2}) end-to-end
    through the CLI; model answers equal a direct host build."""
    import gzip

    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), size=4000))

    def reads(n, seed):
        r = np.random.default_rng(seed)
        return [genome[s : s + 90]
                for s in r.integers(0, len(genome) - 90, size=n)]

    f1 = tmp_path / "a.fastq"
    with open(f1, "w") as f:
        for i, s in enumerate(reads(900, 1)):
            f.write(f"@a{i}\n{s}\n+\n{'I'*90}\n")
    f2 = tmp_path / "b.fastq.gz"
    with gzip.open(f2, "wt") as f:
        for i, s in enumerate(reads(900, 2)):
            f.write(f"@b{i}\n{s}\n+\n{'I'*90}\n")
    lst = tmp_path / "in.lst"
    lst.write_text(f"{f1}\n{f2}\n")

    rc = main(["kmcex", "-k21", "-ci2", "-cs255", f"@{lst}",
               str(tmp_path / "o.res"), str(tmp_path)])
    assert rc == 0
    from kmcex_tpu.io import kmc_db
    from kmcex_tpu.model.kmodel import get_model, load_model

    km = load_model(tmp_path / "o.res")
    assert km.ci == 2 and km.bf_num == 3
    r = kmc_db.KMCReader(str(tmp_path / "o.res"))
    kmers, counts = r.list_all()
    assert (counts >= 2).all() and counts.max() <= 255
    ref = get_model(2, 255, 7, 5)
    ref.init_from_pairs(kmers, counts.astype(np.uint32), 21)
    q = np.concatenate([kmers[::7], kmers[:64] ^ np.uint64(0b11)])
    np.testing.assert_array_equal(km.kmer_to_occ_u64(q),
                                  ref.kmer_to_occ_u64(q))
