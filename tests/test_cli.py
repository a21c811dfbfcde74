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
