"""DeviceKModel (jitted batched query) must agree exactly with the host
query path — which itself is verified bit-exact against the reference binary
in test_model_parity.py, so transitivity gives device == reference."""

import numpy as np
import pytest

from kmcex_tpu.core import codec
from kmcex_tpu.model.kmodel import get_model
from kmcex_tpu.query.device_model import DeviceKModel


def _build(seed, n, k, ci, cs, nh, nb):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    mask = (np.uint64(1) << np.uint64(2 * k)) - np.uint64(1)
    can = np.unique(codec.canonical_np(raw & mask, k))
    counts = np.clip(rng.zipf(1.5, size=len(can)), ci, cs).astype(np.uint64)
    km = get_model(ci, cs, nh, nb)
    km.init_from_pairs(can, counts.astype(np.uint32), k)
    return km, can, rng


@pytest.mark.parametrize(
    "seed,n,k,ci,cs,nh,nb",
    [
        (11, 100000, 31, 1, 1023, 7, 5),
        (12, 60000, 31, 2, 1023, 7, 5),
        (13, 50000, 21, 1, 255, 7, 4),
    ],
)
def test_device_matches_host(seed, n, k, ci, cs, nh, nb):
    km, can, rng = _build(seed, n, k, ci, cs, nh, nb)
    dm = DeviceKModel(km)
    q = np.concatenate(
        [can[::9][:3000], rng.integers(0, 1 << (2 * k), size=1500, dtype=np.uint64)]
    )
    host = km.kmer_to_occ_u64(q)
    dev = np.asarray(dm.kmer_to_occ(q))
    np.testing.assert_array_equal(dev, host)


def test_device_query_shapes():
    km, can, _ = _build(14, 20000, 31, 1, 1023, 7, 5)
    dm = DeviceKModel(km)
    out = np.asarray(dm.kmer_to_occ(can[:128].reshape(2, 64)))
    assert out.shape == (2, 64)
