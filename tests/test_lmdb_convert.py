"""LMDB → packdb converter (data/lmdb_convert.py).

The real ``lmdb`` package is absent from this image, so the converter's
key-pairing / shape-inference / streaming-writer logic is exercised
against an in-test stub that mimics the lmdb API surface the converter
touches (open → begin → cursor/get), seeded with the reference's key
convention (DenoisingDatasets.py:46-62: '<tag>_..._noisy...' keys, gt =
replace('noisy', 'gt'), raw uint8 buffers).  When real lmdb is present
the same test runs against it too.
"""

import sys
import types

import numpy as np
import pytest

from virnet_tpu.data.lmdb_convert import (PackDBWriter, _infer_shape,
                                          lmdb_to_packdb)
from virnet_tpu.data.packdb import read_packdb_arrays, write_packdb


# --------------------------------------------------------------- lmdb stub

class _FakeCursor:
    def __init__(self, d):
        self._d = d

    def __enter__(self):
        return iter(sorted(self._d.items()))

    def __exit__(self, *a):
        return False


class _FakeTxn:
    def __init__(self, d):
        self._d = d

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def cursor(self):
        return _FakeCursor(self._d)

    def get(self, key):
        return self._d.get(key)


class _FakeEnv:
    def __init__(self, d):
        self._d = d

    def begin(self, write=False):
        return _FakeTxn(self._d)

    def close(self):
        pass


def _install_fake_lmdb(monkeypatch, db):
    mod = types.ModuleType("lmdb")
    mod.open = lambda path, **kw: _FakeEnv(db)
    monkeypatch.setitem(sys.modules, "lmdb", mod)


def _make_db(n=5, size=16, tag="sidd"):
    rng = np.random.default_rng(3)
    db, pairs = {}, []
    for i in range(n):
        noisy = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        gt = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        db[f"{tag}_{i:04d}_noisy".encode()] = noisy.tobytes()
        db[f"{tag}_{i:04d}_gt".encode()] = gt.tobytes()
        pairs.append((noisy, gt))
    return db, pairs


# -------------------------------------------------------------------- tests

def test_infer_shape():
    assert _infer_shape(16 * 16 * 3) == (16, 16, 3)
    assert _infer_shape(9 * 9) == (9, 9, 1)
    with pytest.raises(ValueError):
        _infer_shape(7)


def test_streaming_writer_matches_batch_writer(tmp_path):
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    gt = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    write_packdb(tmp_path / "batch.pack", noisy, gt)
    with PackDBWriter(tmp_path / "stream.pack", (8, 8, 3),
                      paired=True) as w:
        for i in range(4):
            w.append(noisy[i], gt[i])
    assert (tmp_path / "batch.pack").read_bytes() == \
        (tmp_path / "stream.pack").read_bytes()


def test_lmdb_roundtrip_with_stub(monkeypatch, tmp_path):
    db, pairs = _make_db()
    # a renoir record that must be filtered out by the datasets arg
    db[b"renoir_0000_noisy"] = pairs[0][0].tobytes()
    db[b"renoir_0000_gt"] = pairs[0][1].tobytes()
    _install_fake_lmdb(monkeypatch, db)

    out = tmp_path / "conv.pack"
    n = lmdb_to_packdb("/nonexistent.lmdb", out, datasets=("sidd",))
    assert n == 5
    noisy, gt = read_packdb_arrays(out)
    assert noisy.shape == (5, 16, 16, 3)
    for i, (wn, wg) in enumerate(pairs):
        np.testing.assert_array_equal(noisy[i], wn)
        np.testing.assert_array_equal(gt[i], wg)


def test_missing_gt_raises(monkeypatch, tmp_path):
    db, _ = _make_db(n=2)
    del db[b"sidd_0001_gt"]
    _install_fake_lmdb(monkeypatch, db)
    with pytest.raises(KeyError, match="sidd_0001"):
        lmdb_to_packdb("/x", tmp_path / "y.pack", datasets=("sidd",))


def test_real_lmdb_roundtrip(tmp_path):
    lmdb = pytest.importorskip("lmdb")
    db, pairs = _make_db(n=3)
    path = tmp_path / "real.lmdb"
    env = lmdb.open(str(path), map_size=1 << 24)
    with env.begin(write=True) as txn:
        for k, v in db.items():
            txn.put(k, v)
    env.close()
    out = tmp_path / "real.pack"
    n = lmdb_to_packdb(path, out, datasets=("sidd",))
    assert n == 3
    noisy, gt = read_packdb_arrays(out)
    for i, (wn, wg) in enumerate(pairs):
        np.testing.assert_array_equal(noisy[i], wn)
        np.testing.assert_array_equal(gt[i], wg)
