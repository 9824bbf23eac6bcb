"""Native trajectory store: roundtrip, multi-shard merge, fallback parity."""
import numpy as np
import pytest

from ws_mgmap_tpu.data import trajstore as ts

RNG = np.random.RandomState(8)


def make_record(t=7):
    return {
        "obs": {
            "rgb_features": RNG.randn(t, 7, 7, 512).astype(np.float16),
            "waypoint": RNG.randn(t, 2).astype(np.float32),
            "gt_semantic_map": RNG.randint(0, 27, (t, 10, 10)).astype(np.int32),
        },
        "prev_actions": RNG.randn(t, 2).astype(np.float32),
        "oracle_actions": RNG.randn(t, 2).astype(np.float32),
    }


def assert_tree_equal(a, b):
    assert sorted(a) == sorted(b)
    for k in a:
        if isinstance(a[k], dict):
            assert_tree_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_pack_unpack_roundtrip():
    rec = make_record()
    assert_tree_equal(rec, ts.unpack_record(ts.pack_record(rec)))


def test_native_lib_builds():
    assert ts._get_lib() is not None, "g++ build of native/trajstore.cpp failed"


def test_store_roundtrip(tmp_path):
    d = str(tmp_path / "traj")
    recs = [make_record(t) for t in (5, 9, 3)]
    w = ts.TrajStoreWriter(d, rank=0)
    w.append_batch([ts.pack_record(r) for r in recs])
    w.flush()
    w.close()

    r = ts.TrajStoreReader(d)
    assert len(r) == 3
    for i, rec in enumerate(recs):
        assert_tree_equal(rec, ts.unpack_record(r.get(i)))
    r.close()


def test_multi_rank_shards_merge(tmp_path):
    d = str(tmp_path / "traj")
    recs0 = [make_record(4), make_record(6)]
    recs1 = [make_record(5)]
    w0 = ts.TrajStoreWriter(d, rank=0)
    w0.append_batch([ts.pack_record(r) for r in recs0])
    w0.close()
    w1 = ts.TrajStoreWriter(d, rank=1)
    w1.append_batch([ts.pack_record(r) for r in recs1])
    w1.close()

    r = ts.TrajStoreReader(d)
    assert len(r) == 3
    got = [ts.unpack_record(r.get(i)) for i in range(3)]
    assert_tree_equal(got[0], recs0[0])
    assert_tree_equal(got[2], recs1[0])
    r.close()


def test_incremental_append_visibility(tmp_path):
    """top-up semantics: the collector checks the count while appending
    (`dagger_trainer.py:350-356`)."""
    d = str(tmp_path / "traj")
    w = ts.TrajStoreWriter(d, rank=0)
    w.append_batch([ts.pack_record(make_record(3))])
    w.flush()
    assert len(ts.TrajStoreReader(d)) == 1
    w.append_batch([ts.pack_record(make_record(4))] * 2)
    w.flush()
    assert len(ts.TrajStoreReader(d)) == 3
    w.close()


def test_python_fallback_format_compatible(tmp_path, monkeypatch):
    """Fallback writer produces files the native reader can open and
    vice versa (same on-disk format)."""
    d = str(tmp_path / "traj")
    rec = make_record(4)

    # write natively
    w = ts.TrajStoreWriter(d, rank=0)
    used_native = w._lib is not None
    w.append_batch([ts.pack_record(rec)])
    w.close()

    # read with forced python fallback
    monkeypatch.setattr(ts, "_lib_handle", None)
    monkeypatch.setattr(ts, "_lib_tried", True)
    r = ts.TrajStoreReader(d)
    assert r._lib is None
    assert_tree_equal(rec, ts.unpack_record(r.get(0)))
    assert used_native  # the main path in this image is the native one
