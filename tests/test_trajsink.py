"""Native async trajectory sink: build, roundtrip, backpressure counters."""
import os

import numpy as np
import pytest

from cadm_tpu.utils.trajsink import TrajectorySink, read_trajfile

pytestmark = pytest.mark.skipif(
    not TrajectorySink.available(), reason="no native toolchain"
)


def test_roundtrip(tmp_path):
    path = str(tmp_path / "traj.bin")
    s = TrajectorySink(path)
    arrays = {
        "obs": np.random.randn(16, 17).astype(np.float32),
        "act": np.random.randn(16, 6).astype(np.float32),
        "ep_step": np.arange(16, dtype=np.int32),
    }
    for k, v in arrays.items():
        assert s.append(k, v)
    s.flush()
    assert s.written == 2 * len(arrays)
    assert s.dropped == 0
    s.close()

    out = dict(read_trajfile(path))
    assert set(out) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k])
        assert out[k].dtype == arrays[k].dtype


def test_backpressure_drops_not_blocks(tmp_path):
    path = str(tmp_path / "t2.bin")
    s = TrajectorySink(path, max_queue_mb=1)
    big = np.zeros((600_000,), np.float32)  # 2.4 MB > 1 MB budget
    ok = s.append("big", big)
    assert not ok  # dropped, returned immediately
    assert s.dropped >= 1
    s.close()


def test_meta_array_pairs_drop_atomically(tmp_path):
    """Under queue pressure META+ARRAY drop TOGETHER (ADVICE r1): a reader
    must never pair an ARRAY with a stale earlier META."""
    path = str(tmp_path / "pressure.bin")
    s = TrajectorySink(path, max_queue_mb=1)
    n_ok, n_drop = 0, 0
    # flood with ~700KB arrays tagged with their index so misnamed pairings
    # would be detectable after the fact
    arrays = {}
    for i in range(50):
        a = np.full((180_000,), i, dtype=np.float32)
        arrays[f"a{i}"] = a
        if s.append(f"a{i}", a):
            n_ok += 1
        else:
            n_drop += 1
    s.flush()
    s.close()
    assert n_ok >= 1
    out = dict(read_trajfile(path))
    assert len(out) == n_ok  # every surviving record is a complete pair
    for name, arr in out.items():
        i = int(name[1:])
        assert (arr == i).all(), f"ARRAY paired with wrong META: {name}"


def test_flush_is_durable(tmp_path):
    """Flush() returns only after the last record hit the file (ADVICE r1:
    the in-flight record between pop and fwrite must be awaited)."""
    path = str(tmp_path / "durable.bin")
    s = TrajectorySink(path)
    for rep in range(20):
        a = np.random.randn(100_000).astype(np.float32)
        assert s.append(f"x{rep}", a)
        s.flush()
        # after flush, the file must already parse through record rep
        names = [n for n, _ in read_trajfile(path)]
        assert names == [f"x{k}" for k in range(rep + 1)]
    s.close()
