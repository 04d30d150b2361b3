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
