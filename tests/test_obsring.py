import multiprocessing as mp
import os

import numpy as np
import pytest

from vlfm_tpu.runner.obsring import ObservationRing

pytestmark = pytest.mark.skipif(
    not ObservationRing.available(), reason="native obsring unavailable"
)


def _producer(name, worker_id, n):
    ring = ObservationRing.open(name)
    for i in range(n):
        payload = np.full(100, worker_id * 1000 + i, np.int32).tobytes()
        ring.push(payload)
    ring.close()


def test_single_process_roundtrip():
    ring = ObservationRing.create(f"vlfm_test_{os.getpid()}_a", 512, 8)
    assert ring.push(b"hello") == 0
    assert ring.push(b"world") == 1
    got = ring.poll_batch()
    assert [(t, p) for t, p in got] == [(0, b"hello"), (1, b"world")]
    assert ring.poll_batch() == []  # cursor advanced
    ring.push(b"again")
    assert ring.poll_batch()[0][1] == b"again"
    ring.close()


def test_overwrite_drops_oldest():
    ring = ObservationRing.create(f"vlfm_test_{os.getpid()}_b", 64, 4)
    for i in range(10):
        ring.push(bytes([i]))
    got = ring.poll_batch()
    # only the newest n_slots records survive
    assert [p[0] for _, p in got] == [6, 7, 8, 9]
    ring.close()


def test_oversized_payload_rejected():
    ring = ObservationRing.create(f"vlfm_test_{os.getpid()}_c", 16, 4)
    with pytest.raises(ValueError):
        ring.push(b"x" * 17)
    ring.close()


def test_multiprocess_producers():
    name = f"vlfm_test_{os.getpid()}_d"
    ring = ObservationRing.create(name, 512, 256)
    n_workers, per = 4, 20
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_producer, args=(name, w, per)) for w in range(n_workers)
    ]
    for p in procs:
        p.start()
    records = []
    import time

    # generous deadline: spawned children re-import numpy/ctypes and the
    # machine may be under full-suite load
    deadline = time.time() + 120
    while len(records) < n_workers * per and time.time() < deadline:
        records.extend(ring.poll_batch(max_records=256))
        time.sleep(0.01)
    for p in procs:
        p.join(timeout=30)
        assert p.exitcode == 0, f"producer crashed with {p.exitcode}"
    assert len(records) == n_workers * per
    # tickets unique & every payload intact
    tickets = [t for t, _ in records]
    assert len(set(tickets)) == len(tickets)
    seen = set()
    for _, payload in records:
        arr = np.frombuffer(payload, np.int32)
        assert (arr == arr[0]).all()  # no torn writes
        seen.add(int(arr[0]))
    assert seen == {w * 1000 + i for w in range(n_workers) for i in range(per)}
    ring.close()
