"""HostWorker (utils/stages.py) semantics: FIFO ordering, exception
propagation, suppression, serial mode, abort. The orchestrator relies on
these to overlap pure-host stages with device dispatch (analyze_ct)."""

import time

import pytest

from boa_tpu.utils.stages import HostWorker


def test_fifo_ordering_and_results():
    order = []
    with HostWorker(serial=False) as w:
        futs = [w.submit(f"s{i}", lambda i=i: (order.append(i), i)[1])
                for i in range(5)]
        assert [f.result() for f in futs] == list(range(5))
    assert order == list(range(5))


def test_barrier_raises_first_failure():
    w = HostWorker(serial=False)
    w.submit("ok", lambda: 1)
    w.submit("boom", lambda: 1 / 0)
    w.submit("later", lambda: (_ for _ in ()).throw(ValueError("later")))
    with pytest.raises(ZeroDivisionError):
        w.barrier()
    w.barrier()  # pending list was drained — second barrier is clean
    w.close()


def test_suppress_logs_instead_of_raising():
    with HostWorker(serial=False) as w:
        fut = w.submit("best-effort", lambda: 1 / 0, suppress=True)
        assert fut.result() is None
        w.barrier()  # must not raise


def test_serial_mode_runs_inline_and_raises_at_call_site():
    w = HostWorker(serial=True)
    ran = []
    fut = w.submit("inline", lambda: ran.append(1) or 42)
    assert ran == [1] and fut.result() == 42
    with pytest.raises(ZeroDivisionError):
        w.submit("inline-boom", lambda: 1 / 0)
    w.close()


def test_env_flag_forces_serial(monkeypatch):
    monkeypatch.setenv("BOA_SERIAL_STAGES", "1")
    assert HostWorker().serial is True
    monkeypatch.delenv("BOA_SERIAL_STAGES")
    assert HostWorker().serial is False


def test_abort_does_not_raise_and_clears_pending():
    w = HostWorker(serial=False)
    w.submit("slow-fail", lambda: (time.sleep(0.05), 1 / 0))
    w.abort()
    w.barrier()  # nothing pending
    # worker is reusable after abort
    assert w.submit("again", lambda: 7).result() == 7
    w.close()


def test_overlap_with_gil_released_wait():
    """A sleeping main thread (stand-in for a tunnel wait) must not block
    the worker stage."""
    with HostWorker(serial=False) as w:
        t0 = time.perf_counter()
        fut = w.submit("work", lambda: sum(range(200000)))
        time.sleep(0.1)
        assert fut.done(), "stage did not overlap the main-thread wait"
        assert time.perf_counter() - t0 < 1.0
