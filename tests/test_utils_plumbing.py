"""Tests for the small runtime-plumbing utilities.

transfer.py / profiling.py / compilation_cache.py are deployment glue
(SURVEY.md §5: profiling + comms); their contracts — idempotence,
thread-safety, no-op on CPU, never failing the caller — are what the
CLIs and the campaign harness lean on.
"""
import threading

import dpr_scale_tpu.utils.transfer as transfer
from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache
from dpr_scale_tpu.utils.profiling import StageTimer, trace_if


def test_warmup_skips_on_cpu_and_is_idempotent(monkeypatch):
    # tests force the CPU platform (conftest), so _is_tunneled_tpu is
    # False: the warmup must return None, mark itself done, and never
    # touch the device
    monkeypatch.setattr(transfer, "_WARMED", False)
    assert transfer.warm_device_to_host() is None
    assert transfer._WARMED is True
    # second call short-circuits before the platform check
    monkeypatch.setattr(transfer, "_is_tunneled_tpu", lambda: 1 / 0)
    assert transfer.warm_device_to_host() is None


def test_warmup_thread_safe_single_execution(monkeypatch):
    monkeypatch.setattr(transfer, "_WARMED", False)
    calls = []

    def fake_check():
        calls.append(1)
        return False

    monkeypatch.setattr(transfer, "_is_tunneled_tpu", fake_check)
    threads = [
        threading.Thread(target=transfer.warm_device_to_host) for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # the lock + _WARMED flag admit exactly one platform probe
    assert len(calls) == 1


def test_warmup_async_returns_joinable_thread(monkeypatch):
    monkeypatch.setattr(transfer, "_WARMED", False)
    t = transfer.warm_device_to_host_async()
    t.join(timeout=30)
    assert not t.is_alive()
    assert transfer._WARMED is True


def test_stage_timer_accumulates():
    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    s = timer.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0.0
    assert "a=" in str(timer) and "b=" in str(timer)


def test_stage_timer_counts_on_exception():
    timer = StageTimer()
    try:
        with timer.stage("x"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert timer.summary()["x"]["count"] == 1


def test_trace_if_noop_without_dir():
    with trace_if(None):
        ran = True
    assert ran
    with trace_if(""):
        ran2 = True
    assert ran2


def test_compilation_cache_never_raises(tmp_path, capsys):
    enable_compilation_cache(str(tmp_path / "cache"))
    assert (tmp_path / "cache").is_dir()
    # unwritable path degrades to a warning, not an exception
    enable_compilation_cache("/proc/definitely/not/writable")
    err = capsys.readouterr().err
    assert "compilation cache disabled" in err
