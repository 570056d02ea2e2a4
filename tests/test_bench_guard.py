"""The bench burst guard: detection threshold and the one-retry cap
(an unbounded retry loop on a persistently loaded host would hang the
committed bench run)."""

from __future__ import annotations

import sys


def test_burst_guard_caps_retries(monkeypatch, tmp_path):
    sys.path.insert(0, "/root/repo")
    import bench

    # calibration sees a fast probe; afterwards the host "gets busy"
    probes = iter([0.1, 0.1, 0.1] + [1.0] * 10)
    monkeypatch.setattr(bench, "_cpu_probe", lambda: next(probes))
    monkeypatch.setattr(bench, "_wait_for_idle", lambda *a, **k: None)
    guard = bench._BurstGuard()
    assert guard.base == 0.1
    assert guard.corrupted("q1") is True  # burst -> one retry granted
    assert guard.corrupted("q1") is False  # capped: never loops
    assert guard.corrupted("q2") is True  # independent per section
    assert guard.retries == ["q1", "q2"]


def test_burst_guard_quiet_host(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setattr(bench, "_cpu_probe", lambda: 0.1)
    guard = bench._BurstGuard()
    assert guard.corrupted("q") is False
    assert guard.retries == []
