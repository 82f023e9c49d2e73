"""Relay-liveness gates (utils/device.py).

The axon loopback relay has two observed failure modes (CLAUDE.md round-3
learnings): (1) DEAD — nothing listening on 127.0.0.1:8082, every jax
process spins in a connect-retry loop; (2) HALF-OPEN — the port accepts
TCP but the far side is gone, so a bare socket connect passes while the
first device op hangs forever (MULTICHIP_r03 rc=124). `relay_dead()`
catches (1); `device_probe()` catches (2) by running the first device op
in a watchdog subprocess with a hard timeout.
"""
from __future__ import annotations

import socket
import sys
import threading

import pytest

from sde_sampler_tpu.utils.device import device_probe, relay_dead


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture
def half_open_listener():
    """A listener that accepts connections but never speaks — the
    half-open-relay failure mode."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    conns = []
    stop = threading.Event()

    def _accept_loop():
        srv.settimeout(0.2)
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
                conns.append(conn)  # hold it open, say nothing
            except TimeoutError:
                continue
            except OSError:
                break

    t = threading.Thread(target=_accept_loop, daemon=True)
    t.start()
    yield srv.getsockname()[1]
    stop.set()
    t.join(timeout=2)
    for c in conns:
        c.close()
    srv.close()


def test_relay_dead_false_without_axon(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert relay_dead() is False


def test_relay_dead_true_on_closed_port(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert relay_dead(port=_free_port()) is True


def test_relay_dead_checks_even_without_pool_ips(monkeypatch):
    # Regression (VERDICT r3 weak #2): an unset PALLAS_AXON_POOL_IPS used
    # to silently return False ("alive") — a false negative that let entry
    # points hang on a dead relay.
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert relay_dead(port=_free_port()) is True


def test_relay_dead_skips_remote_attachment(monkeypatch):
    # A non-loopback pool IP means the TPU is attached directly; the local
    # relay port is meaningless and must not be consulted.
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.7")
    assert relay_dead(port=_free_port()) is False


def test_relay_dead_false_negative_on_half_open(monkeypatch,
                                                half_open_listener):
    # Documents WHY device_probe exists: a bare TCP connect cannot tell a
    # half-open listener from a healthy relay.
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert relay_dead(port=half_open_listener) is False


def test_device_probe_times_out_on_hung_backend():
    # A backend that never answers (sleep stands in for the connect-retry
    # loop) must cost timeout_s, not forever.
    hang = [sys.executable, "-c", "import time; time.sleep(60)"]
    assert device_probe(timeout_s=1.0, _probe_cmd=hang) is False


def test_device_probe_ok_on_answering_backend():
    ok = [sys.executable, "-c", "print('NDEV', 1)"]
    assert device_probe(timeout_s=30.0, _probe_cmd=ok) is True


def test_device_probe_rejects_failing_backend():
    bad = [sys.executable, "-c", "raise SystemExit(3)"]
    assert device_probe(timeout_s=30.0, _probe_cmd=bad) is False


def test_device_probe_trivially_true_without_axon(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert device_probe(timeout_s=1.0) is True


def test_dryrun_parent_path_is_hermetic(monkeypatch):
    """The dryrun parent must re-exec into a clean CPU child without ever
    touching jax (a half-open relay hangs any axon-backend device query —
    the MULTICHIP_r03 failure mode)."""
    import subprocess

    import __graft_entry__ as ge

    monkeypatch.delenv("_GRAFT_DRYRUN_CHILD", raising=False)
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site")
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    seen = {}

    def fake_run(cmd, env=None, timeout=None, **kw):
        seen.update(cmd=cmd, env=env, timeout=timeout)

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    ge.dryrun_multichip(4)

    assert seen["env"]["JAX_PLATFORMS"] == "cpu"
    assert "PYTHONPATH" not in seen["env"]
    assert seen["env"]["_GRAFT_DRYRUN_CHILD"] == "1"
    assert "xla_force_host_platform_device_count=4" in seen["env"]["XLA_FLAGS"]
    assert "--dryrun" in seen["cmd"] and "4" in seen["cmd"]
