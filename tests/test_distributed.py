"""Multi-host init plumbing (pql_tpu/parallel/distributed.py) — source
priority and no-op behavior, with jax.distributed.initialize mocked (the
real 2-process path runs in tests/test_multihost.py)."""

from types import SimpleNamespace
from unittest import mock

import pql_tpu.parallel.distributed as dist


def _cfg(**kw):
    defaults = dict(
        coordinator_address=None, num_processes=None, process_id=None, auto_tpu_pod=False
    )
    defaults.update(kw)
    return SimpleNamespace(dist=SimpleNamespace(**defaults))


class TestInitializeSources:
    def test_single_process_is_noop(self, monkeypatch):
        for var in ("PQL_COORDINATOR", "PQL_NUM_PROCESSES", "PQL_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        with mock.patch.object(dist.jax.distributed, "initialize") as init:
            assert dist.initialize(_cfg()) is False
            init.assert_not_called()

    def test_cfg_values_win(self, monkeypatch):
        monkeypatch.setenv("PQL_COORDINATOR", "env:1")
        monkeypatch.setenv("PQL_NUM_PROCESSES", "4")
        monkeypatch.setenv("PQL_PROCESS_ID", "3")
        cfg = _cfg(coordinator_address="cfg:2", num_processes=2, process_id=1)
        with mock.patch.object(dist.jax.distributed, "initialize") as init, mock.patch.object(
            dist.jax, "process_count", return_value=2
        ), mock.patch.object(dist, "_post_init", return_value=True):
            assert dist.initialize(cfg) is True
        init.assert_called_once_with(
            coordinator_address="cfg:2", num_processes=2, process_id=1
        )

    def test_env_vars_fill_in(self, monkeypatch):
        monkeypatch.setenv("PQL_COORDINATOR", "host9:77")
        monkeypatch.setenv("PQL_NUM_PROCESSES", "2")
        monkeypatch.setenv("PQL_PROCESS_ID", "1")
        with mock.patch.object(dist.jax.distributed, "initialize") as init, mock.patch.object(
            dist.jax, "process_count", return_value=2
        ), mock.patch.object(dist, "_post_init", return_value=True):
            assert dist.initialize(None) is True
        init.assert_called_once_with(
            coordinator_address="host9:77", num_processes=2, process_id=1
        )

    def test_auto_tpu_pod_bare_initialize(self, monkeypatch):
        for var in ("PQL_COORDINATOR", "PQL_NUM_PROCESSES", "PQL_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        with mock.patch.object(dist.jax.distributed, "initialize") as init, mock.patch.object(
            dist.jax, "process_count", return_value=4
        ), mock.patch.object(dist, "_post_init", return_value=True):
            assert dist.initialize(_cfg(auto_tpu_pod=True)) is True
        init.assert_called_once_with()

    def test_already_initialized_short_circuits(self):
        with mock.patch.object(
            dist.jax.distributed, "is_initialized", return_value=True
        ), mock.patch.object(dist.jax.distributed, "initialize") as init, mock.patch.object(
            dist.jax, "process_count", return_value=2
        ):
            assert dist.initialize(_cfg(coordinator_address="x:1", num_processes=2)) is True
            init.assert_not_called()
