"""Aux subsystem tests: metrics, profiling, doctor, distributed helpers."""

import numpy as np
import pytest

from haplohyped_tpu.core.metrics import Metrics
from haplohyped_tpu.core.profiling import annotate, trace
from haplohyped_tpu.parallel import distributed
from haplohyped_tpu.pipeline.doctor import run_checks


class TestMetrics:
    def test_counters_and_timers(self):
        m = Metrics()
        m.count("variants", 100)
        m.count("variants", 50)
        with m.timer("parse"):
            pass
        snap = m.snapshot()
        assert snap["counters"]["variants"] == 150
        assert snap["timings"]["parse"] >= 0
        assert m.rate("variants", "parse") >= 0

    def test_thread_safety(self):
        import threading

        m = Metrics()

        def work():
            for _ in range(1000):
                m.count("x")

        threads = [threading.Thread(target=work) for _ in range(8)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert m.counters["x"] == 8000


class TestProfiling:
    def test_noop_trace(self):
        with trace(None):
            pass

    def test_annotate(self):
        import jax.numpy as jnp

        with annotate("test_region"):
            _ = jnp.ones(4) + 1


class TestDoctor:
    def test_checks_pass_here(self):
        checks = run_checks()
        names = [c[0] for c in checks]
        assert "native hostio" in names and "decode kernel" in names
        assert all(ok for _, ok, _ in checks)


class TestDistributed:
    def test_single_host_noop(self):
        assert distributed.initialize() is False  # no coordinator env
        assert distributed.process_info() == (0, 1)
        assert distributed.host_local_tasks([1, 2, 3]) == [1, 2, 3]
        distributed.barrier()  # no-op
        assert distributed.broadcast_from_host0({"a": 1}) == {"a": 1}
