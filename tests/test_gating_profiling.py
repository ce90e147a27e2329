"""Input gating and profiling utilities."""

import numpy as np

from ccv_mppi_path_tracker_tpu.runtime.gating import InputGate
from ccv_mppi_path_tracker_tpu.utils.profiling import PhaseTimer


def test_input_gate_readiness_and_staleness():
    g = InputGate(stale_policy="hold")
    g.add_channel("path", max_age=1.0)
    g.add_channel("pose", max_age=0.1)
    assert not g.ready()
    g.update("path", "P", stamp=100.0)
    g.update("pose", np.array([1.0, 2.0]), stamp=100.0)
    assert g.ready()
    assert g.stale(now=100.05) == {}
    stale = g.stale(now=100.5)
    assert "pose" in stale and "path" not in stale


def test_input_gate_stale_policies():
    g = InputGate(stale_policy="hold")
    g.add_channel("pose", max_age=0.1)
    g.update("pose", 1.0, stamp=0.0)
    fresh, last = np.array([1.0, 2.0]), np.array([0.5, 0.5])
    np.testing.assert_array_equal(g.resolve_command(fresh, last, now=0.05), fresh)
    np.testing.assert_array_equal(g.resolve_command(fresh, last, now=5.0), last)
    assert g.stale_cycles == 1

    gz = InputGate(stale_policy="zero")
    gz.add_channel("pose", max_age=0.1)
    gz.update("pose", 1.0, stamp=0.0)
    np.testing.assert_array_equal(
        gz.resolve_command(fresh, last, now=5.0), np.zeros(2)
    )


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0
