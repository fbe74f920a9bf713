"""Profiling utilities: SOL models and the scaling-efficiency metric."""
import pytest

from qoi_tpu.utils import profiling


def test_scaling_efficiency():
    eff = profiling.scaling_efficiency({1: 100.0, 2: 180.0, 4: 300.0})
    assert eff[1] == pytest.approx(1.0)
    assert eff[2] == pytest.approx(0.9)
    assert eff[4] == pytest.approx(0.75)


def test_scaling_efficiency_needs_base():
    with pytest.raises(KeyError):
        profiling.scaling_efficiency({2: 10.0})
    with pytest.raises(ValueError):
        profiling.scaling_efficiency({1: 0.0, 2: 10.0})


def test_sol_models_positive():
    e = profiling.encode_sol_model(8_294_400, 4)
    d = profiling.decode_sol_model(8_294_400, 4)
    assert e["sol_mpps"] > 0 and d["sol_mpps"] > 0
    assert e["bytes_moved"] > 8_294_400 * 4
