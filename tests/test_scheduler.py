"""Schedule tests (reference agents/utils.py Scheduler ~L200)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeprl_network_tpu.utils.scheduler import Scheduler, make_schedule


def test_constant():
    s = make_schedule("constant", 5e-4, 1000)
    assert float(s(jnp.asarray(0))) == pytest.approx(5e-4)
    assert float(s(jnp.asarray(999))) == pytest.approx(5e-4)


def test_linear_decay_to_zero():
    s = make_schedule("linear", 1.0, 100)
    assert float(s(jnp.asarray(0))) == pytest.approx(1.0)
    assert float(s(jnp.asarray(50))) == pytest.approx(0.5)
    assert float(s(jnp.asarray(100))) == pytest.approx(0.0)
    assert float(s(jnp.asarray(200))) == pytest.approx(0.0)  # clamped


def test_linear_with_floor():
    s = make_schedule("linear", 1.0, 100, min_value=0.3)
    assert float(s(jnp.asarray(90))) == pytest.approx(0.3)


def test_ratio_horizon():
    # entropy_ratio=0.5: anneals over the first half of training
    s = make_schedule("linear", 0.01, 1000, ratio=0.5)
    assert float(s(jnp.asarray(500))) == pytest.approx(0.0, abs=1e-9)


def test_host_side_wrapper():
    sch = Scheduler("linear", 1.0, 10)
    assert sch.get(5) == pytest.approx(0.5)


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        make_schedule("cosine", 1.0, 10)
