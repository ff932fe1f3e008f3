"""Temperature schedules vs. the reference formulas (utils.py:55-76)."""

import numpy as np
import pytest

from gan_image_captioning_tpu.ops.temperature import ADAPT_TYPES, get_fixed_temperature


@pytest.mark.parametrize("adapt", ADAPT_TYPES)
def test_schedule_endpoints(adapt):
    temper, N = 100.0, 50.0
    t0 = get_fixed_temperature(temper, 0.0, N, adapt)
    tN = get_fixed_temperature(temper, N, N, adapt)
    if adapt == "no":
        assert t0 == tN == 1.0
    else:
        assert t0 <= tN
        assert t0 >= 0.99  # every ramp starts near 1


def test_exp_default_matches_formula():
    # default: temper ** (i / N) (utils.py:64); the reference updates this
    # every batch at fractional-epoch granularity (training.py:183).
    assert np.isclose(get_fixed_temperature(100, 25, 50, "exp"), 100 ** 0.5)
    assert np.isclose(get_fixed_temperature(100, 50, 50, "exp"), 100.0)
    assert np.isclose(get_fixed_temperature(100, 0, 50, "exp"), 1.0)


def test_lin_quad_sqrt_log_sigmoid_values():
    temper, N = 100.0, 51.0
    i = 10.0
    assert np.isclose(get_fixed_temperature(temper, i, N, "lin"),
                      1 + i / (N - 1) * (temper - 1))
    assert np.isclose(get_fixed_temperature(temper, i, N, "quad"),
                      (temper - 1) / (N - 1) ** 2 * i ** 2 + 1)
    assert np.isclose(get_fixed_temperature(temper, i, N, "sqrt"),
                      (temper - 1) / np.sqrt(N - 1) * np.sqrt(i) + 1)
    assert np.isclose(get_fixed_temperature(temper, i, N, "log"),
                      1 + (temper - 1) / np.log(N) * np.log(i + 1))
    assert np.isclose(get_fixed_temperature(temper, i, N, "sigmoid"),
                      (temper - 1) / (1 + np.exp((N / 2 - i) * 20 / N)) + 1)


def test_unknown_adapt_raises():
    with pytest.raises(Exception):
        get_fixed_temperature(100, 1, 10, "cosine")
