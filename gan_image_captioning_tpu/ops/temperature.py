"""Gumbel temperature control policies.

All seven policies of reference ``get_fixed_temperature`` (``utils.py:55-76``)
as a pure host-side function of ``(max_temp, i, N)``.  The result is passed
into the jitted train step as a scalar operand, so changing temperature every
batch (reference ``training.py:183,190-191``) costs no recompilation.
"""

from __future__ import annotations

import numpy as np

ADAPT_TYPES = ("no", "lin", "exp", "log", "sigmoid", "quad", "sqrt")


def get_fixed_temperature(temper: float, i: float, N: float, adapt: str) -> float:
    """Temperature at fractional progress ``i`` of ``N`` total units.

    Formula-for-formula with reference ``utils.py:55-76`` (including the
    quirk that ``no`` returns 1.0, not ``temper``).
    """
    if adapt == "no":
        t = 1.0  # no increase (utils.py:60)
    elif adapt == "lin":
        t = 1 + i / (N - 1) * (temper - 1)  # linear (utils.py:62)
    elif adapt == "exp":
        t = temper ** (i / N)  # exponential (utils.py:64)
    elif adapt == "log":
        t = 1 + (temper - 1) / np.log(N) * np.log(i + 1)  # log (utils.py:66)
    elif adapt == "sigmoid":
        t = (temper - 1) * 1 / (1 + np.exp((N / 2 - i) * 20 / N)) + 1  # utils.py:68
    elif adapt == "quad":
        t = (temper - 1) / (N - 1) ** 2 * i ** 2 + 1  # quadratic (utils.py:70)
    elif adapt == "sqrt":
        t = (temper - 1) / np.sqrt(N - 1) * np.sqrt(i) + 1  # sqrt (utils.py:72)
    else:
        raise Exception("Unknown adapt type!")
    return float(t)
