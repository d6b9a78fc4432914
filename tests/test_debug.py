"""NaN-guard wrapper tests (SURVEY.md §5.2 rebuild)."""

import jax
import jax.numpy as jnp
import pytest

from bayesod_tpu.utils.debug import checked_detect


def test_clean_fn_passes():
    f = checked_detect(lambda x: x * 2 + 1)
    out = f(jnp.ones(4))
    assert float(out[0]) == 3.0


def test_nan_raises():
    def bad(x):
        return jnp.log(x - 2.0)  # log of negative -> NaN

    f = checked_detect(bad)
    with pytest.raises(Exception) as e:
        f(jnp.ones(4))
    assert "nan" in str(e.value).lower()


def test_div_zero_inf_raises():
    def bad(x):
        return 1.0 / (x - 1.0)

    f = checked_detect(bad)
    with pytest.raises(Exception):
        f(jnp.ones(4))
