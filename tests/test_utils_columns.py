"""Coverage for the remaining utility surface: CrossedColumn radix encoding
(reference CrossedColumn.py:14-27), pytree marshaling utils
(data_structure.py), and the Timer."""

import numpy as np

from pytorchrec_tpu.feature_column import (
    CategoricalColumnWithIdentity,
    CrossedColumn,
)
from pytorchrec_tpu.utils.data_structure import (
    map_structure,
    to_numpy,
    to_python_scalars,
)
from pytorchrec_tpu.utils.timer import Timer


def test_crossed_column_radix_encoding():
    a = CategoricalColumnWithIdentity(feature_name="a", category_num=3)
    b = CategoricalColumnWithIdentity(feature_name="b", category_num=5)
    c = CategoricalColumnWithIdentity(feature_name="c", category_num=2)
    crossed = CrossedColumn([a, b, c])
    assert crossed.feature_name == "a_X_b_X_c"
    assert crossed.category_num == 3 * 5 * 2
    batch = {"a": np.asarray([0, 2]), "b": np.asarray([1, 4]), "c": np.asarray([1, 0])}
    out = np.asarray(crossed.get_feature_data(batch))
    # coef_a = 10, coef_b = 2, coef_c = 1
    np.testing.assert_array_equal(out, [0 * 10 + 1 * 2 + 1, 2 * 10 + 4 * 2 + 0])
    # bijective over the full cartesian product
    ids = set()
    for va in range(3):
        for vb in range(5):
            for vc in range(2):
                i = int(crossed.get_feature_data(
                    {"a": np.asarray([va]), "b": np.asarray([vb]), "c": np.asarray([vc])}
                )[0])
                ids.add(i)
    assert len(ids) == 30 and max(ids) == 29 and min(ids) == 0


def test_crossed_column_missing_input():
    a = CategoricalColumnWithIdentity(feature_name="a", category_num=3)
    b = CategoricalColumnWithIdentity(feature_name="b", category_num=5)
    crossed = CrossedColumn([a, b])
    assert crossed.get_feature_data({"a": np.asarray([1])}) is None


def test_map_structure_and_marshaling():
    import jax.numpy as jnp

    tree = {"a": [jnp.ones(3), {"b": jnp.zeros(2)}], "c": jnp.asarray(5.0)}
    doubled = map_structure(lambda x: x * 2, tree)
    np.testing.assert_array_equal(np.asarray(doubled["a"][0]), [2, 2, 2])
    host = to_numpy(tree)
    assert isinstance(host["a"][0], np.ndarray)
    scalars = to_python_scalars({"x": jnp.asarray(3.5), "y": jnp.ones(2)})
    assert scalars["x"] == 3.5 and isinstance(scalars["x"], float)


def test_timer_context():
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed >= 0


def test_nan_debugging_toggle():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from pytorchrec_tpu.utils.profiling import (
        disable_nan_debugging,
        enable_nan_debugging,
    )

    enable_nan_debugging()
    try:
        with _pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0)(jnp.asarray(0.0)).block_until_ready()
    finally:
        disable_nan_debugging()
    # back off: nan flows silently again
    out = jax.jit(lambda x: x / 0.0)(jnp.asarray(0.0))
    assert np.isnan(np.asarray(out))


def test_environment_summary():
    from pytorchrec_tpu.utils import environment_summary

    env = environment_summary()
    assert set(env) == {"jax", "backend", "devices", "n_devices", "n_processes"}
    assert int(env["n_devices"]) >= 1
