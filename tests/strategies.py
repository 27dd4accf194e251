"""Shared hypothesis strategies + assert helpers.

Parity with the reference's ``tests/strategies.py`` (small_floats,
assert_close) and ``tests/tensor_strategies.py`` (random tensors/shapes,
``shaped_tensors`` drawing several same-shape tensors) — here the "tensor"
strategy produces jnp arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from hypothesis import strategies as st

# allow_subnormal=False: XLA flushes denormals to zero
small_floats = st.floats(
    min_value=-100, max_value=100, allow_nan=False, width=32,
    allow_subnormal=False,
)

small_ints = st.integers(min_value=1, max_value=5)

shapes = st.lists(st.integers(min_value=1, max_value=6), min_size=1,
                  max_size=4).map(tuple)


def assert_close(a, b, rtol: float = 1e-4, atol: float = 1e-5) -> None:
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=rtol, atol=atol)


@st.composite
def arrays(draw, shape=None, elements=small_floats):
    """One jnp float32 array of the given (or drawn) shape."""
    shp = shape if shape is not None else draw(shapes)
    n = int(np.prod(shp))
    vals = draw(st.lists(elements, min_size=n, max_size=n))
    return jnp.asarray(np.asarray(vals, dtype=np.float32).reshape(shp))


@st.composite
def shaped_arrays(draw, n: int, shape=None, elements=small_floats):
    """n same-shape jnp arrays (reference ``shaped_tensors``)."""
    shp = shape if shape is not None else draw(shapes)
    return [draw(arrays(shape=shp, elements=elements)) for _ in range(n)]
