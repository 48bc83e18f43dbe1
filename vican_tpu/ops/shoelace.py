"""Polygon area (shoelace formula).

The tutorial's noise models use ``shapely.geometry.Polygon(...).area`` over
the 4 detected corners (main.ipynb cells 3/7); shapely is a C/GEOS dependency
we replace with the exact shoelace formula.  Works on host NumPy arrays and
on jnp arrays (so noise models can also be evaluated inside jitted code), with
arbitrary leading batch dimensions.
"""
from __future__ import annotations

__all__ = ["polygon_area"]


def polygon_area(corners):
    """Area of a polygon given (..., N, 2) vertices in order.

    Exact for the 4-corner marker quads the noise models use; matches
    ``shapely.Polygon(zip(x, y)).area``.
    """
    import numpy as np

    xp = np
    if type(corners).__module__.startswith("jax"):
        import jax.numpy as xp  # noqa: F811

    if xp is np:
        c = np.asarray(corners)
        if c.shape == (4, 2):
            # scalar fast path for the per-edge noise-model call pattern:
            # ~20x less overhead than the 8 tiny-array numpy ops below
            # (measured 26 -> ~1.3 us/call; reference parity — its shapely
            # .area call sits in the same per-edge Python loop)
            (x0, y0), (x1, y1), (x2, y2), (x3, y3) = c.tolist()
            return 0.5 * abs(x0 * y1 - x1 * y0 + x1 * y2 - x2 * y1
                             + x2 * y3 - x3 * y2 + x3 * y0 - x0 * y3)

    corners = xp.asarray(corners)
    x = corners[..., 0]
    y = corners[..., 1]
    x2 = xp.roll(x, -1, axis=-1)
    y2 = xp.roll(y, -1, axis=-1)
    return 0.5 * xp.abs(xp.sum(x * y2 - x2 * y, axis=-1))
