"""xarray pack (ref ``janitor/xarray/functions.py:14,110``), import-gated.

The reference registers two accessor methods on xarray objects:
``clone_using`` (wrap a raw NumPy array in a DataArray styled like an
existing one) and ``convert_datetime_to_number`` (rewrite a timedelta
coordinate axis as floats in a chosen unit).  Neither touches tabular
data — they are n-dimensional labelled-array conveniences — so there is
no Spark plan to build: a 100 TB pipeline would hold per-partition
xarray objects inside ``mapInPandas`` workers and call these helpers
there.  We ship them as plain functions with the reference's exact
semantics (same validation order, same error conditions, same
construction rules) so a reference user's call sites keep working.

xarray is not bundled in this environment: like the rdkit verbs
(``chemistry.py``), each function raises ImportError at call time
unless xarray is installed.  The validation logic is duck-typed (only
``ndim``/``shape``/``dims``/``coords``/``attrs``/``name`` are read), so
the structural tests exercise every branch without the dependency.
"""

from __future__ import annotations

from typing import Any

__all__ = [
    "clone_using",
    "convert_datetime_to_number",
]


def _require_xarray():
    try:
        import xarray as xr

        return xr
    except ImportError as e:  # pragma: no cover - gated dependency
        raise ImportError(
            "this verb requires xarray (not bundled); pip install xarray"
        ) from e


def clone_using(
    da: Any,
    np_arr: Any,
    use_coords: bool = True,
    use_attrs: bool = False,
    new_name: str | None = None,
):
    """Wrap ``np_arr`` in a new ``xr.DataArray`` carrying ``da``'s
    dimension names and, optionally, its coordinates and attrs (ref
    ``janitor/xarray/functions.py:14-105``).

    Reference semantics, pinned by the structural tests:

    - dimension COUNT must always match (ValueError otherwise);
    - with ``use_coords=True`` the full shape must also match (the
      coordinates are reused, so every axis length is fixed); with
      ``use_coords=False`` only the rank matters;
    - ``use_attrs`` copies the attrs MAPPING (shallow — the reference
      documents that the values are not copied);
    - ``new_name=None`` keeps the source array's name.
    """
    if np_arr.ndim != da.ndim:
        raise ValueError(
            "Number of dims in the NumPy array and the DataArray "
            "must match."
        )
    if use_coords and tuple(np_arr.shape) != tuple(da.shape):
        raise ValueError(
            "Input NumPy array and DataArray must have the same "
            "shape if copying over coordinates."
        )

    xr = _require_xarray()
    return xr.DataArray(
        np_arr,
        dims=da.dims,
        coords=da.coords if use_coords else None,
        attrs=da.attrs.copy() if use_attrs else None,
        name=new_name if new_name is not None else da.name,
    )


def convert_datetime_to_number(
    da_or_ds: Any,
    time_units: str,
    dim: str = "time",
):
    """Rewrite the ``dim`` coordinate axis (timedelta64 values) as
    floats counting ``time_units`` (any NumPy timedelta unit code:
    ``'s'``, ``'m'``, ``'h'``, ``'D'``, ...) — ref
    ``janitor/xarray/functions.py:110-157``.

    Works on a DataArray or a Dataset (both expose ``coords`` /
    ``assign_coords``).  The data itself is untouched; only the axis
    labels change, exactly ``coords[dim] / timedelta64(1, unit)``.
    """
    import numpy as np

    _require_xarray()
    times = da_or_ds.coords[dim].data / np.timedelta64(1, time_units)
    return da_or_ds.assign_coords({dim: times})
