"""xarray pack: structural tests + LIVE differentials vs the reference.

xarray itself is not installed here, but the pack's logic is duck-typed
(only ndim/shape/dims/coords/attrs/name are read) and the final
``xr.DataArray(...)`` construction goes through the module object looked
up at call time — so we patch a RECORDING DataArray into the xarray stub
that ``tests/reference_janitor`` installs, run the reference's own
``janitor.xarray.functions`` and this repo's ``xarray_compat`` on the
same inputs, and assert the constructor receives identical arguments
and the same ValueErrors fire in the same cases.
``convert_datetime_to_number`` needs no construction at all (it only
reads ``coords[dim].data`` and calls ``assign_coords``), so its
differential executes both implementations end-to-end.
"""

from __future__ import annotations

import sys
from types import SimpleNamespace

import numpy as np
import pytest

from pyjanitor_spark.operators.xarray_compat import (
    clone_using,
    convert_datetime_to_number,
)
from tests.reference_janitor import load_reference


def _ref_xr_functions():
    if load_reference() is None:
        pytest.skip("reference janitor unavailable")
    import janitor.xarray.functions as ref_fns

    return ref_fns


class _RecordingDataArray:
    """Stands in for xr.DataArray: just records constructor args."""

    def __init__(self, data, dims=None, coords=None, attrs=None, name=None):
        self.data = data
        self.dims = dims
        self.coords = coords
        self.attrs = attrs
        self.name = name

    def key(self):
        return (
            self.data.tobytes(),
            self.data.shape,
            tuple(self.dims),
            self.coords,
            None if self.attrs is None else dict(self.attrs),
            self.name,
        )


@pytest.fixture()
def recording_xr(monkeypatch):
    """Patch the stub xarray module's DataArray with the recorder (the
    reference module holds the module OBJECT, so attribute patching
    reaches its call sites too)."""
    ref_fns = _ref_xr_functions()
    xr_mod = sys.modules["xarray"]
    monkeypatch.setattr(xr_mod, "DataArray", _RecordingDataArray, raising=False)
    return ref_fns


def _fake_da(shape=(3, 4), name="orig", attrs=None):
    coords = {"ax_1": list(range(shape[0]))}
    return SimpleNamespace(
        ndim=len(shape),
        shape=shape,
        dims=tuple(f"ax_{i + 1}" for i in range(len(shape))),
        coords=coords,
        attrs={} if attrs is None else attrs,
        name=name,
    )


@pytest.mark.parametrize("use_coords", [True, False])
@pytest.mark.parametrize("use_attrs", [True, False])
@pytest.mark.parametrize("new_name", [None, "renamed"])
def test_clone_using_constructor_differential(
    recording_xr, use_coords, use_attrs, new_name
):
    da = _fake_da(attrs={"units": "K", "src": "sensor"})
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    mine = clone_using(
        da, arr, use_coords=use_coords, use_attrs=use_attrs, new_name=new_name
    )
    ref = recording_xr.clone_using(
        da, arr, use_coords=use_coords, use_attrs=use_attrs, new_name=new_name
    )
    assert mine.key() == ref.key()
    # attrs must be a COPY of the mapping, not the same object
    if use_attrs:
        assert mine.attrs == da.attrs and mine.attrs is not da.attrs


def test_clone_using_rank_free_shape_when_no_coords(recording_xr):
    da = _fake_da(shape=(3, 4))
    arr = np.ones((7, 2))  # same rank, different shape: allowed
    mine = clone_using(da, arr, use_coords=False)
    ref = recording_xr.clone_using(da, arr, use_coords=False)
    assert mine.key() == ref.key()
    assert mine.coords is None


@pytest.mark.parametrize("use_coords", [True, False])
def test_clone_using_ndim_mismatch_differential(recording_xr, use_coords):
    da = _fake_da(shape=(3, 4))
    arr = np.ones((3, 4, 2))
    with pytest.raises(ValueError, match="Number of dims") as mine:
        clone_using(da, arr, use_coords=use_coords)
    with pytest.raises(ValueError) as ref:
        recording_xr.clone_using(da, arr, use_coords=use_coords)
    assert str(mine.value) == str(ref.value)


def test_clone_using_shape_mismatch_only_with_coords(recording_xr):
    da = _fake_da(shape=(3, 4))
    arr = np.ones((4, 4))
    with pytest.raises(ValueError, match="same\\s+shape") as mine:
        clone_using(da, arr, use_coords=True)
    with pytest.raises(ValueError) as ref:
        recording_xr.clone_using(da, arr, use_coords=True)
    assert str(mine.value) == str(ref.value)


class _DuckAxis:
    def __init__(self, data):
        self.data = data


class _DuckDataset:
    """Duck-typed DataArray/Dataset: coords mapping + assign_coords."""

    def __init__(self, coords):
        self.coords = {k: _DuckAxis(v) for k, v in coords.items()}

    def assign_coords(self, mapping):
        return _DuckDataset(
            {
                **{k: v.data for k, v in self.coords.items()},
                **mapping,
            }
        )


@pytest.mark.parametrize("unit,expect", [
    ("s", [0.0, 60.0, 120.0]),
    ("m", [0.0, 1.0, 2.0]),
    ("h", [0.0, 1 / 60, 2 / 60]),
])
def test_convert_datetime_to_number_live_differential(unit, expect):
    ref_fns = _ref_xr_functions()
    axis = np.arange(3) * np.timedelta64(1, "m")
    mine = convert_datetime_to_number(_DuckDataset({"time": axis}), unit)
    ref = ref_fns.convert_datetime_to_number(
        _DuckDataset({"time": axis}), unit
    )
    np.testing.assert_allclose(mine.coords["time"].data, expect)
    np.testing.assert_array_equal(
        mine.coords["time"].data, ref.coords["time"].data
    )


def test_convert_datetime_to_number_custom_dim():
    ref_fns = _ref_xr_functions()
    axis = np.array([0, 90], dtype="timedelta64[s]")
    mine = convert_datetime_to_number(_DuckDataset({"t0": axis}), "m", dim="t0")
    ref = ref_fns.convert_datetime_to_number(
        _DuckDataset({"t0": axis}), "m", dim="t0"
    )
    np.testing.assert_allclose(mine.coords["t0"].data, [0.0, 1.5])
    np.testing.assert_array_equal(
        mine.coords["t0"].data, ref.coords["t0"].data
    )


def test_gated_without_xarray(monkeypatch):
    # sys.modules[name] = None makes `import xarray` raise ImportError
    monkeypatch.setitem(sys.modules, "xarray", None)
    da = _fake_da()
    # validation still fires first (duck-typed, dependency-free)
    with pytest.raises(ValueError, match="Number of dims"):
        clone_using(da, np.ones((2, 2, 2)))
    # construction is the gated step
    with pytest.raises(ImportError, match="xarray"):
        clone_using(da, np.ones((3, 4)))
    with pytest.raises(ImportError, match="xarray"):
        convert_datetime_to_number(
            _DuckDataset({"time": np.arange(2) * np.timedelta64(1, "s")}), "s"
        )


def test_exported_from_package():
    import pyjanitor_spark as pjs

    assert pjs.clone_using is clone_using
    assert pjs.convert_datetime_to_number is convert_datetime_to_number
