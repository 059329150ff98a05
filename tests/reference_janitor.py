"""Load the REFERENCE pyjanitor (read-only checkout at /root/reference)
as a live oracle for differential tests.

The reference is pure pandas, so it can execute in this container; only
three of its import-time dependencies are absent, and each gets a
minimal runtime shim (no reference code is copied — the reference
executes from its own checkout):

* ``pandas_flavor`` — its public surface is method registration;
  the shim attaches methods to ``pd.DataFrame``/``pd.Series``.
* ``multipledispatch`` — the reference dispatches on argument types
  (e.g. ``_fill_empty`` over str vs Iterable); the shim keeps a
  per-function registry and picks the most recently registered
  signature whose ``isinstance`` checks pass (later registrations are
  the more specific ones in every reference use).
* ``natsort`` / ``xarray`` — import-time stubs; verbs that genuinely
  need them are NOT differential-tested (sort_naturally has its own
  contract tests; xarray is out of scope).

``load_reference()`` returns the imported ``janitor`` module or None
when unavailable — tests skip rather than fail in that case.
"""

from __future__ import annotations

import re
import sys
import types

_REFERENCE_PATH = "/root/reference"


def _install_shims() -> None:
    import pandas as pd

    if "pandas_flavor" not in sys.modules:
        pf = types.ModuleType("pandas_flavor")

        def _reg_df(fn):
            setattr(pd.DataFrame, fn.__name__, fn)
            return fn

        def _reg_series(fn):
            setattr(pd.Series, fn.__name__, fn)
            return fn

        def _noop(fn):
            return fn

        pf.register_dataframe_method = _reg_df
        pf.register_series_method = _reg_series
        pf.register_dataframe_accessor = pd.api.extensions.register_dataframe_accessor
        pf.register_xarray_dataarray_method = _noop
        pf.register_xarray_dataset_method = _noop
        sys.modules["pandas_flavor"] = pf

    if "multipledispatch" not in sys.modules:
        md = types.ModuleType("multipledispatch")
        registry: dict = {}

        def dispatch(*sig):
            def deco(fn):
                key = (fn.__module__, fn.__qualname__)
                reg = registry.setdefault(key, [])
                reg.append((sig, fn))

                def wrapper(*args, **kw):
                    # reversed: the later registration is the more
                    # specific one in every reference use (str after
                    # Iterable), and str IS an Iterable
                    for s, f in reversed(reg):
                        if len(args) >= len(s) and all(
                            isinstance(a, t) for a, t in zip(args, s)
                        ):
                            return f(*args, **kw)
                    raise TypeError(f"no dispatch match for {key}")

                return wrapper

            return deco

        md.dispatch = dispatch
        sys.modules["multipledispatch"] = md

    if "xarray" not in sys.modules:
        xr = types.ModuleType("xarray")

        class DataArray:  # annotation targets only
            pass

        class Dataset:
            pass

        xr.DataArray, xr.Dataset = DataArray, Dataset
        sys.modules["xarray"] = xr

    if "natsort" not in sys.modules:
        ns = types.ModuleType("natsort")

        def _natkey(s):
            s = str(s)
            return [
                (0, int(p)) if p.isdigit() else (1, p)
                for p in re.split(r"(\d+)", s)
                if p
            ]

        ns.index_natsorted = lambda seq, **kw: sorted(
            range(len(seq)), key=lambda i: _natkey(seq[i])
        )
        ns.natsorted = lambda seq, **kw: sorted(seq, key=_natkey)
        sys.modules["natsort"] = ns


def load_reference():
    """Import and return the reference ``janitor`` module, or None."""
    try:
        _install_shims()
        if _REFERENCE_PATH not in sys.path:
            sys.path.insert(0, _REFERENCE_PATH)
        import janitor  # noqa: F401

        return janitor
    except Exception:
        return None
