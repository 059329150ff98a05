"""Package exception type, mirroring the reference's ``janitor.errors``
(ref ``errors.py:1-2``: ``class JanitorError(Exception)``), which its
timeseries verbs raise for contract violations (``timeseries.py:204-216,
360``).

Subclasses ``ValueError`` here so callers that catch either the
reference's error type by name or the plain ValueError our other verbs
raise both keep working.
"""

from __future__ import annotations

__all__ = ["JanitorError"]


class JanitorError(ValueError):
    pass
