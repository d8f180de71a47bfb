"""Shared PySpark exception classification.

Spark errors should be routed by their STABLE error class / condition
name (``PATH_NOT_FOUND``, ``UNABLE_TO_INFER_SCHEMA``, …) — message
text is version- and vendor-dependent.  One accessor shim lives here
so every caller (store readers in ``operators/mllib_ann.py``, the
Bloom store listing in ``operators/sketches.py``, …) classifies the
same way and a PySpark accessor rename is a one-line fix.
"""

from __future__ import annotations

__all__ = ["analysis_condition"]


def analysis_condition(exc) -> str | None:
    """The error-class/condition name of a PySpark exception
    (``PATH_NOT_FOUND``, …), via whichever accessor this PySpark
    exposes (``getCondition`` is the 4.x name, ``getErrorClass`` the
    deprecated alias), or None when the server attached none."""
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(exc, attr, None)
        if fn is None:
            continue
        try:
            cond = fn()
        except Exception:
            continue
        if cond:
            return cond
    return None
