"""Opt-in long-form runs for the hypothesis model properties
(VERDICT r16 #7b): ``pytest --soak N`` (or ``SPARK_GRAFT_SOAK=N``)
runs every participating property with N examples instead of its
per-test default, so any kernel property can be soaked on demand —
the r16 wal2json 1000-example soak as a repeatable switch — without
inflating the default suite.

``@settings`` decorators evaluate at import time, so the value rides
an env var that conftest's ``pytest_configure`` sets from the option
before collection imports any test module."""

from __future__ import annotations

import os


def soak_examples(default: int) -> int:
    n = int(os.environ.get("SPARK_GRAFT_SOAK", "0") or "0")
    return n if n > 0 else default
