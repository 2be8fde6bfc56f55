"""Bench artifact contract: the one stdout JSON line must always parse.

These are pure-function tests (no Spark) of bench.py's serialization
layer — the round-4 artifact was lost to a two-line stdout format and a
NaN would silently have produced invalid JSON."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _finite, emit_json  # noqa: E402


def test_finite_sweep_replaces_non_finite():
    rec = {
        "a": float("nan"),
        "b": [1.0, float("inf"), {"c": float("-inf")}],
        "d": {"e": 2.5, "f": (float("nan"),)},
        "ok": "str",
        "n": 7,
    }
    out = _finite(rec)
    assert out == {"a": None, "b": [1.0, None, {"c": None}], "d": {"e": 2.5, "f": [None]}, "ok": "str", "n": 7}


def test_emit_json_single_parseable_line(tmp_path, capsys):
    rec = {"metric": "x", "value": float("nan"), "queries": {"q1": 1.0}}
    line = emit_json(rec)
    captured = capsys.readouterr().out
    assert captured.count("\n") == 1
    assert json.loads(captured) == {"metric": "x", "value": None, "queries": {"q1": 1.0}}
    assert json.loads(line) == json.loads(captured)

    p = tmp_path / "sidecar.json"
    emit_json(rec, path=str(p))
    assert json.loads(p.read_text()) == {"metric": "x", "value": None, "queries": {"q1": 1.0}}
