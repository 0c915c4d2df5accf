"""Unit pins for tools/scale_probe.py's pure derivation logic.

derive_cost_shape splits a wall-clock exponent into output-cardinality
and unit-cost terms; these pins keep the classification thresholds and
the artifact field shapes stable (the committed SCALE_PROBE_r* artifacts
are diffed across rounds by the judge, so silent field drift is a
regression even when no query changed).
"""

from __future__ import annotations

import importlib.util
import math
import pathlib

_SPEC = importlib.util.spec_from_file_location(
    "scale_probe",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "scale_probe.py",
)
def _load():
    mod = importlib.util.module_from_spec(_SPEC)
    _SPEC.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


def _entry(mins, rows=None, alpha=None):
    e = {"mins": {str(k): v for k, v in mins.items()}}
    if rows:
        e["rows_out"] = {str(k): v for k, v in rows.items()}
    if alpha is None and len(mins) >= 2:
        ks = sorted(mins)
        f1, f2 = ks[-2], ks[-1]
        alpha = math.log(mins[f2] / mins[f1]) / math.log(f2 / f1)
    e["alpha_last"] = alpha
    return e


def test_output_bound_shape():
    probe = _load()
    # the committed LSH numbers: wall 8.94 -> 105.18 s, rows 0.99M -> 11.27M
    entry = _entry({30: 8.94, 100: 105.184}, {30: 993728, 100: 11266179})
    d = probe.derive_cost_shape(entry)
    assert d["cost_shape"] == "output-bound"
    assert abs(d["alpha_rows"] - 2.017) < 0.01
    assert abs(d["alpha_unit"] - 0.031) < 0.01
    # unit cost is seconds per million OUTPUT rows, flat across the step
    assert abs(d["sec_per_mrow"]["30"] - 9.0) < 0.1
    assert abs(d["sec_per_mrow"]["100"] - 9.34) < 0.1


def test_superlinear_compute_shape():
    probe = _load()
    # wall grows 10x over a 3.33x step while output only doubles:
    # per-row cost grows — the one shape that demands an operator fix
    entry = _entry({30: 10.0, 100: 100.0}, {30: 1000, 100: 2000})
    d = probe.derive_cost_shape(entry)
    assert d["cost_shape"] == "superlinear-compute"
    assert d["alpha_unit"] > 1.0


def test_linear_or_better_shape():
    probe = _load()
    entry = _entry({30: 5.0, 100: 7.0}, {30: 1000, 100: 3333})
    d = probe.derive_cost_shape(entry)
    assert d["cost_shape"] == "linear-or-better"


def test_no_rows_no_unit_split():
    probe = _load()
    # wall alpha alone (no recorded output rows): classification still
    # works off alpha_last but no unit split is fabricated
    entry = _entry({30: 5.0, 100: 6.0})
    d = probe.derive_cost_shape(entry)
    assert "alpha_rows" not in d
    assert d["cost_shape"] == "linear-or-better"


def test_single_factor_yields_nothing():
    probe = _load()
    d = probe.derive_cost_shape(_entry({30: 5.0}, {30: 10}, alpha=None))
    assert d == {}


_TW_SPEC = importlib.util.spec_from_file_location(
    "bench_tripwire",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "bench_tripwire.py",
)


def _load_tripwire():
    mod = importlib.util.module_from_spec(_TW_SPEC)
    _TW_SPEC.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


def test_tripwire_two_term_normalization():
    """The round-12 two-term model: w = max(t - fixed, 0) / rate, with
    shard-level terms when present and a fixed=0 degrade for pre-r12
    runs — the normalization the verdict compares rounds with, pinned so
    it stops being a judgment call."""
    tw = _load_tripwire()
    sharded = {
        "calib_sec": 0.6,
        "calib_fixed_sec": 0.2,
        "shard_of": {"q": 1},
        "shard_calibs": [0.5, 0.8],
        "shard_fixed": [0.1, 0.3],
    }
    assert tw._calib_for(sharded, "q") == (0.8, 0.3)
    assert tw._calib_for(sharded, "unknown") == (0.6, 0.2)
    legacy = {"calib_sec": 0.7}
    assert tw._calib_for(legacy, "q") == (0.7, 0.0)
    # a floor-dominated entry: 0.35s at fixed 0.3 is w=0.1/rate, and the
    # same work on a 2x-slower machine (rate 1.0, fixed 0.6, t=0.7)
    # normalizes to the SAME coefficient — rate-only division would have
    # claimed a 1.4x change
    w_fast = tw._work_coeff(0.35, (0.5, 0.3))
    w_slow = tw._work_coeff(0.7, (1.0, 0.6))
    assert abs(w_fast - w_slow) < 1e-9
    # never negative even when t < fixed (measurement jitter)
    assert tw._work_coeff(0.1, (0.5, 0.3)) == 0.0
