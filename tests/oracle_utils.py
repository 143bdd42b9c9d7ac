"""Order-insensitive Spark-vs-DuckDB result comparison.

Mimics the driver's check: sort columns by name, canonicalize rows,
compare as multisets. Values must match exactly (queries are written to
round floats for cross-engine stability), with a tiny float tolerance
as a safety net for representation differences.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and fix float repr at 12 significant digits
        if v == 0:
            return 0.0
        return float(f"{v:.12g}")
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).tz_localize(None) if getattr(v, "tzinfo", None) else pd.Timestamp(v)
    if isinstance(v, date):
        return pd.Timestamp(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        return _canon(v.item())
    return v


def frame_to_multiset(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return cols, sorted(rows, key=repr)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = ""):
    scols, srows = frame_to_multiset(spark_pdf)
    ocols, orows = frame_to_multiset(oracle_pdf)
    assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs {len(orows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
