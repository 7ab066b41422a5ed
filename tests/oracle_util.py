"""Local emulation of the driver's Spark-vs-DuckDB comparison.

The driver sorts columns by name, then does row-count + schema +
order-insensitive value-hash. Here we compare cell values directly
(exact for non-floats, near-exact for floats) so test failures are
diagnosable; a float that is only *close* would hash-mismatch in the
driver, so close-but-not-equal is reported as a failure too.
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import numpy as np

            df[c] = df[c].apply(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, duck_rel, name: str = "query") -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s = _normalize(spark_df.toPandas())
    d = _normalize(duck_rel.df())

    if list(s.columns) != list(d.columns):
        return [f"{name}: column mismatch spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        return [f"{name}: row count spark={len(s)} duck={len(d)}"]

    # The driver's value hash is type-sensitive where Python ``==`` is
    # not: an int64 Spark column vs a float64 oracle column (the pandas
    # face of DuckDB HUGEINT — any integer SUM / list_sum) compares
    # equal cell-by-cell here yet hash-mismatches driver-side (the r2-r4
    # sessionize_events / llm_multimodal_features reds).  Flag
    # float-vs-int family splits as failures so driver_sim catches them.
    for c in s.columns:
        if s[c].isna().any() or d[c].isna().any():
            continue  # NULLs force a float/object pandas face anyway
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        if (sk == "f") != (dk == "f"):
            problems.append(
                f"{name}: col {c} dtype family mismatch "
                f"spark={s[c].dtype} duck={d[c].dtype} "
                f"(driver hash is type-sensitive; cast the oracle)"
            )
    if problems:
        return problems

    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    problems.append(
                        f"{name}: col {c} row {i}: spark={a!r} duck={b!r} "
                        f"(diff={abs(a - b) if not (math.isnan(a) or math.isnan(b)) else 'nan'})"
                    )
                    if len(problems) > 5:
                        return problems
            elif a != b and not (pd.isna(a) and pd.isna(b)):
                problems.append(f"{name}: col {c} row {i}: spark={a!r} duck={b!r}")
                if len(problems) > 5:
                    return problems
    return problems
