"""Shared canonicalization/comparison helpers for the oracle-parity
checks — ONE implementation imported by both the driver-gate mirror
(scripts/driver_sweep.py) and the pytest parity suite, so the two
checks cannot drift apart (a dtype class only one of them recognizes
would make a green test lie about the sweep, or vice versa)."""

from __future__ import annotations

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize comparable dtypes, stable-sort
    rows — the driver's value-hash canonical form."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class — the granularity at which the driver's value
    hash splits. A DuckDB HUGEINT materializes in pandas as float64
    while Spark returns int64: values equal, driver hash different
    (round-3 failure mode). Compare BEFORE canon coerces."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def dtype_map(df: pd.DataFrame) -> dict[str, str]:
    return {c: dtype_class(df[c]) for c in df.columns}
