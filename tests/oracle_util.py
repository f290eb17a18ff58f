"""DuckDB-oracle comparison helper for model tests (same normalization as
tools/check_oracle.py)."""

from __future__ import annotations

import math
from datetime import date, datetime


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return _norm_cell(float(v))
    return str(v)


def assert_matches_duckdb(sdf, con, sql):
    """Assert the Spark DataFrame equals the DuckDB result of `sql`
    (order-insensitive, column names sorted)."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"schema: {sorted(scols)} != {sorted(dcols)}"
    assert len(srows) == len(drows), f"rowcount: {len(srows)} != {len(drows)}"

    def norm(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)

    sn, dn = norm(scols, srows), norm(dcols, drows)
    diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
    assert sn == dn, f"value mismatch; first diffs: {diffs}"
