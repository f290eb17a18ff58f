"""The integer floor-division rounding identity used by the catalog's
order-insensitive averages (agg_conditional_max_pivot, sim_label_cohesion)
must equal decimal half-away-from-zero rounding for every input — pinned by
property test so the formula can't regress.

Identity (non-negative s, cells in 1e-6 units, target 4 dp):
    round_half_up(s / (100 n)) == (2 s + 100 n) // (200 n)
Signed variant (cells already in 1e-4 units):
    sign(s) * ((2 |s| + n) // (2 n)) == round_half_away(s / n)
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


def _round_half_away(num: int, den: int) -> int:
    q = (Decimal(abs(num)) / Decimal(den)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    return int(q) * (1 if num >= 0 else -1)


@settings(max_examples=500)
@given(s=st.integers(min_value=0, max_value=10**15), n=st.integers(min_value=1, max_value=10**7))
def test_nonneg_identity_micro_to_4dp(s, n):
    assert (2 * s + 100 * n) // (200 * n) == _round_half_away(s, 100 * n)


@settings(max_examples=500)
@given(
    s=st.integers(min_value=-(10**15), max_value=10**15),
    n=st.integers(min_value=1, max_value=10**7),
)
def test_signed_identity_4dp_cells(s, n):
    got = (1 if s >= 0 else -1) * ((2 * abs(s) + n) // (2 * n))
    assert got == _round_half_away(s, n)
