"""Engine-exact HALF_UP rounding helpers, shared by operators and plans.

Neutral home for the integer-arithmetic rounding family so that the
``operators`` layer never imports from ``plans`` (the query-registry
layer sits ON TOP of operators, not beside it).  ``plans/_common``
re-exports these names for the query modules.

Why integer arithmetic instead of ``ROUND(double, 6)``: Spark rounds
the shortest-decimal *rendering* of a double HALF_UP while DuckDB
rounds the *binary* value, so a quotient that lands on an exact 6dp
half-tie (e.g. 68570553.99/32 = 2142829.8121875) diverges between the
engines.  Computing ``q = (2·num·M + den) div (2·den)`` in DECIMAL /
HUGEINT space makes both engines floor-divide identical integers, so
the rounded result is bit-exact by construction.
"""

from __future__ import annotations


def half_up6_spark(num: str, den: str, num_scale: int = 1) -> str:
    """Spark SQL fragment: HALF_UP 6dp rounding of the NON-NEGATIVE
    exact ratio ``(num/num_scale) / den`` in pure integer arithmetic —
    ``q6 = (num·(2·10^6/num_scale) + den) div (2·den)`` then one IEEE
    division ``q6/10^6``.

    ``num`` must be integer-valued SQL (pre-scale decimals, e.g.
    ``SUM(v)*100`` with ``num_scale=100``); ``num_scale`` must divide
    2·10^6. DECIMAL(38,0) intermediates: no bigint overflow until the
    numerator itself exceeds 10^31."""
    assert 2_000_000 % num_scale == 0, num_scale
    mult = 2_000_000 // num_scale
    return (
        f"CAST(CAST((CAST({num} AS DECIMAL(38,0))*{mult} + ({den}))"
        f" div (2*({den})) AS BIGINT) AS DOUBLE)/1000000.0"
    )


def half_up6_duck(num: str, den: str, num_scale: int = 1) -> str:
    """DuckDB twin of :func:`half_up6_spark` (HUGEINT intermediates,
    ``//`` floor division). Keep the two in sync — the whole point is
    that both engines compute the identical integer ``q6``."""
    assert 2_000_000 % num_scale == 0, num_scale
    mult = 2_000_000 // num_scale
    return (
        f"CAST(CAST((CAST({num} AS HUGEINT)*{mult} + ({den}))"
        f" // (2*({den})) AS BIGINT) AS DOUBLE)/1000000.0"
    )


def half_up_signed_spark(
    num: str, den: str, digits: int = 6, num_scale: int = 1
) -> str:
    """Signed variant of :func:`half_up6_spark`: HALF_UP (away from
    zero) rounding of ``(num/num_scale)/den`` at ``digits`` decimals,
    for POSITIVE ``den`` and either-sign integer-valued ``num`` —
    ``q = sign(num)·((2·|num|·M + den) div (2·den))`` with
    ``M = 10^digits/num_scale``; abs() makes truncating and floor
    division agree, so the DuckDB twin is bit-identical. NULL/zero
    ``den`` propagates NULL (callers guard or accept NULL)."""
    assert 10**digits % num_scale == 0, (digits, num_scale)
    m = 10**digits // num_scale
    return (
        f"CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
        f" * CAST((CAST(ABS({num}) AS DECIMAL(38,0))*{2 * m} + ({den}))"
        f" div (2*({den})) AS BIGINT) AS DOUBLE)/{10**digits}.0"
    )


def half_up_signed_duck(
    num: str, den: str, digits: int = 6, num_scale: int = 1
) -> str:
    """DuckDB twin of :func:`half_up_signed_spark` (HUGEINT, ``//``)."""
    assert 10**digits % num_scale == 0, (digits, num_scale)
    m = 10**digits // num_scale
    return (
        f"CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
        f" * CAST((CAST(ABS({num}) AS HUGEINT)*{2 * m} + ({den}))"
        f" // (2*({den})) AS BIGINT) AS DOUBLE)/{10**digits}.0"
    )
