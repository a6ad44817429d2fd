"""Big-number helpers (SURVEY F4-F5).

The reference stores uint256 quantities (``value``, ``gasprice``, ``cost``,
``difficulty``) as decimal strings (``app/db/model.go:20,65,68-69``) and
never aggregates them. We keep the canonical string column and provide
decimal casts for analytics: DecimalType(38,0) covers ~10^38; true
uint256 needs 78 digits, so values beyond 38 digits yield NULL —
``try_cast``/``try_multiply``, because under ANSI mode (Spark 4 default)
a plain cast or multiply THROWS on overflow instead of nulling.
Documented bound, matching SURVEY §7 risk 1.

``wei_to_eth`` deliberately avoids decimal division: Spark's division
result-scale rules round sub-ether dust away (1 wei became 0E-18);
splitting digits as strings is exact for the full decimal(38,0) domain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WEI_PER_ETH = 10**18


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_decimal(col: Column | str, precision: int = 38, scale: int = 0) -> Column:
    """Canonical big-int string → DecimalType; NULL beyond the bound."""
    return _c(col).try_cast(f"decimal({precision},{scale})")


def wei_to_eth(col: Column | str) -> Column:
    """Wei string → ether decimal(38,18), exact down to 1 wei
    (util.ToDecimal, app/util/util.go:60-79).

    Digit-splitting instead of division: left-pad the canonical digits
    to 19, then integer part = all but the last 18 digits, fraction =
    the last 18. Division's result-scale coercion would round dust to
    zero.
    """
    d = as_decimal(col)  # canonicalize + overflow → NULL
    s = d.cast("string")
    padded = F.lpad(s, F.greatest(F.length(s), F.lit(19)).cast("int"), "0")
    n = F.length(padded)
    whole = F.substring(padded, 1, (n - 18).cast("int"))
    frac = F.substring(padded, (n - 17).cast("int"), 18)
    return F.when(
        d.isNull(), F.lit(None).cast("decimal(38,18)")
    ).otherwise(F.concat(whole, F.lit("."), frac).cast("decimal(38,18)"))


def calc_gas_cost(gas_price: Column | str, gas: Column | str) -> Column:
    """gasprice × gas (util.CalcGasCost, app/util/util.go:96-105);
    NULL when a factor or the product exceeds decimal(38,0)."""
    return F.try_multiply(
        as_decimal(gas_price), as_decimal(gas)
    ).try_cast("decimal(38,0)")
