"""Big-number helpers (SURVEY F4-F5).

The reference stores uint256 quantities (``value``, ``gasprice``, ``cost``,
``difficulty``) as decimal strings (``app/db/model.go:20,65,68-69``) and
never aggregates them. We keep the canonical string column and provide
decimal casts for analytics: DecimalType(38,0) covers ~2^126; true uint256
needs 78 digits, so values beyond 38 digits cast to NULL — documented
bound, matching SURVEY §7 risk 1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WEI_PER_ETH = 10**18


def as_decimal(col: Column | str, precision: int = 38, scale: int = 0) -> Column:
    """Canonical big-int string → DecimalType(precision, scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def wei_to_eth(col: Column | str) -> Column:
    """Wei string → ether decimal (util.ToDecimal, app/util/util.go:60-79)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(38,0)") / F.lit(WEI_PER_ETH)).cast("decimal(38,18)")


def calc_gas_cost(gas_price: Column | str, gas: Column | str) -> Column:
    """gasprice × gas (util.CalcGasCost, app/util/util.go:96-105)."""
    p = F.col(gas_price) if isinstance(gas_price, str) else gas_price
    g = F.col(gas) if isinstance(gas, str) else gas
    return (p.cast("decimal(38,0)") * g.cast("decimal(38,0)")).cast("decimal(38,0)")
