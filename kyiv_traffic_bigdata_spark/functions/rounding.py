"""Cross-engine-portable 6-decimal rounding for RATIONAL ratios.

`F.round(x, 6)` is a correctness trap in the DuckDB differential gate:
Spark rounds via BigDecimal over the double's SHORTEST DECIMAL STRING
(HALF_UP), DuckDB rounds the SCALED DOUBLE — when the true value lands
exactly on a .5 boundary at the 7th decimal the two disagree by one
final digit (observed live: a quality score of 0.5046875 → Spark
0.504688 vs DuckDB 0.504687 at sf0.1). Ratios of exact integers
(alpha/jaccard/purity/conversion/...) hit such boundaries whenever the
denominator is 2^a·5^b times a small factor, so for every rounded
rational the engine uses

    floor(x * 1e6 + 0.5) / 1e6

— the same IEEE double ops on both engines, hence bit-identical output
for identical input doubles, always. The SQL twin is :data:`SQL_ROUND6`.
For NEGATIVE x the formula is round-half-toward-+inf rather than
HALF_UP (floor(+0.5) rounds -0.1234565 to -0.123456, not -0.123457) —
still bit-identical cross-engine, just a different half-boundary
convention, so signed transcendental columns (pmi, signed cosine) may
use it where cross-engine rank/filter stability matters more than the
half-boundary direction. Plain round(x, 6) remains acceptable for
transcendental OUTPUT columns that never feed a filter or rank: an
irrational landing exactly on a decimal half-boundary has effectively
zero measure.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB-side fragment: format with the expression text, e.g.
#: ``SQL_ROUND6.format(x="CAST(a AS DOUBLE) / b")``.
SQL_ROUND6 = "(floor(({x}) * 1000000.0 + 0.5) / 1000000.0)"


def round6(col: Column) -> Column:
    """Portable 6-decimal rounding of a double column.

    Sign convention (see module docstring): non-negative inputs round
    HALF_UP; negative inputs round half-toward-+inf (floor(x*1e6+0.5)
    maps -0.1234565 to -0.123456). Both are bit-identical cross-engine
    because :data:`SQL_ROUND6` is the same IEEE expression, so signed
    columns (sen_slope, mk_z, gini, bootstrap CI bounds, pmi, signed
    cosine) may use it freely — callers only need to know the negative
    half-boundary direction differs from HALF_UP by one ulp of output.
    """
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
