"""Named relational operators the engine exposes beyond raw DataFrame.

The reference has NO relational operators (SURVEY §2.1 — verified by
reading 100% of its source); everything here is the declared batch
query surface mapped onto Spark built-ins, plus the composite
operators Spark lacks natively (as-of join, sessionize, top-k per
group) built from windows/joins so Catalyst still owns the physical
plan.
"""

from tidb_cdc_spark.operators.joins import asof_join, range_join
from tidb_cdc_spark.operators.windows import sessionize, topk_per_group

__all__ = ["asof_join", "range_join", "sessionize", "topk_per_group"]
