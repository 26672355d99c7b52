"""spec_search_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``phanngoc/spec-search`` (Google-Sheets cell grid → unpivot → chunk →
embed → vector top-k search with cell provenance; see SURVEY.md) as an
idiomatic Spark engine, plus the relational / window / text-analysis /
dedup / similarity operator packs a large-scale training-data pipeline
needs.

Design stance (SURVEY.md §7): everything is a DataFrame pipeline over
public PySpark APIs; Catalyst does the optimization. Custom code is
limited to the chunker UDF, the embedding pandas_udf, distance
expressions (SQL higher-order functions), and window-based top-k /
as-of compositions.
"""

__version__ = "0.1.0"

from spec_search_spark.session import get_spark, tune  # noqa: F401
from spec_search_spark.catalog import load_table, register_views  # noqa: F401
