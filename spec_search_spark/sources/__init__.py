"""Source/sink adapters (SURVEY.md §2.1).

The reference's sources are the Google Drive/Sheets APIs
(`/root/reference/indexer.py:80-90`, `:20-29`) — driver-side listing +
full-sheet scans. Spark-side, sources are `spark.read` connectors;
this package holds the format adapters and the grid-shaped reader.
"""

from spec_search_spark.sources.formats import (  # noqa: F401
    read_table_any,
    write_table_any,
)
