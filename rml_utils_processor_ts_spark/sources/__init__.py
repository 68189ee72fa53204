"""Logical-source readers: every rml:LogicalSource becomes a DataFrame of
*records* with one string column per source reference.

Reference semantics: B1-B5 in SURVEY.md §2 — XML/XPath, JSON/JSONPath,
CSV sources (``/root/reference/src/voc.ts:79-93``), plus our scale-native
formulations: relational parquet/Iceberg tables and the Common-Crawl-style
page table from the BASELINE input_hint.
"""

from .registry import records_df, ref_column_name  # noqa: F401
