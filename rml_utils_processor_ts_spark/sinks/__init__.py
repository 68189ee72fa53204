"""Sinks: deterministic N-Quads/N-Triples export, partitioned triple-table
materialization (parquet here; Iceberg layout-compatible), lineage rows.
"""

from .nquads import nquad_line_column, triples_to_nquad_lines, write_nquads  # noqa: F401
from .triple_table import write_triple_table  # noqa: F401
