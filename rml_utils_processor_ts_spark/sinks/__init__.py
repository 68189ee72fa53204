"""Sinks: deterministic N-Quads/N-Triples/Turtle export, partitioned
triple-table materialization (parquet here; Iceberg layout-compatible),
lineage rows, per-target routing honoring rmlt:serialization.
"""

from .nquads import (  # noqa: F401
    SERIALIZATION_WRITERS,
    jsonld_subject_lines,
    nquad_line_column,
    ntriple_line_column,
    parse_nquad_lines,
    read_nquads,
    triples_to_nquad_lines,
    trig_graph_lines,
    triples_to_ntriple_lines,
    turtle_subject_lines,
    write_nquads,
    write_ntriples,
    write_jsonld_lines,
    write_serialized,
    write_trig,
    write_turtle,
)
from .router import write_targets  # noqa: F401
from .triple_table import write_bucketed_table, write_triple_table  # noqa: F401
