"""F1 — CURIE-prefix ontology membership predicate.

Reference: ``_matches_ontology`` at ``ontology_processor.py:121-124``:
``head, sep, _ = entity_id.partition(":"); return bool(sep) and
head.lower() == self._ontology_lc``. Semantics pinned by the 13
parametrized cases in ``tests/test_ontology_processor.py:8-40``:
case-insensitive prefix match, ids without a colon are rejected.

Compiles to pure Catalyst expressions (``contains`` + ``lower`` +
``split_part``) — whole-stage-codegen'd, no Python UDF (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def matches_ontology(id_col: Column | str, ontology: str) -> Column:
    """Boolean Column: ``id_col`` is a CURIE whose prefix (before the
    first ``:``) equals ``ontology`` case-insensitively.

    ``split_part(id, ':', 1)`` returns the whole string when no colon is
    present — the explicit ``contains`` guard reproduces the reference's
    ``bool(sep)`` rejection of colon-less ids.
    """
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.split_part(col, F.lit(":"), F.lit(1))
    return col.contains(":") & (F.lower(prefix) == ontology.lower())


def matches_ontology_sql(id_expr: str, ontology: str) -> str:
    """The same predicate as an ANSI SQL string (used by the DuckDB
    oracle in ``__spark_entry__.py`` so both engines share one
    definition site)."""
    return (
        f"(contains({id_expr}, ':') AND "
        f"lower(split_part({id_expr}, ':', 1)) = '{ontology.lower()}')"
    )
