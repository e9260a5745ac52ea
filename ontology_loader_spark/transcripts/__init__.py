"""Transcript front-end (SURVEY.md §7.0 stages T1-T3): windowed turn
ordering, Arrow-batched mention detection, entity-link scoring, and
union-find canonicalization over Iceberg-shaped transcript tables
(BASELINE.json input_hint schema)."""
