"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of
``microbiomedata/ontology-loader`` (reference read-only at
``/root/reference``) as a DataFrame/Catalyst-native pipeline:

- term extraction + canonical ``OntologyClass`` node construction
  (reference ``src/ontology_loader/ontology_processor.py:94-150``),
- direct ``is_a``/``part_of`` assertion selection and reflexive
  transitive-closure expansion (``ontology_processor.py:152-211``),
- insert/update/obsolete reconciliation with CDC reports
  (``src/ontology_loader/mongodb_loader.py:19-103,196-250``),
- plus the transcript front-end the target pipeline needs: windowed
  turn ordering, Arrow-batched mention detection, salted broadcast
  entity linking, and union-find canonicalization.

Everything is built on public PySpark APIs only. No code is copied
from the reference; file:line citations in docstrings exist so parity
can be audited.
"""

__version__ = "0.1.0"
