"""Structured Streaming front-end: incremental transcript ingestion.

The reference is strictly batch (SURVEY.md §2.3 — delete-then-rewrite
reconciliation); the target keeps reconciliation batch over snapshots
but supports streaming arrival of transcript turns: watermarked
windowed mention/turn statistics and foreachBatch micro-batch handoff
into the same batch operators."""
