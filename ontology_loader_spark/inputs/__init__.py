"""Input construction: deterministic derivations of the KG input tables
(term dictionary, edge graph, transcripts) from the driver-provided
TPC-H-ish parquet tables, plus standalone seeded synthesis for bench.
"""
