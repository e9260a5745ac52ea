"""Columnar operators reproducing the reference's compute semantics
(SURVEY.md §2.1 operator table) plus the large-scale training-data
operators (dedup, similarity, text analysis) the target pipeline adds.
"""
