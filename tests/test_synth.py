"""Synthesizer invariants: identical content at any parallelism, and
the synthetic tables flow through the full pipeline."""

from ontology_loader_spark.inputs.synth import (
    synth_edges,
    synth_term_dict,
    synth_transcripts,
)
from ontology_loader_spark.pipeline import run_ontology_load


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_synth_parallelism_invariant(spark):
    a = _rows(synth_transcripts(spark, 50, 40, n_partitions=1))
    b = _rows(synth_transcripts(spark, 50, 40, n_partitions=16))
    assert a == b and len(a) > 50


def test_synth_pipeline_end_to_end(spark):
    td = synth_term_dict(spark, 60)
    ed = synth_edges(spark, 60)
    ext, rec = run_ontology_load(td, ed, "fix")
    n = rec.relation_state.count()
    assert n > 60  # at least reflexive closure per term
    # reflexive triples present for live FIX terms
    refl = rec.relation_state.filter(
        "subject = object and predicate = 'entailed_isa_partof_closure'"
    ).count()
    assert refl > 0
