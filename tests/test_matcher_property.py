"""Property test (hypothesis): the Aho-Corasick matcher returns exactly
the set of dictionary surfaces that occur as substrings — for any text
and any dictionary — matching the naive ``surface in text`` oracle.
Pure-function test: no Spark session needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ontology_loader_spark.transcripts.mentions import _build_matcher

alphabet = st.sampled_from("abc :")
texts = st.text(alphabet=alphabet, min_size=0, max_size=60)
surfaces = st.text(alphabet=alphabet, min_size=1, max_size=8)


@settings(max_examples=300, deadline=None)
@given(text=texts, dict_surfaces=st.lists(surfaces, min_size=0, max_size=12,
                                          unique=True))
def test_ac_matches_naive_substring(text, dict_surfaces):
    rows = [(f"T:{i}", s) for i, s in enumerate(dict_surfaces)]
    match = _build_matcher(rows)
    got = set(match(text))
    want = {(tid, s) for tid, s in rows if s in text}
    assert got == want


def test_ac_empty_dictionary():
    match = _build_matcher([])
    assert match("anything") == []


def test_ac_overlapping_patterns():
    rows = [("T:1", "ab"), ("T:2", "abc"), ("T:3", "bc"), ("T:4", "abcd")]
    match = _build_matcher(rows)
    assert set(match("xabcx")) == {("T:1", "ab"), ("T:2", "abc"), ("T:3", "bc")}
