"""T2 — dictionary mention detection + entity-link scoring.

The reference has no transcript stage; this implements the north rule's
"batched mention detection and entity-link scoring via pandas/Arrow
UDFs (no per-row Python)". Semantics pinned for the oracle: a mention
is a (turn, term) pair where the term's surface form occurs as a plain
substring of the turn text; link score = surface length (longer = more
specific), top-1 per turn with term-id tie-break.

Design for scale:

- The mention dictionary is broadcast once per executor (a Spark
  broadcast variable holding a plain list — ontology dictionaries are
  ≤ millions of rows; the UDF builds its matcher once per Arrow batch
  iterator, NOT once per row).
- Detection runs in ``mapInPandas`` — Arrow-batched, zero
  row-at-a-time Python in the driver plan. Matching is a first-byte
  bucketed scan (a lightweight Aho-Corasick stand-in with no external
  deps): candidate terms are grouped by their first character so each
  text only scans terms whose first char occurs in it. Determinism:
  matching depends only on (text, dictionary) — never on batch
  boundaries or partitioning (SURVEY.md §7.3.5).
- Top-1 selection is a window over (conv_id, turn_idx) — key
  cardinality is the turn count, uniformly hash-distributed, no skew.
- Hot-term aggregations (mention counts) go through two-phase salted
  aggregation: hub terms dominate mention traffic (north rule's
  "salted-key broadcast linking ... to kill hot-entity skew").
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark.sql.types import IntegerType

from ontology_loader_spark.schemas import MENTION_SCHEMA


def _build_matcher(dict_rows: list[tuple[str, str]]):
    """Aho-Corasick multi-pattern substring matcher (pure Python, no
    external deps): one pass over the text regardless of dictionary
    size. Semantics identical to ``surface in text`` per pattern —
    matching depends only on (text, dictionary), never on batch
    boundaries (SURVEY.md §7.3.5). Returns a callable
    text -> list[(term_id, surface)], one entry per matching pattern
    (deduped across occurrences)."""
    from collections import deque

    patterns = [(tid, s) for tid, s in dict_rows if s]
    goto: list[dict[str, int]] = [{}]
    fail: list[int] = [0]
    out: list[list[int]] = [[]]
    for idx, (_, surface) in enumerate(patterns):
        node = 0
        for ch in surface:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                fail.append(0)
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(idx)

    q: deque[int] = deque()
    for nxt in goto[0].values():
        q.append(nxt)
    while q:
        node = q.popleft()
        for ch, nxt in goto[node].items():
            q.append(nxt)
            f = fail[node]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0)
            if out[fail[nxt]]:
                out[nxt] = out[nxt] + out[fail[nxt]]

    root_goto = goto[0]

    def match(text: str) -> list[tuple[str, str]]:
        node = 0
        found: set[int] = set()
        for ch in text:
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0) if node else root_goto.get(ch, 0)
            if out[node]:
                found.update(out[node])
        return [patterns[i] for i in sorted(found)]

    return match


def detect_mentions(
    spark: SparkSession, transcripts: DataFrame, mention_dict: DataFrame
) -> DataFrame:
    """Emit one row per (turn, matching term): (conv_id, turn_idx,
    term_id, surface)."""
    dict_rows = [(r["id"], r["name"]) for r in mention_dict.select("id", "name").collect()]
    bc = spark.sparkContext.broadcast(dict_rows)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        match = _build_matcher(bc.value)
        for pdf in batches:
            conv_ids, turn_idxs, term_ids, surfaces = [], [], [], []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                for term_id, surface in match(text):
                    conv_ids.append(conv_id)
                    turn_idxs.append(turn_idx)
                    term_ids.append(term_id)
                    surfaces.append(surface)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv_ids, dtype="object"),
                    "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                    "term_id": pd.Series(term_ids, dtype="object"),
                    "surface": pd.Series(surfaces, dtype="object"),
                }
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=MENTION_SCHEMA
    )


def detect_mentions_sharded(
    spark: SparkSession,
    transcripts: DataFrame,
    mention_dict: DataFrame,
    n_shards: int = 4,
    n_salt: int = 4,
) -> DataFrame:
    """Mention detection for dictionaries too large for one driver
    collect + broadcast (the ``detect_mentions`` path tops out around
    ~1M surfaces of driver/broadcast memory).

    Fully distributed — the dictionary never touches the driver:

    - every dictionary row goes to shard ``hash(term_id) % n_shards``
      and is replicated across the ``n_salt`` text salts of that shard;
    - every text row is replicated across all ``n_shards`` shards and
      goes to salt ``hash(conv_id, turn_idx) % n_salt``;
    - ``applyInPandas`` over groups keyed ``(shard, salt)`` builds the
      shard's Aho-Corasick automaton executor-side from the dictionary
      rows IN the group and scans the group's texts with it.

    Memory bound per task: ``|dict| / n_shards`` automaton states +
    ``|texts| / n_salt`` rows — both knobs independent, so neither the
    dictionary nor the corpus ever has to fit anywhere whole. Cost:
    texts shuffle ``n_shards``× and dict rows ``n_salt``× (the price of
    not broadcasting). Shards partition the term set, so the per-shard
    outputs union to exactly the unsharded result — no dedup needed;
    matching depends only on (text, shard dictionary), never on group
    or batch boundaries.
    """
    shard_of_term = F.pmod(F.hash("id"), F.lit(n_shards))
    salt_of_text = F.pmod(F.hash("conv_id", "turn_idx"), F.lit(n_salt))

    dict_part = (
        mention_dict.select(
            shard_of_term.alias("shard"),
            F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("salt"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit(None).cast("string").alias("text"),
            F.col("id").alias("d_term_id"),
            F.col("name").alias("d_surface"),
        )
    )
    text_part = (
        transcripts.select(
            F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard"),
            salt_of_text.alias("salt"),
            "conv_id",
            "turn_idx",
            "text",
            F.lit(None).cast("string").alias("d_term_id"),
            F.lit(None).cast("string").alias("d_surface"),
        )
    )
    unioned = dict_part.unionByName(text_part)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        is_dict = pdf["d_term_id"].notna()
        match = _build_matcher(
            list(zip(pdf.loc[is_dict, "d_term_id"], pdf.loc[is_dict, "d_surface"]))
        )
        conv_ids, turn_idxs, term_ids, surfaces = [], [], [], []
        texts = pdf.loc[~is_dict]
        for conv_id, turn_idx, text in zip(
            texts["conv_id"], texts["turn_idx"], texts["text"]
        ):
            for term_id, surface in match(text):
                conv_ids.append(conv_id)
                turn_idxs.append(turn_idx)
                term_ids.append(term_id)
                surfaces.append(surface)
        return pd.DataFrame(
            {
                "conv_id": pd.Series(conv_ids, dtype="object"),
                "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                "term_id": pd.Series(term_ids, dtype="object"),
                "surface": pd.Series(surfaces, dtype="object"),
            }
        )

    return unioned.groupBy("shard", "salt").applyInPandas(run, schema=MENTION_SCHEMA)


@F.pandas_udf(IntegerType())
def link_score(surface: pd.Series) -> pd.Series:
    """Vectorized link score: surface-form length (longer = more
    specific). Kept as a pandas UDF deliberately — this is the slot
    where a real scorer (embedding dot product, character n-gram
    similarity) runs over Arrow batches."""
    return surface.str.len().astype("int32")


def top1_links(mentions: DataFrame) -> DataFrame:
    """Top-1 candidate per turn: score desc, term_id asc tie-break."""
    scored = mentions.withColumn("score", link_score(F.col("surface")))
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("score").desc(), F.col("term_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("conv_id", "turn_idx", "term_id", "surface")
    )


def comention_lift(mentions: DataFrame) -> DataFrame:
    """Edge weighting for the co-mention KG: lift(u, v) =
    P(u,v) / (P(u)·P(v)) over turns = (n_uv · N) / (n_u · n_v) — the
    association strength a linker uses to rank candidate relations
    (PMI without the log, so the arithmetic is two exact-int counts
    and one double multiply/divide chain — bit-identical across
    engines; log rounding is not guaranteed identical).

    Per-term and per-pair counts are distinct-turn counts; the pair
    join keys on (conv_id, turn_idx) — turn-cardinality keys, no
    skew. Output (u, v, n_uv, lift) for u < v."""
    turns = mentions.select("conv_id", "turn_idx", "term_id").distinct()
    n_total = turns.select("conv_id", "turn_idx").distinct().count()
    per_term = turns.groupBy("term_id").agg(F.count("*").alias("n_t"))
    a = turns.select("conv_id", "turn_idx", F.col("term_id").alias("u"))
    b = turns.select("conv_id", "turn_idx", F.col("term_id").alias("v"))
    # big-big self-join on uniform turn keys: neither side broadcasts;
    # shuffle-hash beats sort-merge (no per-partition sorts, build side
    # is the per-turn mention group — tiny per key)
    pair = (
        a.join(b.hint("shuffle_hash"), ["conv_id", "turn_idx"])
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_uv"))
    )
    nu = per_term.select(F.col("term_id").alias("u"), F.col("n_t").alias("n_u"))
    nv = per_term.select(F.col("term_id").alias("v"), F.col("n_t").alias("n_v"))
    return (
        pair.join(F.broadcast(nu), "u")
        .join(F.broadcast(nv), "v")
        .select(
            "u",
            "v",
            "n_uv",
            (
                (F.col("n_uv").cast("double") * F.lit(float(n_total)))
                / (F.col("n_u").cast("double") * F.col("n_v").cast("double"))
            ).alias("lift"),
        )
    )


def mention_counts_salted(mentions: DataFrame, n_salt: int = 16) -> DataFrame:
    """Two-phase salted count per term: hub terms concentrate mention
    traffic, so phase 1 pre-aggregates on (term_id, salt) before the
    final per-term combine (SURVEY.md §4.2.2)."""
    phase1 = (
        mentions.withColumn(
            "salt", F.pmod(F.hash(F.col("conv_id"), F.col("turn_idx")), F.lit(n_salt))
        )
        .groupBy("term_id", "salt")
        .agg(F.count("*").alias("partial"))
    )
    return phase1.groupBy("term_id").agg(F.sum("partial").alias("n_mentions"))


def detect_mentions_with_cols(
    spark: SparkSession,
    transcripts: DataFrame,
    mention_dict: DataFrame,
    extra_cols: tuple[str, ...],
) -> DataFrame:
    """:func:`detect_mentions` with transcript columns carried through
    the Arrow batch: output (conv_id, turn_idx, term_id, surface,
    *extra_cols). Kept as a separate function so the hot detection
    path stays byte-identical for its many gate consumers.

    Why passthrough instead of a join-back: (conv_id, turn_idx) is NOT
    unique in dirty corpora (duplicate turn_idx per conversation —
    SURVEY.md §7.3.5), so re-attaching ts/role by equi-join would
    fan out across the duplicates; carrying the column with the row
    through the batch preserves exact row-level provenance at zero
    shuffle cost."""
    import pyspark.sql.types as T

    dict_rows = [
        (r["id"], r["name"]) for r in mention_dict.select("id", "name").collect()
    ]
    bc = spark.sparkContext.broadcast(dict_rows)
    in_cols = ["conv_id", "turn_idx", "text", *extra_cols]
    src = transcripts.select(*in_cols)
    extra_fields = [src.schema[c] for c in extra_cols]
    out_schema = T.StructType(list(MENTION_SCHEMA.fields) + extra_fields)
    out_names = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        match = _build_matcher(bc.value)
        for pdf in batches:
            idxs, term_ids, surfaces = [], [], []
            for i, text in enumerate(pdf["text"]):
                for term_id, surface in match(text):
                    idxs.append(i)
                    term_ids.append(term_id)
                    surfaces.append(surface)
            if not idxs:
                # yield nothing for a matchless batch: an empty pandas
                # frame with all-NA object columns trips dtype
                # inference in the Arrow serializer (FutureWarning
                # today, wrong dtypes tomorrow)
                continue
            base = pdf.iloc[idxs].reset_index(drop=True)
            out = pd.DataFrame(
                {
                    "conv_id": base["conv_id"].astype("object"),
                    "turn_idx": base["turn_idx"].astype("int32"),
                    "term_id": pd.Series(term_ids, dtype="object"),
                    "surface": pd.Series(surfaces, dtype="object"),
                }
            )
            for c in extra_cols:
                out[c] = base[c]
            yield out[out_names]

    return src.mapInPandas(run, schema=out_schema)


def mention_timeline(
    spark: SparkSession, transcripts: DataFrame, mention_dict: DataFrame
) -> DataFrame:
    """KG activity over time: per (term, day) mention volume —
    (term_id, day, n_mentions, n_convs). The trend/burst-detection
    input ('when did the corpus start talking about <term>?').

    Scale shape: detection is the Arrow slot with ``ts`` carried
    through the batch (no join-back, see
    :func:`detect_mentions_with_cols`); the aggregate is one
    groupBy((term_id, day)) — hub terms are spread across days, and
    count/count-distinct partials combine map-side, so hot-term skew
    is additive only."""
    m = detect_mentions_with_cols(spark, transcripts, mention_dict, ("ts",))
    return (
        m.select(
            "term_id",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "conv_id",
        )
        .groupBy("term_id", "day")
        .agg(
            F.count("*").cast("bigint").alias("n_mentions"),
            F.count_distinct("conv_id").cast("bigint").alias("n_convs"),
        )
    )
