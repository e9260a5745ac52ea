"""sf1 scaling probe (VERDICT r4 item 6): the bench has only ever run
at sf0.1, which can hide superlinear candidate-pair growth in the
dedup/ANN families — the LSH bucket caps and ``max_cell`` exist
precisely to bound that; this probe proves they bind.

Builds a 10x sf0.1 directory (``/tmp/sf1``) by deterministic
replication — no external data, content a pure function of the source
rows and the copy index:

- ``part`` / ``lineitem`` / ``events``: 10 key-shifted copies. The
  derived ontology becomes one 10x-node binary-tree DAG (depth grows
  ~log2: a genuinely deeper closure, the right stress), the transcript
  corpus 10x convs, the event stream 10x users.
- ``documents``: 10 copies with doc_id shift; copies 1-9 get a
  per-copy md5-keyed TOKEN PERMUTATION (unigram stats preserved,
  shingle sets randomized) so cross-copy pairs behave like unrelated
  same-vocabulary docs instead of pathological near-dups a real 10x
  corpus would not contain.
- ``embeddings``: 10 id-shifted copies with a deterministic 1e-3-scale
  per-coordinate jitter — breaks exact ties, keeps the cell/cluster
  distribution.

Then times the N most expensive gates at sf0.1 and sf1 (same
``local[32]`` session shape as bench.py, min of ``--reps`` runs) and
reports the observed scaling exponent alpha = log(t1/t01) / log(10).
Writes BENCH/sf1_probe.md.

Usage: python scripts/sf1_probe.py [--regen] [--reps N]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
COPIES = 10

PROBE_GATES = [
    "incremental_closure_delete",
    "corpus_prep_containment",
    "corpus_prep",
    "mention_ancestors",
    "dedup_clusters",
    "relation_upsert_end_state",
    "ancestor_closure",
    "semantic_dedup",
    "mention_detection",
    "full_load",
    "cycle_members",      # r5: trim-loop candidate growth at 10x edges
    "ntriples_export",    # r5: map-only rendering must scale ~linearly
    "term_lca",           # r5: closure x pairs joins at 10x terms
    "conv_entity_profile",  # r5: detection + depth join at 10x turns
    "conversation_dedup",   # r5: conv-level LSH bucket growth at 10x
]

# per-table key columns to shift by copy * (1 + max(key))
SHIFT_KEYS = {
    "part": ["p_partkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicate(spark, table: str):
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    strides = {
        k: df.agg(F.max(k)).first()[0] + 1 for k in SHIFT_KEYS[table]
    }
    out = None
    for c in range(COPIES):
        cp = df
        for k, stride in strides.items():
            cp = cp.withColumn(k, (F.col(k) + F.lit(c * stride)).cast("long"))
        if table == "documents" and c > 0:
            # md5-keyed token permutation per copy: same tokens, new
            # order — shingle-level independence across copies
            toks = F.split(F.col("text"), " ")
            keyed = F.transform(
                toks,
                lambda t, i: F.struct(
                    F.md5(
                        F.concat_ws(
                            "|", t, i.cast("string"), F.lit(str(c)),
                            F.col("doc_id").cast("string"),
                        )
                    ).alias("h"),
                    t.alias("t"),
                ),
            )
            cp = cp.withColumn(
                "text",
                F.array_join(
                    F.transform(F.array_sort(keyed), lambda s: s["t"]), " "
                ),
            )
        if table == "embeddings" and c > 0:
            cp = cp.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x
                        + (
                            F.pmod(
                                F.xxhash64(
                                    F.col("vec_id"), i, F.lit(c)
                                ),
                                F.lit(2001),
                            )
                            - F.lit(1000)
                        ).cast("float")
                        / F.lit(1000000.0)
                    ).cast("float"),
                ),
            )
        out = cp if out is None else out.unionByName(cp)
    out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
    n = spark.read.parquet(f"{DST}/{table}.parquet").count()
    print(f"  {table}: {n} rows", file=sys.stderr)


def main() -> None:
    regen = "--regen" in sys.argv
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 1

    from ontology_loader_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        "sf1-probe",
        master="local[32]",
        extra_confs={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if regen or not Path(f"{DST}/documents.parquet").exists():
        print("generating /tmp/sf1 ...", file=sys.stderr)
        for t in SHIFT_KEYS:
            _replicate(spark, t)

    qs = entrymod.queries()
    results = {}
    for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
        for name in PROBE_GATES:
            best, rows = None, 0
            for _ in range(reps):
                t0 = time.time()
                rows = len(qs[name](spark, sf_dir).collect())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[(sf_name, name)] = (best, rows)
            print(f"  {sf_name} {name}: {best:.2f}s {rows} rows",
                  file=sys.stderr)
    spark.stop()

    lines = [
        "# sf1 scaling probe",
        "",
        f"10x replicated corpus at {DST} (see scripts/sf1_probe.py for the",
        "replication rules); each gate timed at sf0.1 and sf1 on the same",
        f"local[32] session, min of {reps} rep(s). alpha = observed scaling",
        "exponent log10(t_sf1 / t_sf0.1) — 1.0 is perfectly linear in the",
        "10x input; fixed per-query overhead pushes alpha DOWN at these",
        "sizes, superlinear candidate growth pushes it UP.",
        "",
        "| gate | t sf0.1 | rows sf0.1 | t sf1 | rows sf1 | row ratio | alpha |",
        "|---|---|---|---|---|---|---|",
    ]
    flagged = []
    for name in PROBE_GATES:
        t0, r0 = results[("sf0.1", name)]
        t1, r1 = results[("sf1", name)]
        ratio = t1 / t0 if t0 > 0 else float("inf")
        alpha = math.log10(ratio) if ratio > 0 else float("nan")
        row_ratio = r1 / r0 if r0 else float("nan")
        lines.append(
            f"| {name} | {t0:.2f}s | {r0} | {t1:.2f}s | {r1} "
            f"| {row_ratio:.1f}x | {alpha:.2f} |"
        )
        if ratio > 10 * max(row_ratio / 10, 1):
            flagged.append((name, ratio, row_ratio))
    lines.append("")
    if flagged:
        lines.append(f"**FLAGGED (time ratio > 10x row-scaled): {flagged}**")
    else:
        lines.append(
            "**No gate exceeds 10x its row-ratio-scaled time — the "
            "bucket caps / max_cell / measured dispatchers bind at 10x "
            "input.**"
        )
    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH", "sf1_probe.md"
    ).write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
