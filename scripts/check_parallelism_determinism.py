"""Cross-parallelism determinism probe (north-rule two-cluster-size
criterion): run a representative slice of the gate queries at TWO
parallelism levels on the same input and require bit-identical
sorted-row hashes. Catches batch-boundary-dependent UDFs, partition-
dependent sampling, and accumulation-order-dependent doubles — the
failure modes that make a job's OUTPUT depend on cluster size.

Writes BENCH/determinism.md. Usage:
    python scripts/check_parallelism_determinism.py [lo] [hi] [sf_dir]
(defaults: 2, 8, /root/testdata/sf0.01)
"""

from __future__ import annotations

import hashlib
import sys
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# one query per operator family: UDF paths, iterative fixpoints,
# windows, sampling, double arithmetic, unions, top-k
PROBE_QUERIES = [
    "full_load",
    "mention_detection",            # Arrow UDF — batch-boundary risk
    "mention_ancestors",
    "incremental_closure_delete",   # driver-loop fixpoints
    "union_find",
    "shuffle_order",                # rank assignment across partitions
    "stratified_sample",            # hash sampling
    "bm25_topk",                    # double scores + rank ties
    "quality_percentile",
    "dedup_clusters",
    "ann_ivf_topk",                 # trained k-means
    "semantic_dedup",               # k-means cells + md5 candidate cap
    "corpus_prep_containment",
]


def run_level(cpus: int, sf_dir: str, names: list[str]) -> dict[str, str]:
    from ontology_loader_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        f"determinism-{cpus}",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.sql.shuffle.partitions": str(max(cpus * 2, 4)),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, str] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        cols = sorted(df.columns)
        rows = sorted(
            "\x01".join("NULL" if r[c] is None else repr(r[c]) for c in cols)
            for r in df.collect()
        )
        h = hashlib.sha256()
        for line in rows:
            h.update(line.encode())
            h.update(b"\n")
        out[name] = f"{len(rows)}:{h.hexdigest()}"
        print(f"  local[{cpus}] {name}: {out[name][:24]}...", file=sys.stderr)
    spark.stop()
    return out


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    a = run_level(lo, sf_dir, PROBE_QUERIES)
    b = run_level(hi, sf_dir, PROBE_QUERIES)
    mismatches = [q for q in PROBE_QUERIES if a[q] != b[q]]

    lines = [
        "# Cross-parallelism determinism",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} "
        f"by scripts/check_parallelism_determinism.py at {sf_dir}.",
        "",
        f"Every probed query ran at `local[{lo}]` and `local[{hi}]` "
        "(different task counts, shuffle widths, and Arrow batch "
        "boundaries) and must produce a bit-identical sorted-row "
        "sha256 — the output-level half of the north rule's "
        "two-cluster-size criterion (the throughput half lives in "
        "BASELINE.md).",
        "",
        "| query | rows | identical |",
        "|---|---|---|",
    ]
    for q in PROBE_QUERIES:
        rows = a[q].split(":", 1)[0]
        lines.append(f"| {q} | {rows} | {'yes' if a[q] == b[q] else 'NO'} |")
    lines.append("")
    lines.append(
        f"**{len(PROBE_QUERIES) - len(mismatches)}/{len(PROBE_QUERIES)} "
        "identical.**"
        + ("" if not mismatches else f" MISMATCHES: {mismatches}")
    )
    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH", "determinism.md"
    ).write_text("\n".join(lines) + "\n")
    print("\n".join(lines[-3:]))
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
