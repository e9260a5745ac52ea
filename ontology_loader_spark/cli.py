"""CLI entry point — mirrors the reference's click command
(``cli.py:13-17`` / ``ontology_load_controller.py:23-50``: three entry
points converging on one plan) for the Spark engine:

    python -m ontology_loader_spark.cli \
        --term-dict <parquet> --edges <parquet> --source-ontology fix \
        --state-root /path/state --output-directory /path/reports

Configuration resolution order mirrors the reference's env-var
singleton (``mongo_db_config.py:18-54``): CLI flag > environment
variable (``OLS_STATE_ROOT``, ``OLS_REPORTS_DIR``) > default.

In production this module is the ``spark-submit --py-files`` driver
program; locally it runs on ``local[*]``.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ontology-loader-spark")
    p.add_argument("--source-ontology", required=True,
                   help="ontology prefix, e.g. 'envo' (case-insensitive)")
    p.add_argument("--term-dict", required=True,
                   help="parquet path: id,name,definition,alternative_names,"
                        "is_obsolete,replaced_by")
    p.add_argument("--edges", required=True,
                   help="parquet path: subject,predicate,object")
    p.add_argument("--state-root",
                   default=os.environ.get("OLS_STATE_ROOT", "./ols_state"))
    p.add_argument("--output-directory",
                   default=os.environ.get("OLS_REPORTS_DIR"))
    p.add_argument("--generate-reports", action="store_true", default=True)
    p.add_argument("--no-reports", dest="generate_reports", action="store_false")
    p.add_argument("--master", default=None)
    p.add_argument("--closure-strategy", choices=["frontier", "doubling"],
                   default="doubling")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from ontology_loader_spark.pipeline import run_ontology_load_checkpointed
    from ontology_loader_spark.session import get_spark

    spark = get_spark("ontology-loader-spark-cli", master=args.master)
    try:
        term_dict = spark.read.parquet(args.term_dict)
        edges = spark.read.parquet(args.edges)
        # input fingerprint = content-derived snapshot id (in production:
        # the Iceberg snapshot id of the input tables)
        fp = hashlib.sha256(
            f"{args.term_dict}|{args.edges}|{args.source_ontology}".encode()
        ).hexdigest()[:16]
        rec, ck = run_ontology_load_checkpointed(
            spark,
            term_dict,
            edges,
            args.source_ontology,
            checkpoint_root=args.state_root,
            fingerprint=fp,
            output_directory=(args.output_directory
                              if args.generate_reports else None),
        )
        n_classes = rec.class_state.count()
        n_relations = rec.relation_state.count()
        n_updates = rec.class_updates_report.count()
        n_inserts = rec.class_inserts_report.count()
        print(
            f"classes={n_classes} relations={n_relations} "
            f"class_inserts={n_inserts} class_updates={n_updates} "
            f"invalid_relations={rec.invalid_relation_count} "
            f"state_root={args.state_root}"
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
