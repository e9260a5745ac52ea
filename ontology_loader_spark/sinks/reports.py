"""K1 — TSV report sink.

Reference: ``reporter.py:36-60`` — each report written as
``ontology_<type>s.tsv`` with header ``["id"] + headers``; class report
rows are ``[id] + all fields`` so the id appears twice (quirk Q7,
``mongodb_loader.py:81`` + ``reporter.py:58``).

Quirk Q8: the reference names both the class-insert report and the
relation-insert report ``ontology_inserts.tsv`` — the second write
overwrites the first (``mongodb_loader.py:248-249``). We default to
distinct filenames and keep ``mimic_overwrite=True`` for byte-parity
with the reference's end state.

Scale: reports are usually small (CDC deltas); ``single_file=True``
coalesces to one part and renames it to the reference's filename.
Large deltas keep the partitioned directory form.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame


@dataclass
class Report:
    """Typed row set — mirrors ``reporter.py:13-27``."""

    report_type: str
    df: DataFrame
    headers: list[str]


def _serializable(df: DataFrame) -> DataFrame:
    """CSV cannot carry arrays/structs; complex report columns (the
    class ``alternative_names``/``relations`` fields) are rendered as
    JSON — the reference writes Python ``repr`` of the lists
    (``reporter.py:54-60`` via csv.writer), JSON is the portable
    equivalent."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, (ArrayType, MapType, StructType)):
            cols.append(F.to_json(F.col(field.name)).alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def _write_delimited(
    df: DataFrame, target: Path, single_file: bool, sep: str
) -> None:
    df = _serializable(df)
    if single_file:
        tmp = target.with_suffix(".tmpdir")
        df.coalesce(1).write.mode("overwrite").option("sep", sep).option(
            "header", True
        ).csv(str(tmp))
        part = next(tmp.glob("part-*.csv"))
        if target.exists():
            target.unlink()
        shutil.move(str(part), str(target))
        shutil.rmtree(tmp)
    else:
        df.write.mode("overwrite").option("sep", sep).option("header", True).csv(
            str(target)
        )


def write_reports(
    reports: list[Report],
    output_directory: str | None = None,
    single_file: bool = True,
    mimic_overwrite: bool = False,
    output_format: str = "tsv",
) -> list[Path]:
    """Write each report as ``ontology_<type>s.<output_format>``;
    returns written paths.

    ``output_format`` parity with the reference (``reporter.py:46-60``):
    it names the file extension, and any format other than ``tsv``
    falls back to comma-delimited CSV (the reference's bare
    ``csv.writer``). ``output_directory=None`` creates a temp directory
    (``reporter.py:46-48``).

    Default: distinct names ``ontology_<type>s_<i>.<ext>`` on
    collision. ``mimic_overwrite=True`` reproduces the reference's Q8
    collision (later same-type reports overwrite earlier ones).
    """
    if output_directory is None:
        import tempfile

        output_directory = tempfile.mkdtemp(prefix="ontology_reports_")
    sep = "\t" if output_format == "tsv" else ","
    outdir = Path(output_directory)
    outdir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    seen: dict[str, int] = {}
    for report in reports:
        base = f"ontology_{report.report_type}s"
        n = seen.get(report.report_type, 0)
        seen[report.report_type] = n + 1
        if mimic_overwrite or n == 0:
            name = f"{base}.{output_format}"
        else:
            name = f"{base}_{n}.{output_format}"
        target = outdir / name
        _write_delimited(report.df, target, single_file, sep)
        written.append(target)
    return written
