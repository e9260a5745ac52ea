"""DuckDB simulation of the generated Iceberg MERGE program.

The sandbox has no Iceberg runtime jar, so ``sinks/merge.py``'s
program can't execute against a real catalog here. DuckDB (1.x) has no
``MERGE INTO`` either — but every MERGE in the generated program
decomposes into the standard pre-snapshot-equivalent triple:

- ``WHEN MATCHED [AND c] THEN UPDATE SET …`` →
  ``UPDATE t SET … FROM (source) s WHERE on [AND c]``
- ``WHEN MATCHED THEN DELETE`` →
  ``DELETE FROM t USING (source) s WHERE on``
- ``WHEN NOT MATCHED THEN INSERT …`` →
  ``INSERT INTO t SELECT … FROM (source) s WHERE NOT EXISTS
  (SELECT 1 FROM t WHERE on)``

The UPDATE-before-INSERT order is MERGE-equivalent because no
generated statement updates its own match key, so the matched set is
identical before and after the UPDATE.

Crucially the translation consumes the generated SQL **text** — not
the DataFrame twin of the algebra — so executing the translated
program in DuckDB and comparing end states against
:func:`ontology_loader_spark.operators.reconcile.reconcile` pins the
semantics of the statements a real Iceberg catalog would run
(reference contract: ``mongodb_loader.py:64,215-219``). Spark↔DuckDB
expression deltas handled: ``<=>`` → ``IS NOT DISTINCT FROM`` and
``array()`` → ``[]``.
"""

from __future__ import annotations

import re


def _dialect(expr: str) -> str:
    """Spark SQL → DuckDB expression dialect for the constructs the
    generated program uses."""
    expr = re.sub(
        r"NOT \((t\.\w+) <=> (s\.\w+)\)", r"(\1 IS DISTINCT FROM \2)", expr
    )
    expr = re.sub(r"\(\s*(t\.\w+) <=> (s\.\w+)\s*\)",
                  r"(\1 IS NOT DISTINCT FROM \2)", expr)
    return expr.replace("array()", "[]")


def translate_merge(sql: str) -> list[str]:
    """One generated ``MERGE INTO`` statement → ordered DuckDB
    statements with identical algebra. Raises on anything outside the
    program's grammar (a translation gap must fail loudly, not skip)."""
    m = re.match(r"MERGE INTO (\S+) t\s+USING ", sql)
    if not m:
        raise ValueError(f"not a MERGE statement: {sql[:60]!r}")
    target = m.group(1)
    on_m = re.search(r"\nON ", sql)
    when_m = re.search(r"\nWHEN ", sql)
    source = sql[m.end():on_m.start()].strip()
    # strip the trailing source alias (bare `view s` or `(…) s`)
    if not source.endswith(" s") and not source.endswith(")s"):
        raise ValueError(f"unrecognized source alias: {source[-20:]!r}")
    source = source[:-1].rstrip()
    on = _dialect(sql[on_m.start() + 4:when_m.start()].strip())

    out: list[str] = []
    clauses = [c for c in re.split(r"(?=WHEN (?:MATCHED|NOT MATCHED))",
                                   sql[when_m.start() + 1:]) if c.strip()]
    # grammar boundary: MERGE evaluates WHEN MATCHED clauses per-row
    # (first match wins), but this translator executes them as
    # SEQUENTIAL statements — mixing UPDATE and DELETE matched clauses
    # would diverge (the DELETE would also consume rows the UPDATE
    # clause claimed). The generated programs never mix them; refuse
    # loudly rather than translate silently-wrong.
    matched_kinds = {
        "DELETE" if re.match(r"WHEN MATCHED THEN DELETE", c.strip()) else "UPDATE"
        for c in clauses
        if c.strip().startswith("WHEN MATCHED")
    }
    if len(matched_kinds) > 1:
        raise ValueError(
            "MERGE mixes WHEN MATCHED UPDATE and DELETE clauses — outside "
            "the sequential-statement translation grammar"
        )
    for clause in clauses:
        clause = clause.strip()
        mu = re.match(
            r"WHEN MATCHED(?: AND \((?P<cond>.+?)\))? THEN UPDATE SET\s+"
            r"(?P<sets>.+)$",
            clause,
            re.S,
        )
        md = re.match(r"WHEN MATCHED THEN DELETE\s*$", clause)
        mi = re.match(
            r"WHEN NOT MATCHED THEN INSERT \((?P<cols>.+?)\)\s*"
            r"VALUES \((?P<vals>.+?)\)\s*$",
            clause,
            re.S,
        )
        if mu:
            sets = _dialect(mu.group("sets"))
            # Postgres/DuckDB UPDATE SET takes bare target column names
            sets = re.sub(r"(^|,\s*)t\.", r"\1", sets)
            where = on
            if mu.group("cond"):
                where += f" AND ({_dialect(mu.group('cond'))})"
            out.append(
                f"UPDATE {target} AS t SET {sets} "
                f"FROM {source} AS s WHERE {where}"
            )
        elif md:
            out.append(
                f"DELETE FROM {target} AS t USING {source} AS s WHERE {on}"
            )
        elif mi:
            out.append(
                f"INSERT INTO {target} ({mi.group('cols')}) "
                f"SELECT {mi.group('vals')} FROM {source} AS s "
                f"WHERE NOT EXISTS (SELECT 1 FROM {target} t WHERE {on})"
            )
        else:
            raise ValueError(f"unrecognized MERGE clause: {clause[:80]!r}")
    return out


def run_program(con, program) -> list[str]:
    """Translate and execute every MERGE statement of a
    :class:`~ontology_loader_spark.sinks.merge.MergeProgram` in its
    Q5 order against a DuckDB connection whose tables/views are
    already in place. Returns the executed DuckDB statements."""
    executed: list[str] = []
    for st in program.statements:
        for duck_sql in translate_merge(st.sql):
            con.execute(duck_sql)
            executed.append(duck_sql)
    return executed
