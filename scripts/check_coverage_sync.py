"""CI-style drift check: COVERAGE.md's self-reported gate inventory
must match the live registry in ``__spark_entry__.py``.

Checks (exit 1 on any failure):
1. every ``queries()`` key has an ``oracle_sql()`` entry (a new
   rows-only gate must be introduced deliberately, via ALLOW_ROWS_ONLY);
2. every ``oracle_sql()`` key exists in ``queries()`` (no orphans);
3. the "NN gate queries" count in COVERAGE.md equals len(queries());
4. every gate name is mentioned (backticked or plain) in COVERAGE.md.

Run: ``python scripts/check_coverage_sync.py`` (no Spark session —
registry construction is pure dict building).
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry

# gates knowingly without a SQL oracle (driver records rows-only)
ALLOW_ROWS_ONLY: set[str] = set()

COVERAGE = "/root/repo/COVERAGE.md"


def main() -> int:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []

    missing_oracle = set(qs) - set(oracles) - ALLOW_ROWS_ONLY
    if missing_oracle:
        failures.append(f"queries without oracle_sql: {sorted(missing_oracle)}")
    orphan_oracle = set(oracles) - set(qs)
    if orphan_oracle:
        failures.append(f"oracle_sql without queries entry: {sorted(orphan_oracle)}")

    text = open(COVERAGE).read()
    m = re.search(r"(\d+) gate queries", text)
    if not m:
        failures.append("COVERAGE.md: no 'NN gate queries' line found")
    elif int(m.group(1)) != len(qs):
        failures.append(
            f"COVERAGE.md says {m.group(1)} gate queries; registry has {len(qs)}"
        )

    unmentioned = [name for name in qs if name not in text]
    if unmentioned:
        failures.append(f"gates not mentioned in COVERAGE.md: {unmentioned}")

    print(f"registry: {len(qs)} gates, {len(oracles)} oracles")
    if failures:
        for f in failures:
            print(f"DRIFT: {f}")
        return 1
    print("COVERAGE.md in sync")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
