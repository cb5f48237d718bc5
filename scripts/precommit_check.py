#!/usr/bin/env python
"""Fast pre-commit gate: the package must IMPORT and the registry must
hold its floor, before any commit lands.

Round 9 (decorator mis-bind) and round 10 (duplicate registration)
both broke the repo with import-time-detectable failures committed
without even an `import`. This script is the cheap insurance: no Spark
session, <5 s. Wired up by `.git/hooks/pre-commit` (see
scripts/install_hooks.sh); run it manually any time with
`python scripts/precommit_check.py`.

Checks:
  1. `pantasia_db_sync_spark.plans` imports (this is where every
     @register decorator fires — a duplicate key or bad decorator
     raises here).
  2. Registry floor: len(QUERIES) >= FLOOR and ORACLES ⊆ QUERIES.
  3. Every registered callable's __name__ equals its registry key
     (the convention the registry guard enforces at registration —
     re-asserted here so a future guard regression is still caught).
  4. `__spark_entry__` exposes entry/queries/oracle_sql.
"""
from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOOR = 357


def main() -> int:
    try:
        from pantasia_db_sync_spark.plans import QUERIES, ORACLES
    except Exception as exc:  # noqa: BLE001 - report any import-time failure
        print(f"PRECOMMIT FAIL: plans package does not import: {exc!r}")
        return 1

    if len(QUERIES) < FLOOR:
        print(f"PRECOMMIT FAIL: registry floor {FLOOR} broken: {len(QUERIES)}")
        return 1
    extra = set(ORACLES) - set(QUERIES)
    if extra:
        print(f"PRECOMMIT FAIL: oracles without queries: {sorted(extra)[:5]}")
        return 1
    bad = [
        k
        for k, fn in QUERIES.items()
        if getattr(fn, "__name__", k) not in (k, k + "_q")
    ]
    if bad:
        print(f"PRECOMMIT FAIL: key/def name mismatch: {bad[:5]}")
        return 1

    try:
        import __spark_entry__ as se
    except Exception as exc:  # noqa: BLE001
        print(f"PRECOMMIT FAIL: __spark_entry__ does not import: {exc!r}")
        return 1
    for attr in ("entry", "queries", "oracle_sql"):
        if not callable(getattr(se, attr, None)):
            print(f"PRECOMMIT FAIL: __spark_entry__.{attr} missing")
            return 1

    print(f"precommit ok: {len(QUERIES)} queries, {len(ORACLES)} oracles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
