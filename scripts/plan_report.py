"""Registry-wide plan-doctor report (CI surface for plans/doctor.py).

Runs ``diagnose`` over every registered query and prints one JSON
line: finding counts by rule/severity plus the offending query names.
Exit code 1 if any FATAL finding or any WARN outside the pinned
allowlist (tests/test_doctor.JUSTIFIED_WARNS) — the same contract the
test suite enforces, runnable standalone:

    python scripts/plan_report.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from udacitycapstonedataengineer_spark.plans.doctor import diagnose  # noqa: E402
from udacitycapstonedataengineer_spark.plans.queries import QUERIES  # noqa: E402
from udacitycapstonedataengineer_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from tests.test_doctor import JUSTIFIED_WARNS
    from tests.test_window_sweep import ALLOWED_BOUNDED_INPUT

    spark = get_spark(
        app_name="plan-report", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")

    fatals: dict[str, list[str]] = {}
    warns: dict[str, list[str]] = {}
    infos = 0
    for name, q in QUERIES.items():
        for f in diagnose(
            q(spark, sf_dir), assume_bounded=name in ALLOWED_BOUNDED_INPUT
        ):
            if f.severity == "fatal":
                fatals.setdefault(name, []).append(f.rule)
            elif f.severity == "warn":
                warns.setdefault(name, []).append(f.rule)
            else:
                infos += 1
    unpinned = sorted(set(warns) - set(JUSTIFIED_WARNS))
    print(
        json.dumps(
            {
                "queries": len(QUERIES),
                "fatal": fatals,
                "warn_pinned": sorted(set(warns) & set(JUSTIFIED_WARNS)),
                "warn_unpinned": unpinned,
                "info": infos,
            }
        )
    )
    spark.stop()
    return 1 if fatals or unpinned else 0


if __name__ == "__main__":
    raise SystemExit(main())
