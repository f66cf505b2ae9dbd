"""Function-surface audit: which pyspark.sql.functions does the suite
exercise, and which remain unexplored?

The round-5 session-3 door batch (q359-q386: EXECUTE IMMEDIATE,
bitmap_*, approx_top_k, theta_*, reflect, listagg, width_bucket, CSV/
URL/AES surfaces, try_to_date, ...) came out of exactly this sweep —
rerun it whenever the PySpark version bumps and mine the "unused" list
for new doors.

Reading the output:
- A name being "unused" is a LEAD, not a defect: some are
  nondeterministic (uuid, randstr), float-accumulating (skewness,
  regr_*), locale-dependent (sentences), env-gated (from_avro,
  from_protobuf), or sibling-redundant (xpath_long vs the certified
  xpath_int). The suite's exactness discipline excludes those on
  purpose — check SURVEY.md before building.
- Matching is textual (\\bname\\s*\\( over all source), so names also
  reachable via F.expr SQL strings count as used.

Usage: python tools/surface_audit.py [--json]
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def audit() -> dict:
    import pyspark
    import pyspark.sql.functions as F

    names = sorted(
        n
        for n in dir(F)
        if not n.startswith("_") and callable(getattr(F, n)) and n == n.lower()
    )
    src = "\n".join(
        p.read_text()
        for pat in ("product_analytics_spark/**/*.py", "tests/**/*.py")
        for p in REPO.glob(pat)
    )
    used = [n for n in names if re.search(rf"\b{re.escape(n)}\s*\(", src)]
    unused = sorted(set(names) - set(used))
    return {
        "pyspark_version": pyspark.__version__,
        "n_functions": len(names),
        "n_used": len(used),
        "coverage_pct": round(100 * len(used) / len(names), 1),
        "unused": unused,
    }


def main() -> int:
    out = audit()
    if "--json" in sys.argv:
        (REPO / "SURFACE_AUDIT.json").write_text(json.dumps(out, indent=1))
        print(f"wrote SURFACE_AUDIT.json ({out['n_used']}/{out['n_functions']}"
              f" = {out['coverage_pct']}% exercised)")
    else:
        print(
            f"pyspark {out['pyspark_version']}: {out['n_used']}/"
            f"{out['n_functions']} ({out['coverage_pct']}%) exercised"
        )
        print("unexplored leads:")
        for n in out["unused"]:
            print(" ", n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
