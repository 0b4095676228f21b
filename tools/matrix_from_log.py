"""Reconstruct regression-matrix rows from a worker's stdout log (fallback
when a sharded worker was stopped before writing its JSON — the log lines
carry the full fingerprint).

Usage: python tools/matrix_from_log.py OUT.json LOG1 [LOG2 ...]
"""
import ast
import json
import re
import sys

OK = re.compile(r"^ok\s+(.+?): (\[.*?\]) steps=(\d+)\s*$")
FAIL = re.compile(r"^FAIL\s+(.+?): (.+)$")


def main():
    out_path, logs = sys.argv[1], sys.argv[2:]
    rows = []
    for p in logs:
        for line in open(p, errors="replace"):
            m = OK.match(line)
            if m:
                rows.append({"cell": m.group(1),
                             "statuses": ast.literal_eval(m.group(2)),
                             "steps": int(m.group(3))})
                continue
            m = FAIL.match(line)
            if m:
                rows.append({"cell": m.group(1),
                             "error": m.group(2).strip()[:200]})
    json.dump({"n_cells": len(rows), "rows": rows}, open(out_path, "w"),
              indent=1)
    print(f"wrote {out_path}: {len(rows)} cells")


if __name__ == "__main__":
    main()
