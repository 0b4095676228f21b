"""Merge sharded regression-matrix outputs into one artifact.

Usage: python tools/matrix_merge.py OUT.json SHARD1.json SHARD2.json ...
"""
import json
import sys


def main():
    out_path, shards = sys.argv[1], sys.argv[2:]
    rows = []
    seen = set()
    for p in shards:
        for r in json.load(open(p))["rows"]:
            if r["cell"] in seen:
                continue  # overlapping workers: first occurrence wins
            seen.add(r["cell"])
            rows.append(r)
    # stable order: by cell key
    rows.sort(key=lambda r: r["cell"])
    json.dump({"n_cells": len(rows), "rows": rows}, open(out_path, "w"),
              indent=1)
    n_err = sum(1 for r in rows if "error" in r)
    print(f"wrote {out_path}: {len(rows)} cells ({n_err} errors)")


if __name__ == "__main__":
    main()
