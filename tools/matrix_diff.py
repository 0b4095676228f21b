"""Compare two regression-matrix artifacts: host-vs-device agreement per
cell and drift vs a previous round.

Usage: python tools/matrix_diff.py MATRIX_r05.json [MATRIX_r04.json]
"""
import json
import sys


def pairs(doc):
    """{scenario|tag: {arm: row}}"""
    out = {}
    for r in doc["rows"]:
        key, arm = r["cell"].rsplit("|", 1)
        out.setdefault(key, {})[arm] = r
    return out


def fingerprint(row):
    if row is None:
        return None
    if "error" in row:
        return ("error", row["error"])
    return (tuple(row["statuses"]), row["steps"])


def main():
    cur = pairs(json.load(open(sys.argv[1])))
    mism = []
    for key, arms in sorted(cur.items()):
        h, d = fingerprint(arms.get("host")), fingerprint(arms.get("device"))
        if h is not None and d is not None and h != d:
            mism.append((key, h, d))
    print(f"{sys.argv[1]}: {len(cur)} cell pairs, "
          f"{len(mism)} host/device mismatches")
    for key, h, d in mism:
        print(f"  MISMATCH {key}: host={h} device={d}")

    if len(sys.argv) > 2:
        prev = pairs(json.load(open(sys.argv[2])))
        drift = []
        for key, arms in sorted(cur.items()):
            for arm in ("host", "device"):
                a, b = fingerprint(arms.get(arm)), fingerprint(
                    prev.get(key, {}).get(arm))
                if a is not None and b is not None and a != b:
                    drift.append((f"{key}|{arm}", b, a))
        print(f"\nvs {sys.argv[2]}: {len(drift)} cells changed outcome")
        for key, b, a in drift:
            print(f"  CHANGED {key}: {b} -> {a}")


if __name__ == "__main__":
    main()
