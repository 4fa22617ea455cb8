#!/usr/bin/env python3
"""Element-wise best merge of Bench sweep JSONs -> a committed artifact.

Usage: merge_bench.py <out.json> <protocol text> <sweep1.json> [sweep2.json ...]

Every sweep must cover the same query set (same-code final-jar sweeps);
queries present only in some sweeps take their best over those.
"""
import json
import sys


def main() -> None:
    out_path, protocol = sys.argv[1], sys.argv[2]
    sweeps = [json.load(open(p)) for p in sys.argv[3:]]
    best: dict[str, float] = {}
    for s in sweeps:
        for q, v in s["queries"].items():
            if q not in best or v < best[q]:
                best[q] = v
    totals = "/".join(f"{s['value']:.1f}" for s in sweeps)
    calibs = [s["calib"] for s in sweeps if "calib" in s]
    merged = {
        "metric": "total",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": {k: best[k] for k in sorted(best)},
        "sf": sweeps[0]["sf"],
        "nqueries": len(best),
        "protocol": protocol.replace("{totals}", totals),
    }
    if calibs:
        # per-sweep CPU-calibration control (fixed work, no I/O): cross-
        # round comparisons divide by min(calib) to remove host contention
        merged["calib"] = calibs
        merged["calib_min"] = min(calibs)
    # output-rows denominators for output-bound diagnostics (identical
    # across same-code sweeps; first sweep carrying them wins)
    for s in sweeps:
        if "outrows" in s:
            merged["outrows"] = s["outrows"]
            break
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(out_path, merged["value"], merged["nqueries"])


if __name__ == "__main__":
    main()
