"""Protocol bench runner: N full bench.py runs, per-query minima.

The standing min-of-N protocol leg (BASELINE.md): each run executes
bench.py end to end (full warmup + calibration + 3 tries per query);
the aggregate takes per-query minima across runs, carries every run's
raw/normalized totals and calibrations, and writes the
BENCH_sf01_local_r{N}.json / BENCH_sf1_r{N}.json artifact shape.

Usage: python3 tools/protocol_bench.py <n_runs> <sf_dir> <out_json> <round>"""
import json, os, subprocess, sys

n_runs, sf_dir, out_path, rnd = int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4])
runs = []
for i in range(n_runs):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_TRIES="3",
               PYTHONPATH="/root/repo")
    p = subprocess.run(["python3", "/root/repo/bench.py"], env=env, cwd="/tmp",
                       capture_output=True, text=True, timeout=3000)
    recs = {}
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                recs[d.get("metric")] = d
            except Exception:
                pass
    runs.append({"rc": p.returncode, "recs": recs})
    h = recs.get("headline_queries_total", {})
    print(f"run {i+1}/{n_runs}: rc={p.returncode} total={h.get('value')} "
          f"cal={h.get('calibration')} norm={h.get('normalized_value')}", flush=True)

heads = [r["recs"]["headline_queries_total"] for r in runs if "headline_queries_total" in r["recs"]]
if not heads:
    # ADVICE r13: heads[0] below would IndexError with a misleading
    # traceback when every run failed to emit a headline record
    sys.exit(f"protocol_bench: no run emitted a headline record "
             f"(rcs={[r['rc'] for r in runs]}) — see bench stderr")
qmins = {}
for h in heads:
    for q, v in h["queries"].items():
        qmins[q] = min(qmins.get(q, 1e9), v)
total = round(sum(qmins.values()), 3)
cal_per_run = [h.get("calibration") for h in heads]
# ADVICE r13: take ref from the FIRST run that has a calibration record,
# not runs[0] unconditionally — a failed first run silently dropped
# normalization even when later runs calibrated fine
ref = next((r["recs"]["calibration"].get("ref") for r in runs
            if "calibration" in r["recs"]), None)
ann = {}
for r in runs:
    ab = r["recs"].get("ann_build_total", {})
    for q, v in (ab.get("builds") or {}).items():
        if v and v > 0:
            ann[q] = min(ann.get(q, 1e9), v)
out = {
    "round": rnd,
    "n": n_runs,
    "rc": max(r["rc"] for r in runs),
    "cpus": os.cpu_count(),
    "sf": heads[0].get("sf"),
    "raw_totals": [h.get("value") for h in heads],
    "normalized_totals": [h.get("normalized_value") for h in heads],
    "calibration": {"per_run": cal_per_run, "ref": ref},
    "ann_builds_min": ann,
    "parsed": {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": qmins,
        "sf": heads[0].get("sf"),
    },
}
if ref and cal_per_run and all(c for c in cal_per_run):
    best_cal = min(cal_per_run)
    out["parsed"]["calibration"] = best_cal
    out["parsed"]["normalized_value"] = round(total * ref / best_cal, 3)
    out["parsed"]["box_speed"] = round(best_cal / ref, 3)
json.dump(out, open(out_path, "w"), indent=1)
print("wrote", out_path, "total", total, flush=True)
