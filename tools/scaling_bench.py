"""Scaling-efficiency evidence for the north rule: the identical extraction
job on the identical input at two parallelism levels (local[8] vs local[32]
— the sandbox stand-in for N vs 4N executors), reporting throughput at both
and efficiency = (tput_4N / tput_N) / 4.

Each level runs in a fresh subprocess (fresh JVM — no cache warm-up
leakage). Results are written to BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [n_convs] [levels...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
cpus = int(sys.argv[1]); n_convs = int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from docling_spark.sources.transcripts import transcripts_df
from docling_spark.operators.extract_ops import extract_turns
# materialize the corpus once so the timed section is extraction only
tr = transcripts_df(spark, n_convs, partitions=cpus * 2).cache()
n = tr.count()
# warm the python workers (JIT-free but import cost is real)
extract_turns(tr.limit(256)).count()
t0 = time.time()
res = extract_turns(tr).groupBy("status").count().collect()
wall = time.time() - t0
print("RESULT " + json.dumps({"cpus": cpus, "turns": n, "wall_s": round(wall, 2),
                              "turns_per_s": round(n / wall, 1),
                              "status": {r["status"]: r["count"] for r in res}}))
spark.stop()
"""


def run_level(cpus: int, n_convs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_convs)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker[{cpus}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    levels = [int(x) for x in sys.argv[2:]] or [8, 32]
    results = [run_level(c, n_convs) for c in levels]
    for r in results:
        print(r)
    lo, hi = results[0], results[-1]
    ratio = hi["cpus"] / lo["cpus"]
    eff = (hi["turns_per_s"] / lo["turns_per_s"]) / ratio
    print(f"scaling efficiency local[{lo['cpus']}]→local[{hi['cpus']}]: {eff:.3f}")

    md = [
        "# BENCH BASELINE — scaling evidence (north rule)",
        "",
        "Identical extraction job (deterministic synthetic transcripts corpus,",
        f"{lo['turns']} turns) on identical input at two parallelism levels,",
        "fresh JVM per level. Sandbox stand-in for N vs 4N executors per the",
        "driver instruction (no real cluster available).",
        "",
        "| parallelism | turns | wall (s) | turns/s |",
        "|---|---|---|---|",
    ]
    for r in results:
        md.append(f"| local[{r['cpus']}] | {r['turns']} | {r['wall_s']} | {r['turns_per_s']} |")
    md += [
        "",
        f"**Scaling efficiency** (tput_{hi['cpus']} / tput_{lo['cpus']}) / "
        f"({hi['cpus']}/{lo['cpus']}) = **{eff:.3f}**"
        + ("  — meets the ≥ 0.8 criterion." if eff >= 0.8 else
           "  — BELOW the 0.8 criterion; see notes."),
        "",
        "Extraction is per-row (embarrassingly parallel, no shuffle in the",
        "operator); the residual inefficiency is Python-worker startup and",
        "Arrow serialization overhead amortized over the corpus.",
        "",
        "Status counts (identical across levels — determinism witness): "
        + json.dumps(lo["status"]),
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {path}")
    if lo["status"] != hi["status"]:
        print("WARNING: status counts differ between levels!")
        sys.exit(1)


if __name__ == "__main__":
    main()
