"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N-vs-4N-executor criterion is
evidenced by running the *same* extraction job on the *same* materialized
input at local[8] and local[32] in separate JVMs, reporting throughput at
both plus scaling efficiency (T32/T8)/4. Results are written to
BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_convs]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pdf_extractor_spark.session import get_spark
from pdf_extractor_spark.plans.pipeline import run_pipeline
cpus = int(sys.argv[1]); corpus = sys.argv[2]
spark = get_spark(app_name=f"scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 16))
t = spark.read.parquet(corpus)
n = t.count()
run_pipeline(t.limit(2000)).write.mode("overwrite").format("noop").save()  # warmup
t0 = time.perf_counter()
run_pipeline(t, salt_partitions=cpus * 4).write.mode("overwrite").format("noop").save()
dt = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "sec": dt, "turns": n,
                  "tps": n / dt}}))
spark.stop()
"""


def run_level(cpus: int, corpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", JOB.format(repo=REPO), str(cpus), corpus],
        capture_output=True, text=True, timeout=3600, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    sys.path.insert(0, REPO)
    from bench import ensure_corpus
    from pdf_extractor_spark.session import get_spark

    spark = get_spark(app_name="scale-gen", master="local[32]")
    corpus = ensure_corpus(spark, n_convs)
    spark.stop()

    low = run_level(8, corpus)
    high = run_level(32, corpus)
    eff = (high["tps"] / low["tps"]) / 4.0

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH baseline — extraction throughput + scaling efficiency

Measured {date.today().isoformat()} on the deterministic synthetic transcript
corpus (seed=42, {n_convs} conversations, {low["turns"]} turns, ~10% of
assistant turns carrying pseudo-PDF/HTML payloads). Same materialized parquet
input, same job (`plans.pipeline.run_pipeline`), two parallelism levels in
separate JVMs — the sandbox stand-in for N vs 4N executors per BASELINE.json.

| parallelism | wall sec | extracted turns/sec |
|---|---|---|
| local[8]  (N)  | {low["sec"]:.2f} | {low["tps"]:.1f} |
| local[32] (4N) | {high["sec"]:.2f} | {high["tps"]:.1f} |

**Scaling efficiency (T_4N / T_N) / 4 = {eff:.3f}** (target >= 0.8).

Method notes:
- throughput = total turns / wall time of the full pipeline (per-turn
  extraction UDF + per-conversation ordered assembly), noop sink.
- per-turn extraction is embarrassingly parallel; salted repartition
  (cpus*4 partitions on (conv_id, turn_idx)) defuses long-conversation skew,
  so task count, not conversation size, bounds the critical path.
- the only shuffle is the final per-conversation regroup; AQE coalesces it.
""")
    print(json.dumps({"low": low, "high": high, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
