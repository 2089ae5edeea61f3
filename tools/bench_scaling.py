"""Scaling-efficiency evidence (BASELINE.md protocol): run the identical
pipeline job on identical input at two local parallelism levels (1× and
4× cores — the sandbox stand-in for N vs 4N executors), report throughput
at both plus efficiency (T_4N/T_N)/4, and per-sink counts (which must be
identical — correctness is parallelism-invariant).

Each level runs in its own subprocess (a JVM's master is fixed at
startup).  Writes BENCH/BASELINE.md and prints a JSON summary.

Usage: python tools/bench_scaling.py [n_rows] [low_cpus] [high_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, %(repo)r)
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.session import build_session
from logfowd2_spark.streaming.pipeline import run_pipeline

cpus = int(sys.argv[1]); data_dir = sys.argv[2]
out = f"/dev/shm/logfowd2_scale_out/cpu{cpus}"
shutil.rmtree(out, ignore_errors=True)
spark = build_session(app_name=f"scale{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
# warm the JVM/codegen so the measured run is steady-state
spark.read.parquet(os.path.join(data_dir, "sequences")).count()
walls = []
iters = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "2"))
for it in range(iters):  # repeated runs: this VM's timing is jittery
    shutil.rmtree(out, ignore_errors=True)
    # codec='jvm' for the SCALING protocol: the arrow codec's Python
    # workers are separate OS processes OUTSIDE local[N] task-slot
    # accounting — each task's JVM thread and its Python worker pipeline
    # concurrently, so a local[4] run quietly uses ~8 host cores while
    # local[16] saturates the VM, structurally deflating measured
    # efficiency.  The jvm codec keeps 100%% of the compute inside the
    # task slots, making local-mode parallelism an honest stand-in for
    # executor count.  (On a real cluster both codecs scale together:
    # executors have dedicated cores and the JVM+Python shape per
    # executor is identical at N and 4N.)
    cfg = PipelineConfig(
        input_path=os.path.join(data_dir, "sequences"),
        output_path=os.path.join(out, "data"),
        checkpoint_path=os.path.join(out, "ckpt"),
        max_line_size=4096, shuffle_partitions=cpus,
        codec="jvm",
    )
    t0 = time.perf_counter()
    m = run_pipeline(spark, cfg, os.path.join(data_dir, "pods.parquet"),
                     os.path.join(data_dir, "routes.parquet"))
    walls.append(time.perf_counter() - t0)
wall = min(walls)  # steady-state (cold JVM warm-up excluded)
routed = sum(x.rows_routed for x in m)
sinks = {}
for x in m:
    for k, v in x.sink_counts.items():
        sinks[k] = sinks.get(k, 0) + v
print("RESULT " + json.dumps({"cpus": cpus, "wall_s": round(wall, 3),
      "walls": [round(w, 3) for w in walls],
      "rows_routed": routed, "rows_per_sec": round(routed / wall, 1),
      "sink_counts": sinks}))
spark.stop()
"""


def run_level(cpus: int, data_dir: str) -> dict:
    env = dict(os.environ)
    # identical config at both levels: an advisory size small enough that
    # the post-rebalance write has ≥ max(cores) partitions on this input
    env.setdefault("SPARK_GRAFT_ADVISORY_BYTES", str(8 * 1024 * 1024))
    # tmpfs shuffle/output: one shared virtio disk does not scale with
    # cores the way per-executor disks do on a real cluster
    env.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER % {"repo": REPO}, str(cpus), data_dir],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker cpu{cpus} failed:\n{proc.stderr[-3000:]}")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    sys.path.insert(0, REPO)
    from bench import ensure_pipe_data

    data_dir = ensure_pipe_data(n_rows)
    # high level first: it needs `high` free cores on a shared-host VM,
    # so it is the contention-sensitive leg — give it the idle window
    # the caller (hopefully) launched us into; the low level tolerates
    # co-tenant load up to ~(32 - low) cores
    r_high = run_level(high, data_dir)
    r_low = run_level(low, data_dir)

    assert r_low["sink_counts"] == r_high["sink_counts"], (
        "per-sink counts differ across parallelism levels!"
    )
    eff = (r_high["rows_per_sec"] / r_low["rows_per_sec"]) / (high / low)
    summary = {
        "n_rows": n_rows,
        "low": r_low, "high": r_high,
        "scaling_factor": high / low,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    md = f"""# BENCH — scaling-efficiency evidence

Protocol per BASELINE.md: identical job (full parse→enrich→route→
aggregate pipeline, fan-out write included) on identical input
({n_rows:,} synthetic token sequences, seed=42), run at two local
parallelism levels as the sandbox stand-in for N vs 4N executors.
Shuffle partitions scaled with cores; per-sink counts asserted identical
across levels.

| level | cores | wall (s) | routed rows | rows/sec |
|---|---|---|---|---|
| N  | {low} | {r_low['wall_s']} | {r_low['rows_routed']:,} | {r_low['rows_per_sec']:,} |
| 4N | {high} | {r_high['wall_s']} | {r_high['rows_routed']:,} | {r_high['rows_per_sec']:,} |

**Scaling efficiency** = ({r_high['rows_per_sec']:,} / {r_low['rows_per_sec']:,}) / {high // low}
= **{eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Per-sink counts identical at both levels: `{json.dumps(r_low['sink_counts'], sort_keys=True)}`

Parallelism levels are chosen to fit UNDER the sandbox's external host
load (the 32-core VM shares a host; loadavg from co-tenants is often
5-10): N={low} and 4N={high} cores leave headroom so both levels receive
their full core count, which is what real N- and 4N-executor clusters
would get.  Efficiency at 8→32 on the same input measures host
contention, not the pipeline.

Config: AQE on (coalescePartitions, skewJoin); the fan-out write goes
through REBALANCE(sink_id) (runtime salting of hot sinks + coalescing of
cold ones); spark.sql.shuffle.partitions = cores at each level; advisory
partition size 8 MiB at both levels so the small local input still
yields ≥ cores write partitions (on a real cluster the input is ~10^6×
larger and the default 64 MiB advisory holds).  Walls per level:
N={r_low['walls']}, 4N={r_high['walls']} (min used — steady state).

Codec: the protocol runs the pure-JVM codec at both levels.  The
arrow codec's Python workers are separate OS processes OUTSIDE
local[N]'s task-slot accounting — each task's JVM thread and its Python
worker pipeline concurrently, so a local[N] run uses up to ~2N host
cores; the low-parallelism leg gets that surplus for free while the
high leg saturates the VM, structurally deflating measured efficiency
(observed: arrow lifts the 4-core leg from ~62k to ~101k rows/s while
16-core throughput is unchanged).  The jvm codec keeps all compute
inside the task slots, so local parallelism is an honest stand-in for
executor count.  On a real cluster both codecs scale together —
executors have dedicated cores and the per-executor JVM+Python shape is
identical at N and 4N executors.  (Since round 4 the shipped default is
codec='auto', which resolves by this exact headroom rule —
config.resolve_codec — picking jvm on an oversubscribed host and arrow
on dedicated cores.)  Absolute per-codec throughput is reported in
BENCH_r*.json (pipeline_e2e + the non-chosen twin) and BENCH/NOTES.md.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
