"""Isolated-executor scaling control: 1 vs 4 fully isolated 8-core Spark
"executors" on this box.

The most faithful in-sandbox emulation of the north rule's N vs 4N
EXECUTORS: four concurrent, fully isolated JVMs (own process, own GC, own
SPARK_LOCAL_DIRS, own checkpoint dir), each pinned with taskset to a
disjoint 8-core set, each running the identical ER job — versus one such
pinned instance alone. If even fully isolated processes cannot aggregate
4x throughput, the box's shared memory subsystem (not the engine's shuffle
or serialization design) is the binding constraint, and the engine's
single-JVM local[8]-vs-local[32] efficiency should be read against this
ceiling.

    python scripts/bench_isolated_executors.py [n_entities]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

CORE_SETS = ["0-7", "8-15", "16-23", "24-31"]


def launch(cores: str, idx: int, n_entities: int) -> subprocess.Popen:
    ckpt = f"/tmp/fz_iso_{idx}"
    shutil.rmtree(ckpt, ignore_errors=True)
    local_dirs = tempfile.mkdtemp(prefix=f"fz_iso_local_{idx}_")
    env = dict(
        os.environ,
        SPARK_DRIVER_MEMORY=os.environ.get("FZ_ISO_MEM", "24g"),
        SPARK_LOCAL_DIRS=local_dirs,
    )
    return subprocess.Popen(
        [
            "taskset", "-c", cores,
            sys.executable, "-m", "fozzie_spark.job",
            "--synth-entities", str(n_entities),
            "--checkpoint-dir", ckpt,
            "--cpus", "8",
            "--shuffle-partitions", "16",
            "--no-resume",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def collect(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    line = [l for l in out.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError("no JSON from isolated run")
    return json.loads(line[-1])


def main() -> int:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    # solo: one pinned 8-core instance
    t0 = time.time()
    solo = collect(launch(CORE_SETS[0], 0, n_entities))
    solo_wall = time.time() - t0
    print(f"solo pinned 8-core: {solo['wall_s']}s ({solo['docs']} docs)", flush=True)

    # quartet: four concurrent isolated instances on disjoint core sets
    t0 = time.time()
    procs = [launch(cs, i, n_entities) for i, cs in enumerate(CORE_SETS)]
    results = [collect(p) for p in procs]
    quartet_wall = time.time() - t0
    walls = [r["wall_s"] for r in results]
    print(f"4x pinned 8-core concurrent: walls {walls}", flush=True)

    docs = solo["docs"]
    solo_rate = docs / solo["wall_s"]
    agg_rate = sum(docs / w for w in walls)
    eff = agg_rate / (4 * solo_rate)
    summary = {
        "n_entities": n_entities,
        "solo_wall_s": solo["wall_s"],
        "quartet_wall_s": walls,
        "quartet_makespan_s": round(quartet_wall, 1),
        "solo_docs_per_sec": round(solo_rate, 1),
        "aggregate_docs_per_sec": round(agg_rate, 1),
        "isolated_executor_scaling_efficiency": round(eff, 3),
        "solo_subprocess_wall_s": round(solo_wall, 1),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
