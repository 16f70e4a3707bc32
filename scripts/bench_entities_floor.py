"""Box-floor control for the ER `entities` stage (VERDICT r5 #5).

The entities stage is: recompute the synthetic docs frame -> broadcast-
hash-join an 8-byte assignment onto it -> write the full spans payload to
parquet. Its irreducible single-box cost is the payload materialization
(synth compute + parquet encode + one local disk). This control measures
exactly that floor: the SAME docs frame, written straight to parquet with
no join, at the same two pinned parallelism levels the scaling bench
uses. If the control's 8->32 efficiency matches the entities stage's,
the stage is at the box floor and the remaining gap is the join.

    python scripts/bench_entities_floor.py [n_entities]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

LEVELS = tuple(int(x) for x in os.environ.get("FZ_LEVELS", "8,32").split(","))

_CHILD = r"""
import json, sys, time
from fozzie_spark.job import build_session
from fozzie_spark.synth import synth_documents

cpus, n = sys.argv[1], int(sys.argv[2])
spark = build_session("fz-entities-floor", cpus, int(cpus) * 2)
spark.sparkContext.setLogLevel("ERROR")
docs = synth_documents(spark, n, seed=42)
out = f"/tmp/fz_floor_{cpus}/docs"
t0 = time.time()
docs.write.mode("overwrite").parquet(out)
wall = time.time() - t0
rows = spark.read.parquet(out).count()
print(json.dumps({"cpus": int(cpus), "write_wall_s": round(wall, 1), "rows": rows}))
"""


def run_level(cpus: int, n_entities: int) -> dict:
    shutil.rmtree(f"/tmp/fz_floor_{cpus}", ignore_errors=True)
    env = dict(os.environ, SPARK_DRIVER_MEMORY=os.environ.get("FZ_HEAP", "24g"))
    pin = ["taskset", "-c", f"0-{cpus - 1}"] if shutil.which("taskset") else []
    t0 = time.time()
    proc = subprocess.run(
        pin + [sys.executable, "-c", _CHILD, str(cpus), str(n_entities)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(proc.stdout[-2000:], proc.stderr[-2000:])
        raise RuntimeError(f"no JSON from local[{cpus}] control")
    out = json.loads(line[-1])
    out["subprocess_wall_s"] = round(time.time() - t0, 1)
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    results = {c: run_level(c, n) for c in LEVELS}
    lo, hi = LEVELS
    eff = (results[lo]["write_wall_s"] / results[hi]["write_wall_s"]) / (hi / lo)
    print(json.dumps({"n_entities": n, "results": results, "eff_write": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
