"""Two-parallelism-level scaling benchmark (the sandbox proxy for the
north rule's N vs 4N executor criterion): run the identical ER job at
local[8] and local[32] on the same deterministic synthetic corpus, report
throughput at both and scaling efficiency = (T_8 / T_32) / (32 / 8).

Each level runs in a fresh subprocess (own JVM) via fozzie_spark.job with
a fresh checkpoint dir (no resume reuse across levels). Writes/updates
BENCH/BASELINE.md.

    python scripts/bench_scaling.py [n_entities]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

LEVELS = tuple(int(x) for x in os.environ.get('FZ_LEVELS', '8,32').split(','))


def run_level(cpus: int, n_entities: int) -> dict:
    ckpt = f"/tmp/fz_scale_{cpus}"
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.time()
    env = dict(os.environ, SPARK_DRIVER_MEMORY=os.environ.get("FZ_HEAP", "24g"))
    # taskset pins the whole process tree to `cpus` physical cores, so the
    # low level truly emulates a small machine instead of opportunistically
    # borrowing the host's spare cores for GC/JIT/OS work (paired with
    # -XX:ActiveProcessorCount inside job.build_session)
    pin = ["taskset", "-c", f"0-{cpus - 1}"] if shutil.which("taskset") else []
    proc = subprocess.run(
        pin
        + [
            sys.executable, "-m", "fozzie_spark.job",
            "--synth-entities", str(n_entities),
            "--checkpoint-dir", ckpt,
            "--cpus", str(cpus),
            "--shuffle-partitions", str(cpus * 2),
            "--no-resume",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    wall = time.time() - t0
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(proc.stdout[-2000:], proc.stderr[-2000:])
        raise RuntimeError(f"no JSON from local[{cpus}] run")
    out = json.loads(line[-1])
    out["subprocess_wall_s"] = round(wall, 1)
    return out


def main() -> int:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    results = {c: run_level(c, n_entities) for c in LEVELS}
    lo, hi = LEVELS
    # throughput = candidate pairs scored / scoring wall; also docs/s overall
    thr = {c: results[c]["pairs_scored_per_sec"] for c in LEVELS}
    dps = {c: results[c]["docs_per_sec"] for c in LEVELS}
    t_lo, t_hi = results[lo]["wall_s"], results[hi]["wall_s"]
    eff_wall = (t_lo / t_hi) / (hi / lo)
    eff_docs = (dps[hi] / dps[lo]) / (hi / lo)
    eff_pairs = (thr[hi] / thr[lo]) / (hi / lo)

    os.makedirs("BENCH", exist_ok=True)
    out_path = os.environ.get("FZ_BENCH_OUT", "BENCH/BASELINE.md")
    with open(out_path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling efficiency (N vs 4N parallelism)

Sandbox proxy for the north rule's two-cluster-size criterion (per the
driver instruction): the identical `python -m fozzie_spark.job` ER run on
the same deterministic synthetic corpus ({n_entities} entities,
{results[lo]['docs']} docs, seed 42) at `local[{lo}]` and `local[{hi}]`,
fresh JVM + fresh checkpoint dir each.

| level | end-to-end wall s | docs/s | candidate pairs | pairs scored/s (scoring stage) |
|---|---|---|---|---|
| local[{lo}] | {t_lo} | {dps[lo]} | {results[lo]['candidate_pairs']} | {thr[lo]} |
| local[{hi}] | {t_hi} | {dps[hi]} | {results[hi]['candidate_pairs']} | {thr[hi]} |

- scaling efficiency (end-to-end wall): **{eff_wall:.3f}**
- scaling efficiency (docs/s):         **{eff_docs:.3f}**
- scaling efficiency (pairs scored/s, scoring stage only): **{eff_pairs:.3f}**
- target: >= 0.8 between N and 4N (north rule)

Stage walls (s):

| stage | local[{lo}] | local[{hi}] |
|---|---|---|
"""
        )
        for stage in ("keys", "pairs", "edges", "clusters", "entities"):
            f.write(
                f"| {stage} | {results[lo]['stage_wall_s'].get(stage)} "
                f"| {results[hi]['stage_wall_s'].get(stage)} |\n"
            )
        f.write(
            f"""
Raw JSON:

```json
{json.dumps(results, indent=2)}
```
"""
        )
    print(json.dumps({"eff_wall": eff_wall, "eff_docs": eff_docs, "eff_pairs": eff_pairs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
