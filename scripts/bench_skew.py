"""Hot-key skew bench (north rule: "defuse hot-key skew").

Two experiments over the skewed synthetic corpus
(`fozzie_spark.synth.synth_documents_skewed`: one entity with H NEAR-dup
docs sharing a boilerplate text — every shared q-gram df == H, globally
hot — plus one entity of E EXACT-dup docs), run through the real
`fozzie_spark.job` entry:

A) Defaults at scale: N entities + hot cluster big enough that the
   default `max_gram_df="auto"` cap (n_keys/8) trips. One run: the
   boilerplate grams leave the inverted index, the complementary
   sorted-neighborhood pass restores connectivity, the exact dups
   collapse in the keys stage, and the job reports F1 + wall. The
   un-defused counterfactual for this size is ~C(H,2) surviving pairs
   through the scorer and CC — quadratic in H — which is why it is only
   run at the reduced size of (B).

B) Equivalence at reduced hot size: same corpus shape, small enough that
   the quadratic run is feasible. Two runs — explicit cap (df cap <<
   hot df) vs cap disabled — must produce the IDENTICAL entity
   partition (canonical-label compare over the written entities parquet,
   DuckDB) while the capped run evaluates a fraction of the candidates.

    python scripts/bench_skew.py            # defaults below
    FZ_CPUS=8 python scripts/bench_skew.py  # different level

Writes BENCH/skew.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPUS = int(os.environ.get("FZ_CPUS", "32"))

# experiment A: auto cap = max(10k, n_keys // 8); ~250k normal keys +
# 40k hot keys -> cap ~= 36k < 40k hot df -> the default defuses it
A_ENTITIES, A_HOT, A_EXACT = (
    int(os.environ.get("FZ_SKEW_A_ENTITIES", 100_000)),
    int(os.environ.get("FZ_SKEW_A_HOT", 40_000)),
    int(os.environ.get("FZ_SKEW_A_EXACT", 20_000)),
)
# experiment B: small enough that the uncapped quadratic run finishes
B_ENTITIES, B_HOT = (
    int(os.environ.get("FZ_SKEW_B_ENTITIES", 20_000)),
    int(os.environ.get("FZ_SKEW_B_HOT", 5_000)),
)


def run_job(tag: str, n: int, hot: int, exact: int, max_gram_df: str) -> dict:
    ckpt, out = f"/tmp/fz_skew_ckpt_{tag}", f"/tmp/fz_skew_out_{tag}"
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    pin = ["taskset", "-c", f"0-{CPUS - 1}"] if shutil.which("taskset") else []
    cmd = pin + [
        sys.executable, "-m", "fozzie_spark.job",
        "--synth-entities", str(n),
        "--synth-hot-docs", str(hot),
        "--synth-hot-exact", str(exact),
        "--checkpoint-dir", ckpt,
        "--output", out,
        "--max-gram-df", max_gram_df,
        "--cpus", str(CPUS),
        "--shuffle-partitions", str(CPUS * 2),
        "--no-resume", "--no-partition-metrics",
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        print(proc.stdout[-3000:], file=sys.stderr)
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"job {tag} failed (rc={proc.returncode})")
    res = json.loads(lines[-1])
    res["subprocess_wall_s"] = round(wall, 1)
    res["output_path"] = out
    return res


def cluster_facts(path: str) -> dict:
    """Hot/exact cluster integrity + a canonical partition fingerprint."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW ent AS SELECT doc_id, entity_id FROM '{path}/*.parquet';
        CREATE VIEW canon AS
          SELECT e.doc_id, m.canon FROM ent e JOIN (
            SELECT entity_id, min(doc_id) AS canon FROM ent GROUP BY entity_id
          ) m USING (entity_id)"""
    )
    hot_members, hot_foreign = con.execute(
        """SELECT count(*), sum(CASE WHEN doc_id NOT LIKE 'hot-%' THEN 1 ELSE 0 END)
           FROM canon WHERE canon = (SELECT canon FROM canon WHERE doc_id = 'hot-0000000000')"""
    ).fetchone()
    dup = con.execute(
        """SELECT count(*) FROM canon
           WHERE canon = (SELECT canon FROM canon WHERE doc_id = 'dup-0000000000')"""
    ).fetchone()[0] if con.execute(
        "SELECT count(*) FROM ent WHERE doc_id LIKE 'dup-%'").fetchone()[0] else 0
    fingerprint = con.execute(
        "SELECT md5(string_agg(doc_id || '=' || canon, ',' ORDER BY doc_id)) FROM canon"
    ).fetchone()[0]
    con.close()
    return {
        "hot_cluster_size": int(hot_members),
        "hot_cluster_foreign_docs": int(hot_foreign or 0),
        "exact_dup_cluster_size": int(dup),
        "partition_fingerprint": fingerprint,
    }


def main() -> int:
    results = {}

    a = run_job("a_auto", A_ENTITIES, A_HOT, A_EXACT, "auto")
    a.update(cluster_facts(a["output_path"]))
    results["A_defaults_at_scale"] = a

    b_cap = run_job("b_cap", B_ENTITIES, B_HOT, 0, "2000")
    b_cap.update(cluster_facts(b_cap["output_path"]))
    b_full = run_job("b_full", B_ENTITIES, B_HOT, 0, "none")
    b_full.update(cluster_facts(b_full["output_path"]))
    results["B_capped"] = b_cap
    results["B_uncapped"] = b_full

    same_partition = b_cap["partition_fingerprint"] == b_full["partition_fingerprint"]
    cand_ratio = b_full["candidate_pairs"] / max(b_cap["candidate_pairs"], 1)
    hot_quad = A_HOT * (A_HOT - 1) // 2

    md = f"""# Hot-key skew evidence

Corpus: `synth_documents_skewed` — one entity of H near-duplicate docs
sharing a boilerplate text (every shared q-gram df == H, globally hot;
unique per-doc tail), one entity of E exact-duplicate docs, over the
normal corpus. All runs through `python -m fozzie_spark.job` at
local[{CPUS}] (taskset-pinned), fresh checkpoint dir each.

## A. Defaults defuse the hot key at scale

{A_ENTITIES} entities + H={A_HOT} hot near-dups + E={A_EXACT} exact dups
({a['docs']} docs): the default `max_gram_df="auto"` cap (n_keys/8)
trips on the boilerplate grams, the sorted-neighborhood pass restores
cluster connectivity transitively, exact dups collapse to ONE key in
the keys stage (zero pair work).

| wall s | candidate pairs | pairs scored/s | pairwise F1 | hot cluster | foreign docs in it | exact-dup cluster |
|---|---|---|---|---|---|---|
| {a['wall_s']} | {a['candidate_pairs']:,} | {a['pairs_scored_per_sec']:,} | {a['pairwise_f1']} | {a['hot_cluster_size']} (= H) | {a['hot_cluster_foreign_docs']} | {a['exact_dup_cluster_size']} (= E) |

The un-defused counterfactual at this size is ~{hot_quad:,} surviving
pairs from the hot entity alone (C(H,2) — every near-dup pair is a TRUE
match, so no verifier prunes them) pushed through scoring and connected
components: quadratic in H and ~{hot_quad // max(a['candidate_pairs'], 1)}x
this run's ENTIRE candidate volume. That counterfactual is executed at
the reduced size of experiment B.

## B. Capped + sorted-neighborhood == uncapped quadratic, bit-identical

{B_ENTITIES} entities + H={B_HOT} hot near-dups, capped
(`max_gram_df=2000` << H) vs uncapped (`max_gram_df=none`):

| run | wall s | candidate pairs | surviving pairs | pairwise F1 |
|---|---|---|---|---|
| capped + SN | {b_cap['wall_s']} | {b_cap['candidate_pairs']:,} | {b_cap['surviving_pairs']:,} | {b_cap['pairwise_f1']} |
| uncapped | {b_full['wall_s']} | {b_full['candidate_pairs']:,} | {b_full['surviving_pairs']:,} | {b_full['pairwise_f1']} |

- entity partitions IDENTICAL (canonical-label md5 over every doc):
  **{same_partition}**
- candidate ratio uncapped/capped: **{cand_ratio:.1f}x**
- wall ratio uncapped/capped: **{b_full['wall_s'] / b_cap['wall_s']:.2f}x**

The capped run recovers the exact same clusters with a {cand_ratio:.0f}x
smaller candidate set because transitive clustering only needs the hot
cluster CONNECTED, not complete: sorted-neighborhood chains rank-adjacent
keys (window pairs verified at the real threshold — no false merges), and
connected components closes the transitive hull. At 100 TB the same
mechanism bounds every boilerplate cluster's pair work to O(H * window)
instead of O(H^2).

Raw JSON:

```json
{json.dumps(results, indent=2)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew.md"), "w") as f:
        f.write(md)
    print(json.dumps({
        "a_wall_s": a["wall_s"], "a_f1": a["pairwise_f1"],
        "a_hot_intact": a["hot_cluster_size"] == A_HOT and a["hot_cluster_foreign_docs"] == 0,
        "b_same_partition": same_partition, "b_cand_ratio": round(cand_ratio, 1),
        "b_wall_ratio": round(b_full["wall_s"] / b_cap["wall_s"], 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
