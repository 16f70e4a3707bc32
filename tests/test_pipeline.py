"""Tests for the north-rule ER pipeline: synthetic corpus, connected
components, pairwise F1 >= 0.99 vs ground truth, span-sequence invariant,
and checkpoint/resume."""

import json
import os

import pytest
from pyspark.sql import functions as F

from fozzie_spark.cluster import connected_components
from fozzie_spark.pipeline import er_pipeline, pairwise_f1
from fozzie_spark.synth import doc_text_key, make_doc, synth_documents


# ---- connected components ---------------------------------------------------


def test_cc_chain_and_islands(spark):
    # chain 0-1-...-9 (worst case for label propagation), pair {100,101},
    # isolated via self-edge-free node 200 appearing in an edge to itself is
    # dropped; isolated nodes only appear if they have an edge
    edges = [(i, i + 1) for i in range(9)] + [(100, 101), (300, 200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    cc = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert all(cc[i] == 0 for i in range(10))
    assert cc[100] == cc[101] == 100
    assert cc[200] == cc[300] == 200


def test_cc_string_nodes(spark):
    df = spark.createDataFrame([("b", "a"), ("b", "c"), ("x", "y")], "src string, dst string")
    cc = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == "a"
    assert cc["x"] == cc["y"] == "x"


# ---- synth determinism ------------------------------------------------------


def test_synth_deterministic(spark):
    a = synth_documents(spark, 20, seed=7).collect()
    b = synth_documents(spark, 20, seed=7).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    ta = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in a}
    tb = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in b}
    assert ta == tb
    # offsets ascending, media spans have empty text + a ref
    for spans in ta.values():
        offsets = [s[3] for s in spans]
        assert offsets == sorted(offsets)
        for kind, text, ref, _ in spans:
            if kind != "text":
                assert text == "" and ref.startswith("media://")

    # deterministic irrespective of partitioning
    c = synth_documents(spark, 20, seed=7, partitions=7).collect()
    assert {r["doc_id"] for r in c} == set(ta)


def test_doc_text_key_matches_local(spark):
    docs = synth_documents(spark, 10, seed=3)
    got = {r["doc_id"]: r["k"] for r in docs.select("doc_id", doc_text_key().alias("k")).collect()}
    for did, key in got.items():
        entity = int(did.split("-")[1])
        variant = int(did.split("-")[2])
        _, _, spans = make_doc(entity, variant, seed=3)
        expected = " ".join(s["text"] for s in spans if s["kind"] == "text")
        assert key == expected, did


# ---- the full pipeline ------------------------------------------------------


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    docs = synth_documents(spark, 150, seed=42).cache()
    out = er_pipeline(spark, docs, checkpoint_dir=ckpt, method="jaccard", max_distance=0.45, q=3)
    return docs, out, ckpt


def test_pipeline_f1(spark, pipe):
    docs, out, _ = pipe
    pred = out["entities"].select("doc_id", "entity_id")
    truth = docs.select("doc_id", F.col("entity_id").alias("truth"))
    joined = truth.join(pred, "doc_id").select(
        F.col("truth").alias("entity_id"), F.col("entity_id").alias("pred")
    )
    m = pairwise_f1(joined.withColumnRenamed("pred", "predx").withColumnRenamed("entity_id", "t"),
                    truth_col="t", pred_col="predx")
    assert m["f1"] >= 0.99, m


def test_pipeline_span_invariant(spark, pipe):
    docs, out, _ = pipe
    before = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in docs.collect()}
    after = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in out["entities"].collect()}
    assert before == after  # (kind, text, media_ref, offset) sequence, byte-identical


def test_pipeline_checkpoints_and_resume(spark, pipe, tmp_path):
    docs, out, ckpt = pipe
    # all five stage manifests exist with metrics
    for stage in ("keys", "pairs", "edges", "clusters", "entities"):
        mp = os.path.join(ckpt, f"{stage}.manifest.json")
        assert os.path.exists(mp), stage
        with open(mp) as f:
            m = json.load(f)
        assert m["metrics"]["rows"] > 0
        assert m["metrics"]["rows_per_partition"]

    # resume: re-running with identical config must NOT rewrite stage data
    mtimes = {
        s: os.path.getmtime(os.path.join(ckpt, f"{s}.manifest.json"))
        for s in ("keys", "pairs", "edges", "clusters", "entities")
    }
    out2 = er_pipeline(spark, docs, checkpoint_dir=ckpt, method="jaccard", max_distance=0.45, q=3)
    assert out2["entities"].count() == out["entities"].count()
    for s, t in mtimes.items():
        assert os.path.getmtime(os.path.join(ckpt, f"{s}.manifest.json")) == t, s

    # changed config invalidates downstream stages
    out3 = er_pipeline(spark, docs, checkpoint_dir=ckpt, method="jaccard", max_distance=0.35, q=3)
    assert os.path.getmtime(os.path.join(ckpt, "edges.manifest.json")) > mtimes["edges"]


def test_pipeline_identical_texts_cluster(spark, tmp_path):
    rows = [
        ("a", [{"kind": "text", "text": "hello world", "media_ref": None, "offset": 0}]),
        ("b", [{"kind": "text", "text": "hello world", "media_ref": None, "offset": 0}]),
        ("c", [{"kind": "text", "text": "completely different", "media_ref": None, "offset": 0}]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    out = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path), max_distance=0.2, q=3)
    ent = {r["doc_id"]: r["entity_id"] for r in out["entities"].collect()}
    assert ent["a"] == ent["b"] != ent["c"]


def test_cc_reliable_checkpoint(spark, tmp_path):
    edges = [(i, i + 1) for i in range(9)] + [(100, 101)]
    df = spark.createDataFrame(edges, "src long, dst long")
    cc = {
        r["node"]: r["component"]
        for r in connected_components(
            df, checkpoint_dir=str(tmp_path), driver_finish_bytes=0
        ).collect()
    }
    assert all(cc[i] == 0 for i in range(10))
    assert cc[100] == cc[101] == 100
    # only the LAST round's stage table survives (earlier rounds are
    # deleted as iterations advance; the final one backs the result DF)
    rounds = [p for p in os.listdir(tmp_path) if p.startswith("cc_round_")]
    assert len(rounds) == 1

    # default (driver-finish enabled): same assignment, and NO round table
    # survives — the result is a driver-local relation, so every round
    # artifact is dead and deleted
    ck2 = tmp_path / "fin"
    ck2.mkdir()
    cc2 = {
        r["node"]: r["component"]
        for r in connected_components(df, checkpoint_dir=str(ck2)).collect()
    }
    assert cc2 == cc
    assert [p for p in os.listdir(ck2) if p.startswith("cc_round_")] == []


def test_pipeline_short_key_recall(spark, tmp_path):
    # texts SHORTER than q have empty gram profiles — the dedicated
    # short-key block must still pair them (jaccard(empty, empty) = 0)
    def doc(i, text):
        return (f"d{i}", [{"kind": "text", "text": text, "media_ref": None, "offset": 0}])

    rows = [doc(0, "ab"), doc(1, "xy"), doc(2, "regular longer document text here")]
    docs = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    out = er_pipeline(
        spark, docs, checkpoint_dir=str(tmp_path), max_distance=0.4, q=4, sn_window=None
    )
    ent = {r["doc_id"]: r["entity_id"] for r in out["entities"].collect()}
    # both sub-q texts have empty profiles => jaccard dist 0 => one entity
    assert ent["d0"] == ent["d1"] != ent["d2"]


def test_pipeline_input_change_invalidates_resume(spark, tmp_path):
    ckpt = str(tmp_path)
    docs1 = synth_documents(spark, 30, seed=1)
    out1 = er_pipeline(spark, docs1, checkpoint_dir=ckpt)
    n1 = out1["entities"].count()
    # same params, DIFFERENT input plan: must re-run, not resume stale stages
    docs2 = synth_documents(spark, 60, seed=2)
    out2 = er_pipeline(spark, docs2, checkpoint_dir=ckpt)
    assert out2["entities"].count() == docs2.count() != n1


def test_pipeline_edit_method_short_keys(spark, tmp_path):
    # edit-family methods: keys shorter than q + q*tau share NO gram yet can
    # be within distance tau — the length-band short-key block must pair them
    def doc(i, text):
        return (f"d{i}", [{"kind": "text", "text": text, "media_ref": None, "offset": 0}])

    docs = spark.createDataFrame(
        [doc(0, "abcd"), doc(1, "abxd"), doc(2, "zzzzzzzzzzzz")],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = er_pipeline(
        spark, docs, checkpoint_dir=str(tmp_path), method="lv", max_distance=1,
        q=4, resume=False,
    )
    ent = {r["doc_id"]: r["entity_id"] for r in out["entities"].collect()}
    assert ent["d0"] == ent["d1"] and ent["d2"] != ent["d0"]

    import pytest as _pytest

    # jw is accepted in the provable regime (default tau 0.6 < 2/3) since
    # round 5; an actually-unsupported method still refuses
    with _pytest.raises(ValueError, match="not recall-sound"):
        er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "x"), method="soundex")


def test_pipeline_qgram_and_cosine_methods(spark, tmp_path):
    # profile-distance methods route through blocking.ngram_candidates and
    # verify JVM-side in the edges stage; near-dup texts must co-cluster,
    # distinct texts must not
    def doc(i, text):
        return (f"d{i}", [{"kind": "text", "text": text, "media_ref": None, "offset": 0}])

    docs = spark.createDataFrame(
        [
            doc(0, "the quick brown fox jumps over the dog"),
            doc(1, "the quick brown fox jumps over the hog"),
            doc(2, "entirely unrelated payload zqxjv"),
            doc(3, "ab"),  # shorter than q: empty gram profile
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    for method, tau in (("qgram", 6), ("cosine", 0.2)):
        out = er_pipeline(
            spark, docs, checkpoint_dir=str(tmp_path / method), method=method,
            max_distance=tau, q=3, resume=False,
        )
        ent = {r["doc_id"]: r["entity_id"] for r in out["entities"].collect()}
        assert ent["d0"] == ent["d1"], method
        assert ent["d2"] != ent["d0"], method
        assert len(ent) == 4, method  # every doc assigned (incl. empty-profile d3)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="degenerate"):
        er_pipeline(
            spark, docs, checkpoint_dir=str(tmp_path / "c1"), method="cosine",
            max_distance=1.0,
        )

    # resume works for the ngram-candidate branch: identical re-run leaves
    # every stage manifest untouched; switching METHOD on the same dir
    # invalidates and rewrites
    import os

    ck = str(tmp_path / "qgram")  # from the loop above: a completed qgram run
    mtimes = {
        s: os.path.getmtime(os.path.join(ck, f"{s}.manifest.json"))
        for s in ("keys", "pairs", "edges", "clusters", "entities")
    }
    er_pipeline(spark, docs, checkpoint_dir=ck, method="qgram", max_distance=6, q=3)
    for s, t in mtimes.items():
        assert os.path.getmtime(os.path.join(ck, f"{s}.manifest.json")) == t, s
    er_pipeline(spark, docs, checkpoint_dir=ck, method="cosine", max_distance=0.2, q=3)
    assert os.path.getmtime(os.path.join(ck, "pairs.manifest.json")) > mtimes["pairs"]


def test_cc_precontract_equivalence(spark):
    # partition-local union-find pre-contraction must leave component
    # assignments bit-identical on adversarial shapes: long chains split
    # across partitions, stars, islands — for long, string, AND struct
    # (kid-style) node ids
    import random

    rng = random.Random(23)
    edges = [(i, i + 1) for i in range(60)]                     # one long chain
    edges += [(1000 + rng.randint(0, 40), 1000 + rng.randint(0, 40)) for _ in range(80)]
    edges += [(2000, 2001), (3000, 3001), (3001, 3002)]
    rng.shuffle(edges)
    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    base = {r["node"]: r["component"]
            for r in connected_components(df, precontract=False).collect()}
    fast = {r["node"]: r["component"]
            for r in connected_components(df, precontract=True).collect()}
    assert base == fast

    sdf = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
    ).repartition(5)
    sb = {r["node"]: r["component"]
          for r in connected_components(sdf, precontract=False).collect()}
    sf_ = {r["node"]: r["component"]
           for r in connected_components(sdf, precontract=True).collect()}
    assert sb == sf_

    # struct node ids (the er_pipeline kid shape) — incl. negative h1/h2
    kdf_ = spark.createDataFrame(
        [((a * 7 - 100, -a), (b * 7 - 100, -b)) for a, b in edges],
        "src struct<h1:long,h2:long>, dst struct<h1:long,h2:long>",
    ).repartition(4)
    kb = {tuple(r["node"]): tuple(r["component"])
          for r in connected_components(kdf_, precontract=False).collect()}
    kf = {tuple(r["node"]): tuple(r["component"])
          for r in connected_components(kdf_, precontract=True).collect()}
    assert kb == kf


def test_driver_finish_budget_tracks_max_result_size(spark):
    # the finisher's collect budget derives from the LIVE
    # spark.driver.maxResultSize so a default-config (1g) session can never
    # be asked to collect a 512MB payload the task-result path won't carry
    from fozzie_spark.cluster import driver_finish_budget

    mrs = int(
        spark.sparkContext._jsc.sc().conf().getSizeAsBytes(
            "spark.driver.maxResultSize", "1g"
        )
    )
    assert driver_finish_budget(spark, cap=1 << 40) == (1 << 40 if mrs <= 0 else mrs // 2)
    assert driver_finish_budget(spark, cap=1024) == 1024
    b = driver_finish_budget(spark, cap=512 << 20)
    assert 0 < b <= 512 << 20


def test_cc_driver_finish_equivalence(spark):
    # the bytes-gated driver finisher must leave component assignments
    # bit-identical to full-rounds convergence for every node-id shape the
    # engine ships: long, string, struct<long,long> (kid), and a struct
    # with a string field (the generic Python-object path)
    import random

    rng = random.Random(41)
    edges = [(i, i + 1) for i in range(80)]                     # long chain
    edges += [(5000 + rng.randint(0, 60), 5000 + rng.randint(0, 60)) for _ in range(120)]
    edges += [(9000, 9001), (9002, 9003), (9003, 9004)]
    rng.shuffle(edges)

    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    base = {r["node"]: r["component"]
            for r in connected_components(df, driver_finish_bytes=0).collect()}
    fin = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert base == fin

    sdf = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
    ).repartition(5)
    assert (
        {r["node"]: r["component"]
         for r in connected_components(sdf, driver_finish_bytes=0).collect()}
        == {r["node"]: r["component"] for r in connected_components(sdf).collect()}
    )

    kdf_ = spark.createDataFrame(
        [((a * 3 - 7000, -a), (b * 3 - 7000, -b)) for a, b in edges],
        "src struct<h1:long,h2:long>, dst struct<h1:long,h2:long>",
    ).repartition(4)
    assert (
        {tuple(r["node"]): tuple(r["component"])
         for r in connected_components(kdf_, driver_finish_bytes=0).collect()}
        == {tuple(r["node"]): tuple(r["component"])
            for r in connected_components(kdf_).collect()}
    )

    gdf = spark.createDataFrame(
        [((f"g{a}", a), (f"g{b}", b)) for a, b in edges],
        "src struct<s:string,x:long>, dst struct<s:string,x:long>",
    ).repartition(3)
    assert (
        {tuple(r["node"]): tuple(r["component"])
         for r in connected_components(gdf, driver_finish_bytes=0).collect()}
        == {tuple(r["node"]): tuple(r["component"])
            for r in connected_components(gdf).collect()}
    )


def test_pipeline_jw_method(spark, tmp_path):
    # jaro/jw route through the provable-regime token-prefix blocking and
    # the Arrow jw scorer; near-dup texts co-cluster, distinct do not
    def doc(i, text):
        return (f"d{i}", [{"kind": "text", "text": text, "media_ref": None, "offset": 0}])

    docs = spark.createDataFrame(
        [
            doc(0, "the quick brown fox jumps over the dog"),
            doc(1, "the quick brown fox jumps over the hog"),
            doc(2, "zzz qqq vvv kkk www yyy xxx jjj uuu"),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = er_pipeline(
        spark, docs, checkpoint_dir=str(tmp_path / "jw"), method="jw",
        max_distance=0.25, prefix_weight=0.0, resume=False,
    )
    ent = {r["doc_id"]: r["entity_id"] for r in out["entities"].collect()}
    assert ent["d0"] == ent["d1"] != ent["d2"]

    # the reference's jw quirk ADDS the prefix term (d' = d + l*p*(1-d),
    # jaro_winkler.rs:66-76): a positive prefix_weight PENALIZES the shared
    # 'the quick...' prefix past tau, so the same pair no longer matches
    out_pw = er_pipeline(
        spark, docs, checkpoint_dir=str(tmp_path / "jwp"), method="jw",
        max_distance=0.25, prefix_weight=0.1, max_prefix=4, resume=False,
    )
    ent_pw = {r["doc_id"]: r["entity_id"] for r in out_pw["entities"].collect()}
    assert len(set(ent_pw.values())) == 3

    # outside the provable regime (s <= 1/3 or negative weight) -> refused
    with pytest.raises(ValueError, match="recall-sound"):
        er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "jw2"),
                    method="jw", max_distance=0.7)
    with pytest.raises(ValueError, match="recall-sound"):
        er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "jw3"),
                    method="jw", max_distance=0.25, prefix_weight=-0.1)


def test_job_entry_reports_f1(spark, tmp_path, capsys):
    # the spark-submit entry (fozzie_spark/job.py) is the artifact the
    # north rule's deployment mode runs; pin that its JSON line carries the
    # pairwise-F1 quality gate alongside throughput, and that the tiny
    # synthetic corpus clears the >= 0.99 bar end-to-end through main()
    from fozzie_spark import job

    rc = job.main([
        "--synth-entities", "300",
        "--checkpoint-dir", str(tmp_path / "job_ckpt"),
        "--no-resume",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["pairwise_f1"] >= 0.99, out
    assert 0.0 <= out["pairwise_precision"] <= 1.0
    assert out["docs"] == out["entities_rows"] > 0
    # opt-out leaves the metric off the line entirely
    rc = job.main([
        "--synth-entities", "300",
        "--checkpoint-dir", str(tmp_path / "job_ckpt2"),
        "--no-resume", "--no-f1",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    assert "pairwise_f1" not in json.loads(line)


def test_pipeline_hot_key_skew(spark, tmp_path):
    # north rule: hot-key skew must be defused, not suffered. The skewed
    # corpus has one 300-doc NEAR-dup entity sharing a boilerplate text
    # (every shared gram df=300, globally hot) and one 150-doc EXACT-dup
    # entity. With the gram-df cap forced below the hot df, the inverted
    # index drops the boilerplate grams entirely and the complementary
    # sorted-neighborhood pass must recover the cluster TRANSITIVELY —
    # O(hot_docs * window) candidates instead of the hot block's
    # quadratic 44 850 — while producing the exact same entity partition
    # the uncapped quadratic run produces.
    from fozzie_spark.synth import synth_documents_skewed

    docs = synth_documents_skewed(spark, 120, hot_docs=300, hot_exact=150).cache()

    def partition_of(out):
        rows = out["entities"].select("doc_id", "entity_id").collect()
        byid = {}
        for r in rows:
            byid.setdefault(r["entity_id"], set()).add(r["doc_id"])
        return {frozenset(v) for v in byid.values()}

    capped = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "cap"),
                         method="jaccard", max_distance=0.45, q=3,
                         max_gram_df=50, resume=False)
    raw_capped = capped["runner"].metric("pairs", "raw_candidates")

    full = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "full"),
                       method="jaccard", max_distance=0.45, q=3,
                       max_gram_df=None, resume=False)
    raw_full = full["runner"].metric("pairs", "raw_candidates")

    # the uncapped run pays the hot block's quadratic candidates; the
    # capped+SN run must stay well under a quarter of that
    assert raw_full >= 300 * 299 / 2, (raw_capped, raw_full)
    assert raw_capped < raw_full / 4, (raw_capped, raw_full)

    # ...and still produce the IDENTICAL entity partition
    p_capped, p_full = partition_of(capped), partition_of(full)
    assert p_capped == p_full

    # hot cluster recovered whole (300 docs, one entity, nothing foreign)
    hot = [g for g in p_capped if any(d.startswith("hot-") for d in g)]
    assert len(hot) == 1 and len(hot[0]) == 300
    assert all(d.startswith("hot-") for d in hot[0])
    # exact dups collapse to one key and one entity
    dup = [g for g in p_capped if any(d.startswith("dup-") for d in g)]
    assert len(dup) == 1 and len(dup[0]) == 150

    # F1 >= 0.99 against ground truth on the capped (sub-quadratic) run
    truth = docs.select("doc_id", F.col("entity_id").alias("t"))
    pred = capped["entities"].select("doc_id", F.col("entity_id").alias("p"))
    m = pairwise_f1(truth.join(pred, "doc_id"), truth_col="t", pred_col="p")
    assert m["f1"] >= 0.99, m
    docs.unpersist()


def test_edge_refine_lossless_vs_bruteforce(spark, tmp_path):
    # the qgram/cosine edges stage prunes candidates with the two-tier
    # signature refine (Bloom popcount + per-bin mass bound) BEFORE exact
    # scoring — a pruned true match would silently drop recall, so pin the
    # edge set (pairs AND distances) against an exhaustive all-pairs
    # rescore with the unit-oracle scorers
    from fozzie_spark.distances import _cosine_dist, _qgram_dist, qgram_profile

    docs = synth_documents(spark, 400).persist()
    for method, tau, fn in (("cosine", 0.25, _cosine_dist), ("qgram", 6.0, _qgram_dist)):
        out = er_pipeline(
            spark, docs, checkpoint_dir=str(tmp_path / f"refine_{method}"),
            method=method, max_distance=tau, q=3, resume=False,
        )
        edges = {
            tuple(sorted([(r["kid"]["h1"], r["kid"]["h2"]),
                          (r["kid2"]["h1"], r["kid2"]["h2"])])): r["dist"]
            for r in out["edges"].collect()
        }
        profs = {
            (r["kid"]["h1"], r["kid"]["h2"]): qgram_profile(r["key"], 3)
            for r in out["keys"].select("key", "kid").distinct().collect()
        }
        kids = sorted(profs)
        brute = {}
        for i in range(len(kids)):
            for j in range(i + 1, len(kids)):
                d = fn(profs[kids[i]], profs[kids[j]])
                if d <= tau:
                    brute[(kids[i], kids[j])] = d
        assert set(edges) == set(brute), method
        assert all(abs(edges[k] - brute[k]) < 1e-12 for k in brute), method
    docs.unpersist()


def test_pipeline_hot_key_skew_cosine(spark, tmp_path):
    # axis-B skew on the COSINE branch — the jaccard skew test's mirror.
    # Kilobyte boilerplate keys defeat BOTH per-pair signature refines
    # (profile size drowns the cmax scaling and the 128 mass bins), so
    # the hot-gram df cap + sorted-neighborhood recovery is the valve
    # here too. Two regimes of the hot boilerplate entity:
    # (a) short tails => hot docs are TRUE near-dups (cos ~0.9): capping
    #     drops every shared gram, so the SN pass must recover the
    #     cluster TRANSITIVELY — with the exact same entity partition the
    #     uncapped quadratic run produces;
    # (b) long tails => boilerplate is worth cos ~0.35 < t, all C(hot,2)
    #     hot pairs are NON-matches: uncapped, the full quadratic pair
    #     stream reaches the scorer (measured: all 7140); capped, it
    #     never gets generated.
    from fozzie_spark.synth import synth_documents_skewed

    def partition_of(out):
        byid = {}
        for r in out["entities"].select("doc_id", "entity_id").collect():
            byid.setdefault(r["entity_id"], set()).add(r["doc_id"])
        return {frozenset(v) for v in byid.values()}

    # (a) matching regime
    docs = synth_documents_skewed(spark, 80, hot_docs=120, hot_exact=60).cache()
    capped = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "cos_a_cap"),
                         method="cosine", max_distance=0.25, q=3,
                         max_gram_df=50, resume=False)
    full = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "cos_a_full"),
                       method="cosine", max_distance=0.25, q=3,
                       max_gram_df=None, resume=False)
    raw_capped = capped["runner"].metric("pairs", "raw_candidates")
    raw_full = full["runner"].metric("pairs", "raw_candidates")
    assert raw_full >= 120 * 119 / 2, (raw_capped, raw_full)
    assert raw_capped < raw_full / 4, (raw_capped, raw_full)
    parts = partition_of(capped)
    assert parts == partition_of(full)
    hot = [g for g in parts if any(d.startswith("hot-") for d in g)]
    assert len(hot) == 1 and len(hot[0]) == 120
    assert all(d.startswith("hot-") for d in hot[0])
    dup = [g for g in parts if any(d.startswith("dup-") for d in g)]
    assert len(dup) == 1 and len(dup[0]) == 60
    truth = docs.select("doc_id", F.col("entity_id").alias("t"))
    pred = capped["entities"].select("doc_id", F.col("entity_id").alias("p"))
    m = pairwise_f1(truth.join(pred, "doc_id"), truth_col="t", pred_col="p")
    assert m["f1"] >= 0.99, m
    docs.unpersist()

    # (b) non-matching regime: long unique tails dilute the boilerplate
    docs_b = synth_documents_skewed(spark, 80, hot_docs=120, hot_exact=0,
                                    tail_words=60).cache()
    cap_b = er_pipeline(spark, docs_b, checkpoint_dir=str(tmp_path / "cos_b_cap"),
                        method="cosine", max_distance=0.25, q=3,
                        max_gram_df=50, resume=False)
    full_b = er_pipeline(spark, docs_b, checkpoint_dir=str(tmp_path / "cos_b_full"),
                         method="cosine", max_distance=0.25, q=3,
                         max_gram_df=None, resume=False)
    # capping may only REMOVE candidates, and the partitions must agree
    # (at this size the 60-word tails share vocab grams, so most candidate
    # volume is legitimate tail overlap rather than boilerplate — the
    # boilerplate-dominated cut is regime (a)'s assertion)
    raw_cap_b = cap_b["runner"].metric("pairs", "raw_candidates")
    raw_full_b = full_b["runner"].metric("pairs", "raw_candidates")
    assert raw_cap_b < raw_full_b, (raw_cap_b, raw_full_b)
    assert partition_of(cap_b) == partition_of(full_b)
    # every hot doc is its own entity (no false merges through boilerplate)
    hot_ids = {r["entity_id"] for r in cap_b["entities"]
               .where(F.col("doc_id").startswith("hot-")).collect()}
    assert len(hot_ids) == 120
    docs_b.unpersist()


def test_edge_refine_adversarial_corpora(spark, tmp_path):
    # randomized adversarial corpora for the qgram/cosine refine: unicode
    # multibyte grams, repeated-single-char keys (cmax >> 1 — the weak
    # spot of the count-scaled popcount floor), sub-q keys (empty
    # profiles), exact duplicates, and near-dups; edges must equal the
    # exhaustive all-pairs rescore for every seed
    import random

    from fozzie_spark.distances import _cosine_dist, _qgram_dist, qgram_profile

    alphabet = "abcé✓ "
    for seed, method, tau in ((1, "cosine", 0.3), (2, "qgram", 4.0)):
        rng = random.Random(seed)
        texts = ["", "a", "ab", "aaaaaaaaaa", "ééééé"]
        for i in range(120):
            base = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
            texts.append(base)
            if rng.random() < 0.4:  # near-dup / exact-dup injection
                texts.append(base + rng.choice(["", "a", "é"]))
        docs = spark.createDataFrame(
            [(f"d{i}", [{"kind": "text", "text": t, "media_ref": None, "offset": 0}])
             for i, t in enumerate(texts)],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        out = er_pipeline(
            spark, docs, checkpoint_dir=str(tmp_path / f"adv_{method}_{seed}"),
            method=method, max_distance=tau, q=3, resume=False,
        )
        edges = {
            tuple(sorted([(r["kid"]["h1"], r["kid"]["h2"]),
                          (r["kid2"]["h1"], r["kid2"]["h2"])])): r["dist"]
            for r in out["edges"].collect()
        }
        profs = {
            (r["kid"]["h1"], r["kid"]["h2"]): qgram_profile(r["key"], 3)
            for r in out["keys"].select("key", "kid").distinct().collect()
        }
        fn = _cosine_dist if method == "cosine" else _qgram_dist
        kids = sorted(profs)
        brute = {}
        for i in range(len(kids)):
            for j in range(i + 1, len(kids)):
                d = fn(profs[kids[i]], profs[kids[j]])
                if d <= tau:
                    brute[(kids[i], kids[j])] = d
        assert set(edges) == set(brute), (method, seed,
                                          len(set(brute) - set(edges)),
                                          len(set(edges) - set(brute)))
        assert all(abs(edges[k] - brute[k]) < 1e-12 for k in brute), (method, seed)


def test_edges_dict_shuffle_join_path(spark, tmp_path, monkeypatch):
    # past the broadcast gate (>5M keys or >256MB dictionary payload) the
    # edges/scoring dictionaries shuffle-join instead of broadcasting;
    # force that plan by neutering F.broadcast inside the pipeline module
    # and pin the output equal to the broadcast-path run
    import fozzie_spark.pipeline as P

    docs = synth_documents(spark, 400).persist()
    base = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "bc"),
                       method="cosine", max_distance=0.25, q=3, resume=False)
    want_edges = sorted(
        ((r["kid"]["h1"], r["kid2"]["h1"]), round(r["dist"], 9))
        for r in base["edges"].collect()
    )
    monkeypatch.setattr(P.F, "broadcast", lambda df: df)
    forced = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "sh"),
                         method="cosine", max_distance=0.25, q=3, resume=False)
    got_edges = sorted(
        ((r["kid"]["h1"], r["kid2"]["h1"]), round(r["dist"], 9))
        for r in forced["edges"].collect()
    )
    assert got_edges == want_edges
    # entity partitions agree
    def parts(out):
        byid = {}
        for r in out["entities"].select("doc_id", "entity_id").collect():
            byid.setdefault(r["entity_id"], set()).add(r["doc_id"])
        return {frozenset(v) for v in byid.values()}
    assert parts(forced) == parts(base)
    docs.unpersist()


def test_input_fingerprint_file_backed_deterministic(spark, tmp_path):
    # file-backed plans must fingerprint identically across separate reads
    # of the same path (the cross-process resume contract) and differently
    # for a different path; generated plans fall back to semanticHash
    from fozzie_spark.pipeline import _input_fingerprint

    docs = synth_documents(spark, 50, seed=7)
    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    docs.write.parquet(pa_)
    docs.write.parquet(pb)
    fa1 = _input_fingerprint(spark.read.parquet(pa_))
    fa2 = _input_fingerprint(spark.read.parquet(pa_))
    fb = _input_fingerprint(spark.read.parquet(pb))
    assert fa1 == fa2
    assert isinstance(fa1, str) and fa1 != fb
    # generated (non-file) plan: semanticHash fallback, stable in-session
    assert _input_fingerprint(docs) == _input_fingerprint(docs)


def test_killed_job_resumes_mid_stage(tmp_path):
    # the north rule verbatim: "a killed job resumes mid-stage". Run the
    # real spark-submit entry in a subprocess, SIGKILL it after the keys
    # stage commits but (long) before the run finishes, then re-run with
    # resume on: the keys manifest must survive untouched (stage reused,
    # not recomputed) and the resumed run must complete with a correct
    # F1 report.
    import signal
    import subprocess
    import sys
    import time

    ck = str(tmp_path / "ck")
    cmd = [
        sys.executable, "-m", "fozzie_spark.job",
        "--synth-entities", "3000", "--checkpoint-dir", ck,
        "--cpus", "8", "--shuffle-partitions", "16",
    ]
    p = subprocess.Popen(cmd, cwd=os.path.dirname(os.path.dirname(__file__)),
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    keys_manifest = os.path.join(ck, "keys.manifest.json")
    entities_manifest = os.path.join(ck, "entities.manifest.json")
    deadline = time.time() + 180
    while time.time() < deadline and not os.path.exists(keys_manifest):
        if p.poll() is not None:
            raise AssertionError("job finished before the kill window opened")
        time.sleep(0.2)
    assert os.path.exists(keys_manifest), "keys stage never committed"
    p.send_signal(signal.SIGKILL)
    p.wait()
    assert not os.path.exists(entities_manifest), "job finished despite kill"

    mtime = os.path.getmtime(keys_manifest)
    out = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert report["pairwise_f1"] >= 0.99, report
    assert os.path.exists(entities_manifest)
    # the committed stage was REUSED by the resumed run, not rewritten
    assert os.path.getmtime(keys_manifest) == mtime


def test_edges_chunked_refine_equivalence(spark, tmp_path, monkeypatch):
    # past the broadcast gate AND past the exchange working-set budget, the
    # cosine/qgram refine runs in sequential pair-hash chunks (bounded
    # disk); the chunk union must be byte-equal to the single-pass run
    import fozzie_spark.pipeline as P

    docs = synth_documents(spark, 400).persist()
    base = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "one"),
                       method="cosine", max_distance=0.25, q=3, resume=False)
    want_edges = sorted(
        ((r["kid"]["h1"], r["kid2"]["h1"]), round(r["dist"], 9))
        for r in base["edges"].collect()
    )
    monkeypatch.setattr(P, "EDGES_DICT_BROADCAST_BYTES", 0)  # force shuffle dicts
    forced = er_pipeline(spark, docs, checkpoint_dir=str(tmp_path / "chunk"),
                         method="cosine", max_distance=0.25, q=3, resume=False,
                         edges_chunk_bytes=8 << 20)  # forces a handful of chunks
    # r7: the chunk staging dir is deleted once the edges stage table
    # commits (it duplicated the edges bytes on exactly the
    # disk-constrained runs the chunking protects)
    assert not os.path.isdir(str(tmp_path / "chunk" / "edges_chunks"))
    got_edges = sorted(
        ((r["kid"]["h1"], r["kid2"]["h1"]), round(r["dist"], 9))
        for r in forced["edges"].collect()
    )
    assert got_edges == want_edges

    def parts(out):
        byid = {}
        for r in out["entities"].select("doc_id", "entity_id").collect():
            byid.setdefault(r["entity_id"], set()).add(r["doc_id"])
        return {frozenset(v) for v in byid.values()}

    assert parts(forced) == parts(base)
    docs.unpersist()
