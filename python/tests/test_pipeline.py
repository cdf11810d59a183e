"""Tests for graft.pipeline — same fixtures as ChunkingSpec/CurationSpec."""

from pyspark.sql import functions as F

from graft.pipeline import chunk, quantile_keep_above, quantile_threshold


def test_chunk_overlap_boundaries(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 11)))], "id long, text string")
    out = [tuple(r) for r in
           chunk(df, "id", "text", 8, 4).orderBy("chunk_idx")
           .select("chunk_idx", "start_token", "chunk_text",
                   "n_chunk_tokens").collect()]
    assert out == [
        (0, 0, "t1 t2 t3 t4 t5 t6 t7 t8", 8),
        (1, 4, "t5 t6 t7 t8 t9 t10", 6),
        (2, 8, "t9 t10", 2),
    ]


def test_chunk_short_docs_single_window(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "x")], "id long, text string")
    got = {r["id"]: r["chunk_text"]
           for r in chunk(df, "id", "text", 8, 0).collect()}
    assert got == {1: "a b c", 2: "x"}


def test_quantile_threshold_and_filter(spark):
    rows = [(i, (i - 1) // 10 + 1) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "id long, score int")
    assert quantile_threshold(df, F.col("score"), 250).head()[0] == 1
    assert quantile_threshold(df, F.col("score"), 500).head()[0] == 2
    kept = {r["id"] for r in quantile_keep_above(df, F.col("score"), 500)
            .select("id").collect()}
    assert kept == set(range(11, 41))


def test_dedupe_within_doc(spark):
    from graft.pipeline import dedupe_within_doc
    df = spark.createDataFrame(
        [(1, "a b c d a b e f"), (2, "x y x y x y")], "id long, text string")
    got = {r["id"]: (r["clean_text"], r["n_segments"], r["n_dropped"])
           for r in dedupe_within_doc(df, "id", "text", 2).collect()}
    assert got == {1: ("a b c d e f", 4, 1), 2: ("x y", 3, 2)}


def test_gopher_metrics_pass_and_fail(spark):
    from graft.pipeline import gopher_metrics
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog in town"),
         (2, "a b")], "id long, text string")
    rows = {r["id"]: r for r in gopher_metrics(df, "id", "text").collect()}
    assert rows[1]["gopher_pass"] is True
    assert rows[2]["gopher_pass"] is False and rows[2]["n_words"] == 2


def test_winnow_pairs_matches_scala_semantics(spark):
    from graft.pipeline import winnow_pairs
    shared = " ".join(f"s{i}" for i in range(1, 13))
    df = spark.createDataFrame(
        [(1, f"{shared} tail one two"), (2, f"head {shared} end"),
         (3, "totally different words here now")], "doc_id long, text string")
    out = winnow_pairs(df, "doc_id", "text", min_shared=2).collect()
    assert any(r["a_id"] == 1 and r["b_id"] == 2 and r["shared"] >= 2
               for r in out)
    assert not any(r["a_id"] == 3 or r["b_id"] == 3 for r in out)


def test_semdedup_keep_drops_planted_pairs(spark):
    from graft.pipeline import semdedup_keep

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select(F.col("vec_id").cast("long").alias("id"),
                   F.col("embedding").cast("array<double>").alias("vec")))
    dupes = emb.where(F.col("id") < 10).select(
        (F.col("id") + 100000).alias("id"), F.col("vec"))
    out = semdedup_keep(emb.union(dupes), "id", "vec", nlist=8, threshold=0.97)
    rows = {r["id"]: (r["cell"], r["csim"], r["keep"]) for r in out.collect()}
    assert len(rows) == emb.count() + 10
    # each planted exact-copy pair loses exactly its higher id (equal
    # csim -> tie to the lower id), nothing else sits at cosine >= 0.97
    dropped = {i for i, (_, _, keep) in rows.items() if not keep}
    assert dropped == {i + 100000 for i in range(10)}, dropped


def test_read_warc_parses_records(spark, tmp_path):
    import gzip

    from graft.pipeline import read_warc

    body = b"hello warc"
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: http://example.test/doc/7\r\n"
           b"WARC-Date: 2024-01-01T00:00:07Z\r\n"
           b"Content-Type: text/plain\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n"
           b"\r\n" + body + b"\r\n\r\n")
    (tmp_path / "t.warc.gz").write_bytes(gzip.compress(rec * 3))
    out = read_warc(spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert all(r["record_type"] == "response" for r in out)
    assert all(r["target_uri"] == "http://example.test/doc/7" for r in out)
    assert all(bytes(r["payload"]) == body for r in out)
    assert all(r["content_length"] == len(body) for r in out)


def test_substring_dedup_matches_scala_semantics(spark):
    from graft.pipeline import substring_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j unique1 tail1"),
         (2, "a b c d e f g h i j unique2 tail2"),
         (3, "short doc nothing here"),
         (4, "z z z z z z z z z z z z z z z z")],
        "doc_id long, text string")
    out = [tuple(r) for r in
           substring_dedup(docs, "doc_id", "text", k=8).orderBy("id").collect()]
    assert out == [
        (1, 12, 1, 10, "unique1 tail1"),
        (2, 12, 1, 10, "unique2 tail2"),
        (3, 4, 0, 0, "short doc nothing here"),
        (4, 16, 1, 16, ""),
    ]


def test_pmi_pairs(spark):
    from graft.pipeline import pmi_pairs

    docs = spark.createDataFrame(
        [(1, "x y bg"), (2, "x y bg rare"), (3, "bg filler"), (4, "bg filler")],
        ["doc_id", "text"])
    out = {(r["a"], r["b"]): r for r in
           pmi_pairs(docs, "doc_id", "text", min_support=2, k=10).collect()}
    assert out[("x", "y")]["lift"] == 2.0 and out[("x", "y")]["rank"] == 1
    assert out[("bg", "x")]["lift"] == 1.0
    assert not any("rare" in p for p in out)


def test_cms_sketch(spark):
    import graft.functions as gf
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 2, 3]], ["k"])
    sk = df.agg(gf.pl_cms_agg(F.col("k"), 4, 64).alias("s"))
    out = (df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
           .crossJoin(F.broadcast(sk))
           .select("k", "exact",
                   gf.pl_cms_estimate(F.col("s"), F.col("k"), 4, 64).alias("est"))
           .collect())
    assert all(r["est"] >= r["exact"] for r in out)
    assert {r["k"]: r["est"] for r in out}[1] == 3


def test_page_rank(spark):
    from graft.pipeline import page_rank

    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], ["s", "d"])
    r = {row["node"]: row["rank"]
         for row in page_rank(e, "s", "d", iterations=2).collect()}
    assert r == {1: 150000, 2: 213750, 3: 702500}


def test_snapshot_diff(spark):
    from graft.pipeline import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta prime"), (4, "delta")], ["doc_id", "text"])
    st = {r["id"]: r["status"] for r in
          snapshot_diff(old, new, "doc_id", "text").collect()}
    assert st == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_diversity_report(spark):
    from graft.pipeline import diversity_report

    df = spark.createDataFrame(
        [("a", "x y x"), ("a", "x y z"), ("b", "q q q q")],
        ["source", "text"])
    r = {row["source"]: row for row in
         diversity_report(df, "source", "text").collect()}
    assert r["a"]["n_tokens"] == 6 and r["a"]["distinct_tokens"] == 3
    assert r["a"]["ttr"] == 0.5
    assert r["b"]["distinct_bigrams"] == 1 and r["b"]["n_bigrams"] == 3


def test_salted_join_matches_plain(spark):
    from graft.pipeline import salted_join
    big = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (3, 30)], "k long, bv int")
    small = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")],
                                  "k long, sv string")
    got = sorted((r.k, r.bv, r.sv)
                 for r in salted_join(big, small, "k", 4).collect())
    want = sorted((r.k, r.bv, r.sv)
                  for r in big.join(small, ["k"]).collect())
    assert got == want


def test_compact_latest(spark):
    from graft.pipeline import compact_latest
    df = spark.createDataFrame(
        [("u1", 1, 1, "a"), ("u1", 3, 2, "c"), ("u1", 2, 3, "b"),
         ("u3", 7, 5, "t"), ("u3", 7, 6, "s")],
        "k string, ver long, uniq long, v string")
    got = sorted((r.k, r.ver, r.v)
                 for r in compact_latest(df, ["k"], ["ver", "uniq"]).collect())
    assert got == [("u1", 3, "c"), ("u3", 7, "s")]


def test_fuzzy_join(spark):
    from graft.pipeline import fuzzy_join
    vocab = spark.createDataFrame([("batch",), ("hash",), ("spark",)],
                                  "tok string")
    noisy = spark.createDataFrame([("bratch",), ("hach",), ("zzz",)],
                                  "q string")
    got = sorted((r.q, r.tok) for r in
                 fuzzy_join(noisy, vocab, "q", "tok").collect())
    assert got == [("bratch", "batch"), ("hach", "hash")]


def test_anomaly_flags(spark):
    from graft.pipeline import anomaly_flags
    df = spark.createDataFrame(
        [("a", 10), ("a", 10), ("a", 10), ("a", 10), ("a", 100)],
        "k string, v long")
    out = {r.v: r.is_anomaly
           for r in anomaly_flags(df, ["k"], "v", 3, 2).collect()}
    assert out == {10: False, 100: True}  # z = 2 > 1.5


def test_profile(spark):
    from graft.pipeline import profile
    df = spark.createDataFrame([(1, "a"), (2, "b"), (2, None), (5, "a")],
                               "id long, tag string")
    got = {r.column: (r.n_rows, r.n_non_null, r.n_distinct,
                      r.min_value, r.max_value)
           for r in profile(df, ["id", "tag"]).collect()}
    assert got == {"id": (4, 4, 3, "1", "5"), "tag": (4, 3, 2, "a", "b")}


def test_bloom_join_matches_plain(spark):
    from graft.pipeline import bloom_join
    big = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (3, 30)], "k long, bv int")
    small = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")],
                                  "k long, sv string")
    got = sorted((r.k, r.bv, r.sv)
                 for r in bloom_join(big, small, "k", 1 << 10, 3).collect())
    want = sorted((r.k, r.bv, r.sv)
                  for r in big.join(small, ["k"]).collect())
    assert got == want and len(got) == 3


def test_edit_distance_pairs(spark):
    from graft.pipeline import edit_distance_pairs
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps"),
         (1, "the quick brown fox jumped"),
         (2, "unrelated prefix entirely")],
        "doc_id long, text string")
    got = sorted((r.id_a, r.id_b, r.dist) for r in
                 edit_distance_pairs(docs, "doc_id", "text",
                                     prefix_len=16, max_dist=5).collect())
    assert got == [(0, 1, 2)]


def test_z_index_and_zorder_write(spark, tmp_path):
    from graft.pipeline import z_index, zorder_write
    import pyspark.sql.functions as F
    got = (spark.createDataFrame([(3, 5)], "a long, b long")
           .select(z_index(F.col("a"), F.col("b")).alias("z"))
           .head().z)
    # 3 = 0b011, 5 = 0b101 -> interleave(a even bits, b odd bits) = 0b100111
    assert got == 0b100111
    df = spark.range(256).select((F.col("id") % 16).alias("a"),
                                 (F.col("id") / 16).cast("long").alias("b"))
    zorder_write(df, "a", "b", str(tmp_path / "z"), files=4)
    assert spark.read.parquet(str(tmp_path / "z")).count() == 256


def test_triangles(spark):
    from graft.pipeline import triangles
    # K4 minus edge (3,4), plus direction/self-loop noise
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (1, 1)],
        "s long, d long")
    got = sorted((r.a, r.b, r.c) for r in triangles(e, "s", "d").collect())
    assert got == [(1, 2, 3), (1, 2, 4)]


def test_segment_lm_filter(spark):
    from graft.pipeline import segment_lm_filter
    prose = "the quick brown fox jumps over the lazy"
    docs = spark.createDataFrame(
        [(1, prose), (2, prose),
         (3, prose + " zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8")],
        "doc_id long, text string")
    got = {r.id: (r.clean_text, r.n_dropped) for r in
           segment_lm_filter(docs, "doc_id", "text").collect()}
    assert got[1] == (prose, 0) and got[2] == (prose, 0)
    assert got[3] == (prose, 1)  # the all-unique gibberish segment drops


def test_band_join(spark):
    from graft.pipeline import band_join
    a = spark.createDataFrame([(1, 10, 100), (1, 11, 300)],
                              "k long, id_a long, v_a long")
    b = spark.createDataFrame([(1, 20, 149), (1, 21, 151), (2, 22, 100)],
                              "k long, id_b long, v_b long")
    got = sorted((r.id_a, r.id_b) for r in
                 band_join(a, b, "k", "v_a", "v_b", 50).collect())
    assert got == [(10, 20)]  # |100-149|<=50; |100-151|>50; key 2 unmatched


def test_priority_sample(spark):
    from graft.pipeline import priority_sample
    items = spark.createDataFrame(
        [(i, 1000 if i < 100 else 10) for i in range(200)], "id long, w long")
    got = priority_sample(items, "id", "w", 20).collect()
    assert len(got) == 20
    assert sum(1 for r in got if r.id < 100) >= 18  # heavy class dominates
    ps = [r.priority for r in got]
    assert ps == sorted(ps) and all(p >= 0 for p in ps)


def test_apply_changelog(spark):
    from graft.pipeline import apply_changelog
    snap = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                 "k long, pay string")
    ch = spark.createDataFrame(
        [(1, "a2", "U", 10, 1), (4, "d", "U", 10, 2), (2, "x", "D", 10, 3)],
        "k long, pay string, op string, ver long, id long")
    got = sorted((r.k, r.pay) for r in
                 apply_changelog(snap, ch, ["k"], ["ver", "id"], "op").collect())
    assert got == [(1, "a2"), (3, "c"), (4, "d")]


def test_hits(spark):
    from graft.pipeline import hits
    e = spark.createDataFrame([(1, 101), (2, 101), (2, 102)], "s long, d long")
    r = {row["node"]: (row["hub"], row["auth"])
         for row in hits(e, "s", "d", iterations=2).collect()}
    assert r == {1: (625000, 0), 2: (1000000, 0),
                 101: (0, 1000000), 102: (0, 600000)}


def test_overlap_join(spark):
    from graft.pipeline import overlap_join
    a = spark.createDataFrame([(1, 10, 0, 5), (1, 11, 20, 30)],
                              "k long, id_a long, s_a long, e_a long")
    b = spark.createDataFrame([(1, 20, 5, 9), (1, 21, 6, 9), (2, 22, 0, 99)],
                              "k long, id_b long, s_b long, e_b long")
    for w in (1, 4, 1000):
        got = sorted((r.id_a, r.id_b) for r in
                     overlap_join(a, b, "k", "s_a", "e_a",
                                  "s_b", "e_b", w).collect())
        assert got == [(10, 20)], f"bucket_width={w}"


def test_dsir_top_k_prefers_target_vocabulary(spark):
    from graft.pipeline import dsir_top_k

    df = spark.createDataFrame(
        [(1, "tgt", "the quick brown fox jumps over the lazy dog"),
         (2, "tgt", "the quick brown fox runs past the lazy dog"),
         (3, "raw", "zzz spam spam click here buy now cheap pills"),
         (4, "raw", "the quick brown fox naps beside the lazy dog")],
        "id long, split string, text string")
    out = dsir_top_k(df, "id", "text", F.col("split") == "tgt",
                     buckets=256, k=4)
    rows = {r["doc_id"]: (r["score_unats"], r["rank"]) for r in out.collect()}
    assert sorted(r[1] for r in rows.values()) == [1, 2, 3, 4]
    # target-vocabulary doc 4 outscores the junk doc 3
    assert rows[4][0] > rows[3][0]
    assert rows[3][0] < 0


def test_longest_prefix_join(spark):
    from graft.pipeline import longest_prefix_join

    ips = spark.createDataFrame(
        [(1, 0xC0A80105), (2, 0x0A000001), (3, 0x08080808)], "id long, ip long")
    rules = spark.createDataFrame(
        [(8, 0xC0, "r8"), (16, 0xC0A8, "r16"), (24, 0xC0A801, "r24"),
         (8, 0x0A, "r10")], "plen int, prefix long, action string")
    out = {r["id"]: (r["matched_len"], r["action"]) for r in
           longest_prefix_join(ips, "ip", "id", rules, "plen", "prefix").collect()}
    assert out[1] == (24, "r24")
    assert out[2] == (8, "r10")
    assert out[3] == (None, None)


def test_wordpiece_stats(spark):
    from graft.pipeline import wordpiece_stats

    docs = spark.createDataFrame(
        [(1, "the cat the cat the"), (2, "the dog"), (3, "")],
        "doc_id long, text string")
    out = {r["id"]: (r["n_words"], r["n_pieces"], r["n_unk"]) for r in
           wordpiece_stats(docs, "doc_id", "text", vocab_size=2).collect()}
    assert out[1] == (5, 5, 0)
    assert out[2] == (2, 4, 0)  # "dog" decomposes to d+o+g single chars
    assert out[3] == (0, 0, 0)


def test_cusum_flags_level_shift(spark):
    from graft.pipeline import cusum

    rows = [(1, t, 25 if 10 <= t < 15 else 15) for t in range(20)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    out = cusum(df, ["k"], "t", "x", ref=15, slack=1, threshold=12) \
        .orderBy("t").collect()
    assert not any(r["is_change"] for r in out[:10])
    assert all(r["is_change"] for r in out[11:15])
    # closed form spot check: S+ after 2 shifted buckets = 2*(25-16) = 18
    assert out[11]["cusum_hi"] == 18


def test_psi_report(spark):
    from graft.pipeline import psi_report

    ref = spark.createDataFrame([(i % 100,) for i in range(1000)], "v long")
    shifted = spark.createDataFrame([(i % 100 + 80,) for i in range(1000)], "v long")
    calm = psi_report(ref, ref, "v").agg(F.sum("psi_unats")).collect()[0][0]
    alarm = psi_report(ref, shifted, "v").agg(F.sum("psi_unats")).collect()[0][0]
    assert calm == 0
    assert alarm > 250000


def test_rrf_fuse(spark):
    from graft.pipeline import rrf_fuse

    a = spark.createDataFrame([(1, 10, 1), (1, 11, 2)],
                              "query_id long, neighbor_id long, rank int")
    b = spark.createDataFrame([(1, 11, 1), (1, 12, 2)],
                              "query_id long, neighbor_id long, rank int")
    out = rrf_fuse([a, b], k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [11, 10, 12]
    assert [r["rrf_unats"] for r in out] == [32522, 16393, 16129]


def test_pl_script_counts(spark):
    from graft.functions import pl_script_counts

    df = spark.createDataFrame(
        [(1, "abc 12 你好 мир"), (2, "")], "id long, text string")
    out = {r["id"]: r["sc"] for r in
           df.select("id", pl_script_counts(F.col("text")).alias("sc")).collect()}
    assert out[1]["latin"] == 3 and out[1]["digit"] == 2
    assert out[1]["cjk"] == 2 and out[1]["cyrillic"] == 3
    assert out[1]["space"] == 3 and out[1]["other"] == 0
    assert out[2]["latin"] == 0 and out[2]["other"] == 0


def test_frequent_pairs(spark):
    from graft.pipeline import frequent_pairs

    df = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C"), (4, "B")],
        "bid long, item string")
    out = {(r["item_a"], r["item_b"]): (r["support"], r["conf_ab_permille"],
                                        r["lift_permille"])
           for r in frequent_pairs(df, "bid", "item", min_support=1).collect()}
    assert out[("A", "B")] == (2, 666, 888)
    assert out[("A", "C")] == (1, 333, 1333)


def test_label_propagation(spark):
    from graft.pipeline import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)],
        "s long, d long")
    out = {r["node"]: r["community"] for r in
           label_propagation(edges, "s", "d", 3).collect()}
    assert out[1] == out[2]
    assert out[11] == out[12]
    assert out[1] != out[11]


def test_path_prefix_join(spark):
    from graft.pipeline import path_prefix_join

    urls = spark.createDataFrame(
        [(1, "/a/b/c"), (2, "/a/x"), (3, "/ab/c")], "id long, path string")
    rules = spark.createDataFrame(
        [("/a", "r-a"), ("/a/b", "r-ab")], "prefix string, action string")
    out = {r["id"]: (r["matched_depth"], r["action"]) for r in
           path_prefix_join(urls, "path", "id", rules, "prefix").collect()}
    assert out[1] == (2, "r-ab")
    assert out[2] == (1, "r-a")
    assert out[3] == (None, None)  # /ab is not under /a


def test_ndcg_k(spark):
    from graft.pipeline import ndcg_k

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int")
    perfect = ndcg_k(truth, truth, 3).collect()[0]
    assert perfect["dcg_unats"] == 4761860 and perfect["ndcg_permille"] == 1000


def test_trend_and_benford(spark):
    from graft.pipeline import benford, trend

    df = spark.createDataFrame([("a", x, 3 * x + 5) for x in range(11)],
                               "k string, x long, y long")
    assert trend(df, ["k"], "x", "y").collect()[0]["slope_micro"] == 3000000
    u = spark.createDataFrame([(v,) for v in range(1, 10000)], "v long")
    rows = {r["digit"]: r for r in benford(u, "v").collect()}
    assert rows[1]["expected_permille"] == 301
    assert rows[1]["deviation_permille"] < -150


def test_hll_overlap(spark):
    from graft.pipeline import hll_overlap

    a = spark.createDataFrame([(k,) for k in range(1, 2001)], "k long")
    b = spark.createDataFrame([(k,) for k in range(1001, 3001)], "k long")
    row = hll_overlap(a, b, "k").collect()[0]
    assert 300 < row["est_intersect"] < 1900  # exact overlap = 1000, m=64


def test_vad_segments(spark):
    from graft.pipeline import vad_segments

    # windows 1-2 and 5 beat the mean (total=16, n=8 -> active iff e*8>16)
    df = spark.createDataFrame(
        [(1, [0, 5, 5, 0, 0, 6, 0, 0])],
        "clip long, en array<long>")
    segs = [(r["start_w"], r["end_w"], r["n_active"], r["seg_energy"])
            for r in vad_segments(df, "clip", "en").orderBy("start_w").collect()]
    assert segs == [(1, 2, 2, 10), (5, 5, 1, 6)]


def test_percentile_report(spark):
    from graft.pipeline import percentile_report

    df = spark.createDataFrame(
        [("a", v) for v in range(1, 101)] + [("b", 7)] * 10, "k string, v long")
    rows = {r["k"]: (r["n"], r["p500"], r["p900"], r["p990"])
            for r in percentile_report(df, ["k"], "v").collect()}
    assert rows["a"] == (100, 50, 90, 99)
    assert rows["b"] == (10, 7, 7, 7)


def test_k_core(spark):
    from graft.pipeline import k_core

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(clique + [(4, 10), (10, 11)], "s long, d long")
    out = {r["node"]: r["degree"]
           for r in k_core(df, "s", "d", k=2, rounds=2).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_anonymity_audit(spark):
    from graft.pipeline import k_anonymity_audit

    rows = [("A", 1, 0)] * 5 + [("A", 1, 1)] + [("B", 2, 0)] * 3
    df = spark.createDataFrame(rows, "seg string, nation int, band long")
    out = {(r["seg"], r["nation"], r["band"]):
           (r["n"], r["n_coarse"], r["is_risky"], r["coarse_ok"])
           for r in k_anonymity_audit(df, ["seg", "nation", "band"], 5).collect()}
    assert out[("A", 1, 0)] == (5, 6, False, True)
    assert out[("A", 1, 1)] == (1, 6, True, True)
    assert out[("B", 2, 0)] == (3, 3, True, False)


def test_calibrate_scores(spark):
    from graft.pipeline import calibrate_scores

    df = spark.createDataFrame(
        [("s1", 1, 10), ("s1", 2, 20), ("s1", 3, 20), ("s1", 4, 30),
         ("s2", 5, 99)], "src string, id long, score long")
    out = {r["id"]: r["calib_permille"]
           for r in calibrate_scores(df, "src", "score").collect()}
    assert out == {1: 0, 2: 250, 3: 250, 4: 750, 5: 0}


def test_token_entropy(spark):
    import math
    from graft.pipeline import token_entropy

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x x x x")], "id long, t string")
    out = {r["id"]: (r["n_tokens"], r["n_unique"], r["entropy_unats"])
           for r in token_entropy(df, "id", "t").collect()}
    assert out[1] == (4, 4, 4 * round(1e6 * 0.25 * math.log(4.0)))
    assert out[2] == (4, 1, 0)


def test_conservation_audit(spark):
    from graft.pipeline import conservation_audit

    parent = spark.createDataFrame([(1, 100), (2, 50), (3, 70)], "k long, v long")
    child = spark.createDataFrame([(1, 60), (1, 40), (2, 49)], "ck long, cv long")
    out = {r["k"]: (r["parent_val"], r["child_sum"], r["n_children"], r["diff"])
           for r in conservation_audit(parent, "k", "v", child, "ck", "cv").collect()}
    assert out[1] == (100, 100, 2, 0)
    assert out[2] == (50, 49, 1, 1)
    assert out[3] == (70, 0, 0, 70)


def test_winsorize(spark):
    from graft.pipeline import winsorize

    df = spark.createDataFrame(
        [("a", v, v) for v in range(1, 101)], "k string, id long, v long")
    out = {r["id"]: r["v_w"]
           for r in winsorize(df, ["k"], "v", 100, 900).collect()}
    assert out[1] == 10 and out[50] == 50 and out[100] == 90


def test_robust_anomaly_flags(spark):
    from graft.pipeline import robust_anomaly_flags

    rows = [("a", i, 10) for i in range(1, 100)] + [("a", 100, 1000)]
    df = spark.createDataFrame(rows, "k string, id long, v long")
    out = [r["id"] for r in robust_anomaly_flags(df, ["k"], "v")
           .where("is_anomaly").collect()]
    assert out == [100]


def test_jaccard_prefix_pairs(spark):
    from graft.pipeline import jaccard_prefix_pairs

    base = " ".join(f"w{i % 7} x{i} y{i + 1}" for i in range(1, 31))
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail1"),
         (3, " ".join(f"q{i}" for i in range(100, 140)))],
        "id long, text string")
    out = jaccard_prefix_pairs(docs, "id", "text", 800).collect()
    assert len(out) == 1
    assert (out[0]["a_id"], out[0]["b_id"]) == (1, 2)
    assert out[0]["jaccard_permille"] >= 800


def test_gap_regularity(spark):
    from graft.pipeline import gap_regularity

    rows = ([("bot", i * 10_000_000) for i in range(10)]
            + [("fastbot", i * 1_000) for i in range(10)]
            + [("new", i * 10_000_000) for i in range(5)])
    acc = 0
    for g in [1, 1, 1, 1, 100, 1, 1, 1, 100]:
        rows.append(("human", acc))
        acc += g * 1_000_000
    rows.append(("human", acc))
    df = spark.createDataFrame(rows, ["k", "ts"])
    out = {r["k"]: r["is_robotic"]
           for r in gap_regularity(df, ["k"], "ts").collect()}
    assert out == {"bot": True, "fastbot": True, "human": False,
                   "new": False}


def test_l_diversity(spark):
    from graft.pipeline import l_diversity

    rows = [("A", 1, 0)] * 6 + [("B", 2, 0), ("B", 2, 1), ("B", 2, 2)]
    df = spark.createDataFrame(rows, ["seg", "nation", "band"])
    out = {(r["seg"], r["nation"]): (r["n"], r["l_distinct"], r["is_risky"])
           for r in l_diversity(df, ["seg", "nation"], "band", 3).collect()}
    assert out[("A", 1)] == (6, 1, True)
    assert out[("B", 2)] == (3, 3, False)


def test_collocations(spark):
    import math

    from graft.pipeline import collocations

    docs = ["new york is red and blue is big"] * 6 + [
        "red q blue w red e blue r", "solo"]
    df = spark.createDataFrame([(d,) for d in docs], ["text"])
    out = {(r["a"], r["b"]): (r["c_ab"], r["pmi_unats"])
           for r in collocations(df, "text", min_count=2).collect()}
    n_uni = 6 * 8 + 8 + 1
    n_bi = 6 * 7 + 7
    expected = round(1e6 * (math.log(6) + 2.0 * math.log(n_uni)
                            - math.log(n_bi) - 2 * math.log(6)))
    assert out[("new", "york")] == (6, expected)
    assert ("red", "blue") not in out


def test_window_cooccur_counts(spark):
    from graft.pipeline import window_cooccur
    df = spark.createDataFrame([("a b a b",), ("a b",)], "text string")
    got = {(r["a"], r["b"]): r["cnt"]
           for r in window_cooccur(df, "text", window=2, min_count=1).collect()}
    # doc1 d=1: (a,b) (a,b) (a,b); d=2: (a,a) (b,b); doc2 d=1: (a,b)
    assert got == {("a", "b"): 4, ("a", "a"): 1, ("b", "b"): 1}


def test_cohen_kappa_integer_clearing(spark):
    from graft.pipeline import cohen_kappa
    rows = [("a", "a")] * 3 + [("b", "b")] + [("a", "b")]
    df = spark.createDataFrame(rows, "gold string, guess string")
    r = cohen_kappa(df, "gold", "guess").collect()[0]
    # n=5, agree=4, marginals gold(a=4,b=1) guess(a=3,b=2) -> pe=14
    assert (r["n"], r["agree"], r["pe_num"]) == (5, 4, 14)
    assert (r["kappa_num"], r["kappa_den"]) == (6, 11)
    assert r["kappa_permille"] == 545  # 6000 div 11, truncating


def test_shard_balance_even_split_and_id_guard(spark):
    from graft.pipeline import shard_balance
    df = spark.range(4096).withColumn("w", F.lit(1))
    out = shard_balance(df, "id", "w", shards=4).collect()
    assert len(out) == 4
    assert sum(r["n_rows"] for r in out) == 4096
    assert all(abs(r["dev_permille"]) < 200 for r in out)
    try:
        shard_balance(df.withColumn("sid", F.col("id").cast("string")),
                      "sid", "w", shards=4)
        assert False, "string id must be rejected"
    except ValueError:
        pass


def test_containment_prefix_pairs_subset_detection(spark):
    from graft.pipeline import containment_prefix_pairs
    small = "w1 w2 w3 w4 w5"
    big = small + " x1 x2 x3 x4 x5 x6 x7"
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "z1 z2 z3 z4")], "doc_id long, text string")
    got = {(r["a_id"], r["b_id"]): r["containment_permille"]
           for r in containment_prefix_pairs(df, "doc_id", "text", 800)
           .collect()}
    # doc1's 3 shingles all inside doc2 -> (1,2) at 1000; never (2,1):
    # doc2 has 10 shingles, only 3 shared -> 300 < 800
    assert got == {(1, 2): 1000}


def test_fleiss_kappa_hand_case_and_incomplete_drop(spark):
    from graft.pipeline import fleiss_kappa
    rows = [(1, "A"), (1, "A"), (1, "A"),
            (2, "A"), (2, "A"), (2, "B"),
            (3, "B"), (3, "B"), (3, "B"),
            (4, "A"), (4, "B"), (4, "B"),
            (9, "A"), (9, "A")]  # incomplete item drops
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat", raters=3).collect()[0]
    # N=4 r=3 S=28 C=72 -> num=48 den=144 -> 333 permille
    assert (r["n_items"], r["s_sq"], r["c_sq"]) == (4, 28, 72)
    assert (r["kappa_num"], r["kappa_den"]) == (48, 144)
    assert r["kappa_permille"] == 333
    # degenerate single-category corpus -> NULL
    one = spark.createDataFrame([(1, "A"), (1, "A")], "item long, cat string")
    assert fleiss_kappa(one, "item", "cat", 2).collect()[0][
        "kappa_permille"] is None


def test_rouge_n_clipped_overlap(spark):
    from graft.pipeline import rouge_n
    df = spark.createDataFrame(
        [(1, "a b c a b", "a b c"), (2, "a b c", "a")],
        "id long, cand string, ref string")
    out = {r["id"]: r for r in rouge_n(df, "id", "cand", "ref", n=2).collect()}
    # clipped: min(2,1)[a b] + min(1,1)[b c] = 2 of cand 4 / ref 2
    assert (out[1]["cand_n"], out[1]["ref_n"], out[1]["match_n"]) == (4, 2, 2)
    assert (out[1]["rouge_p"], out[1]["rouge_r"], out[1]["rouge_f"]) == (
        500, 1000, 666)
    # sub-2-token ref: strict windows -> recall NULL, precision 0
    assert out[2]["ref_n"] == 0 and out[2]["rouge_r"] is None
    assert out[2]["rouge_p"] == 0


def test_adamic_adar_path_and_cap(spark):
    import math
    from graft.pipeline import adamic_adar
    path = spark.createDataFrame([(1, 2), (2, 3)], "s long, d long")
    rows = adamic_adar(path, "s", "d").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["u"], r["v"], r["common"]) == (1, 3, 1)
    assert r["aa_unats"] == round(1e6 / math.log(2.0))
    # triangle: all candidate pairs already edges -> empty
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "s long, d long")
    assert adamic_adar(tri, "s", "d").count() == 0
    # hub cap excludes the star center
    star = spark.createDataFrame([(1, l) for l in range(2, 7)],
                                 "s long, d long")
    assert adamic_adar(star, "s", "d", max_degree=4).count() == 0
    assert adamic_adar(star, "s", "d", max_degree=5).count() == 10


def test_co_membership_cap_and_prune(spark):
    from graft.pipeline import co_membership
    rows = [(1, "x"), (1, "y"), (1, "z"),
            (2, "x"), (2, "y"), (2, "y"),
            (3, "x"), (3, "y"), (3, "z"), (3, "w")]
    df = spark.createDataFrame(rows, "u long, i string")
    got = {(r["a"], r["b"]): r["n_users"]
           for r in co_membership(df, "u", "i", max_items=3,
                                  min_users=1).collect()}
    assert got == {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 1}
    pruned = co_membership(df, "u", "i", max_items=3, min_users=2).collect()
    assert [(r["a"], r["b"]) for r in pruned] == [("x", "y")]


def test_krippendorff_alpha_variable_panels(spark):
    from graft.pipeline import krippendorff_alpha
    rows = [(1, "A"), (1, "A"), (2, "A"), (2, "B"),
            (3, "B"), (3, "B"), (3, "B"), (9, "C")]  # 9 unpairable
    df = spark.createDataFrame(rows, "item long, cat string")
    r = krippendorff_alpha(df, "item", "cat").collect()[0]
    # n=7 C=25 d_o=2e6 -> num 12e6 / den 24e6 -> 500 permille
    assert (r["n_ratings"], r["n_items"]) == (7, 3)
    assert (r["d_o_micro"], r["c_sq"]) == (2000000, 25)
    assert r["alpha_permille"] == 500
    # perfect agreement with mixed panel sizes
    p = spark.createDataFrame([(1, "A"), (1, "A"), (2, "B"), (2, "B"),
                               (2, "B")], "item long, cat string")
    assert krippendorff_alpha(p, "item", "cat").collect()[0][
        "alpha_permille"] == 1000


def test_cosine_sim_join_identity_and_cap(spark):
    from graft.pipeline import cosine_sim_join
    df = spark.createDataFrame([(1, "x y"), (2, "x z"), (3, "x y")],
                               "id long, text string")
    rows = cosine_sim_join(df, "id", "text", 500).collect()
    # x has df=N -> idf 0 -> drops; A~C identical on the weighted view
    assert len(rows) == 1
    assert (rows[0]["a"], rows[0]["b"], rows[0]["cos2_ppm"]) == (1, 3, 1000000)
    assert cosine_sim_join(df, "id", "text", 500, df_cap=1).count() == 0


def test_blocklist_hits_overlapping(spark):
    from graft.pipeline import blocklist_hits
    df = spark.createDataFrame([(1, "banana bandana"), (2, "pure prose")],
                               "id long, text string")
    got = {(r["id"], r["pattern"]): r["n_hits"]
           for r in blocklist_hits(df, "id", "text",
                                   ["an", "ana", "na", "band"]).collect()}
    assert got == {(1, "an"): 4, (1, "ana"): 3, (1, "na"): 3, (1, "band"): 1}


def test_t_closeness_hand_emd(spark):
    from graft.pipeline import t_closeness
    rows = [("a", 1, 0), ("a", 1, 0), ("a", 1, 0),
            ("b", 1, 1), ("b", 1, 1),
            ("c", 1, 0), ("c", 1, 1)]
    df = spark.createDataFrame(rows, "seg string, nat long, band long")
    got = {r["seg"]: (r["n"], r["emd_permille"], r["is_risky"])
           for r in t_closeness(df, ["seg", "nat"], "band", 300).collect()}
    assert got == {"a": (3, 428, True), "b": (2, 571, True),
                   "c": (2, 71, False)}


def test_flesch_readability_hand(spark):
    from graft.pipeline import flesch_readability
    df = spark.createDataFrame([(1, "the cat sat\non a mat"), (2, "")],
                               "id long, text string")
    got = {r["id"]: r for r in flesch_readability(df, "id", "text").collect()}
    assert (got[1]["n_sentences"], got[1]["n_words"],
            got[1]["n_syllables"]) == (2, 6, 6)
    assert got[1]["flesch_milli"] == 119190
    assert got[2]["flesch_milli"] is None


def test_bpe_learn_greedy_rounds(spark):
    from graft.pipeline import bpe_learn
    df = spark.createDataFrame([("abab ab",), ("aaa",)], "text string")
    got = sorted((r["round"], r["pair"], r["merged"], r["cnt"])
                 for r in bpe_learn(df, "text", 3).collect())
    assert got == [(1, "a b", "ab", 3), (2, "a a", "aa", 2),
                   (3, "aa a", "aaa", 1)]


def test_hard_negatives_with_cells(spark):
    from graft.pipeline import hard_negatives_with_cells
    rows = [(1, [1.0, 0.0], 0, 0), (2, [0.99, 0.1], 0, 0),
            (3, [0.98, 0.05], 1, 0), (10, [0.0, 1.0], 1, 1)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int, cell int")
    got = {r["query_id"]: r for r in hard_negatives_with_cells(
        df, "vec_id", "embedding", "label", "cell").collect()}
    assert got[1]["pos_id"] == 2 and got[1]["neg_id"] == 3
    assert got[3]["pos_id"] is None and got[3]["neg_id"] is not None
    assert 10 not in got  # alone in its cell -> no pairs -> absent


def test_ngram_novelty(spark):
    from graft.pipeline import ngram_novelty
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "a b c d")],
        "doc_id long, text string")
    got = {r["id"]: (r["n_grams"], r["n_novel"], r["novelty_permille"])
           for r in ngram_novelty(df, "doc_id", "text", 3).collect()}
    assert got == {1: (2, 2, 1000), 2: (2, 1, 500), 3: (2, 0, 0)}


def test_zipf_fit_matches_formula(spark):
    import math
    from graft.pipeline import zipf_fit
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(text,)], "text string")
    row = zipf_fit(df, "text").collect()[0]
    xs = [round(1e6 * math.log(r)) for r in (1, 2, 3, 4)]
    ys = [round(1e6 * math.log(c)) for c in (8, 4, 2, 1)]
    n, sx, sy = 4, sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
    # python // floors; the operator truncates — equal here (negative
    # exact-divide cases don't arise with these moments)
    assert row["n_terms"] == 4
    assert abs(row["slope_micro"] - slope) <= 1
    assert row["slope_micro"] < 0


def test_burst_segments_islands(spark):
    from graft.temporal import burst_segments
    rows = [("A", 1, 10), ("A", 2, 12), ("A", 3, 11), ("A", 4, 3),
            ("A", 5, 15), ("A", 8, 10), ("A", 9, 10), ("B", 1, 5)]
    df = spark.createDataFrame(rows, "k string, day long, cnt long")
    got = {(r["k"], r["seg_start"]): (r["n_buckets"], r["total_cnt"])
           for r in burst_segments(df, "k", "day", "cnt", 10, 2).collect()}
    assert got == {("A", 1): (3, 33), ("A", 8): (2, 20)}


def test_chi_square_2x2_hand(spark):
    import math
    from graft.pipeline import chi_square_2x2
    rows = ([("k", False, True)] * 20 + [("k", False, False)] * 30 +
            [("k", True, True)] * 35 + [("k", True, False)] * 15)
    df = spark.createDataFrame(rows, "k string, grp boolean, succ boolean")
    r = chi_square_2x2(df, ["k"], "grp", "succ").collect()[0]
    exp = round(1e6 * 100.0 * (20.0 * 15 - 30 * 35) ** 2
                / (50.0 * 50 * 55 * 45))
    assert (r["a"], r["b"], r["c"], r["d"]) == (20, 30, 35, 15)
    assert r["chi2_micro"] == exp and r["significant_95"]


def test_ks_statistic_hand(spark):
    from graft.pipeline import ks_statistic
    ref = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "v long")
    cur = spark.createDataFrame([(v,) for v in (3, 4, 5, 6)], "v long")
    r = ks_statistic(ref, cur, "v").collect()[0]
    assert (r["n_ref"], r["n_cur"], r["d_ppm"], r["at_value"]) \
        == (4, 4, 500000, 2)


def test_mrr_k_first_hit(spark):
    from graft.pipeline import mrr_k
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (3, 30, 1)],
        "query_id long, neighbor_id long, rank int")
    truth = spark.createDataFrame([(1, 11), (2, 20), (3, 99)],
                                  "query_id long, neighbor_id long")
    got = {r["query_id"]: (r["first_rel_rank"], r["rr_ppm"])
           for r in mrr_k(results, truth, 3).collect()}
    assert got == {1: (2, 500000), 2: (1, 1000000), 3: (None, 0)}


def test_bpe_apply_merges_python_parity(spark):
    # the Scala operator has no direct python twin; replay its contract
    # through the registered replace chain to pin the delimiter identity
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1, "abab ab")], "id long, text string")
    d = "¦"
    w = F.transform(
        F.filter(F.split("text", " "), lambda t: t != ""),
        lambda tok: F.concat(F.lit(d + d),
                             F.regexp_replace(tok, "(?s)(.)", "$1" + d + d)))
    merged = F.transform(w, lambda x: F.replace(
        x, F.lit(d + "a" + d + d + "b" + d), F.lit(d + "ab" + d)))
    units = F.flatten(F.transform(merged, lambda x: F.filter(
        F.split(x, d + "+"), lambda u: u != "")))
    row = df.select(F.concat_ws(" ", units).alias("s")).collect()[0]
    assert row["s"] == "ab ab ab"


def test_bm25_hand_corpus(spark):
    import math
    from graft.pipeline import bm25
    docs = spark.createDataFrame(
        [(1, "cat dog cat fish"), (2, "cat bird tree"), (3, "fish bird tree")],
        "id long, text string")
    got = {r["id"]: (r["n_hit"], r["score_micro"], r["rank"])
           for r in bm25(docs, "id", "text", ["cat", "dog"], 1200, 750, 3)
           .collect()}
    k1, b, avgdl = 1200 / 1000.0, 750 / 1000.0, 10.0 / 3

    def term(tf, df, dl):
        idf = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
        return round(1e6 * idf * (tf * (k1 + 1.0)) /
                     (tf + k1 * (1.0 - b + b * (dl / avgdl))))

    assert got[1] == (2, term(2, 2, 4) + term(1, 1, 4), 1)
    assert got[2] == (1, term(1, 2, 3), 2)
    assert 3 not in got


def test_token_label_mi_perfect_and_independent(spark):
    import math
    from graft.pipeline import token_label_mi
    df = spark.createDataFrame(
        [(1, "xx cc hh", "a"), (2, "xx cc", "a"),
         (3, "cc hh", "b"), (4, "cc yy", "b")],
        "id long, text string, lab string")
    got = {r["term"]: (r["n_docs_with"], r["mi_unats"], r["rank"])
           for r in token_label_mi(df, "id", "text", "lab", 10).collect()}
    assert got["xx"][1] == 2 * round(1e6 * 0.5 * math.log(2.0))
    assert got["xx"][2] == 1
    assert got["cc"] == (4, 0, got["cc"][2])
    assert got["hh"][1] == 0


def test_poisson_bootstrap_deterministic(spark):
    from graft.pipeline import poisson_bootstrap
    df = spark.range(2000).select(
        F.col("id"), F.lit(7).cast("long").alias("v"))
    a = sorted(poisson_bootstrap(df, "id", "v", reps=4).collect())
    b = sorted(poisson_bootstrap(df, "id", "v", reps=4).collect())
    assert a == b and len(a) == 4
    for r in a:
        assert r["mean"] == 7.0
        assert r["sum_w"] == 7 * r["n_eff"]
        assert abs(r["n_eff"] - 2000) < 4 * 2000 ** 0.5


def test_token_kl_shifted_token(spark):
    import math
    from graft.pipeline import token_kl
    p = spark.createDataFrame([("aa bb",), ("aa cc",)], "text string")
    q = spark.createDataFrame([("bb cc",), ("bb dd",)], "text string")
    rows = token_kl(p, q, "text", 10).collect()
    top = min(rows, key=lambda r: r["rank"])
    assert (top["term"], top["p_cnt"], top["q_cnt"]) == ("aa", 2, 0)
    assert top["kl_unats"] == round(
        1e6 * (3.0 / 8) * math.log((3.0 / 8) / (1.0 / 8)))
    flat = token_kl(p, p, "text", 10).collect()
    assert all(r["kl_unats"] == 0 for r in flat)


def test_source_overlap_jaccard(spark):
    from graft.pipeline import source_overlap
    df = spark.createDataFrame(
        [("s1", "one"), ("s1", "two"), ("s1", "three"),
         ("s2", "two"), ("s2", "three"), ("s2", "four"),
         ("s3", "nine")],
        "src string, text string")
    got = {(r["src_a"], r["src_b"]): (r["n_a"], r["n_b"], r["inter"],
                                      r["jaccard_ppm"])
           for r in source_overlap(df, "src", "text").collect()}
    # s1 n=3, s2 n=3, inter=2, union=4 -> 500000 ppm; s3 overlaps nothing
    assert got == {("s1", "s2"): (3, 3, 2, 500000)}


def test_simpson_reversal_textbook(spark):
    from graft.pipeline import simpson_reversals
    rows = ([("X", True, True)] * 81 + [("X", True, False)] * 6 +
            [("X", False, True)] * 234 + [("X", False, False)] * 36 +
            [("Y", True, True)] * 192 + [("Y", True, False)] * 71 +
            [("Y", False, True)] * 55 + [("Y", False, False)] * 25)
    df = spark.createDataFrame(rows, "st string, g boolean, s boolean")
    got = {r["stratum"]: (r["stratum_sign"], r["pooled_sign"], r["reverses"])
           for r in simpson_reversals(df, "st", "g", "s").collect()}
    assert got == {"X": (1, -1, True), "Y": (1, -1, True)}


def test_gini_concentration(spark):
    from graft.pipeline import gini_concentration
    even = spark.createDataFrame([("a",), ("a",), ("b",), ("b",)], "k string")
    r = gini_concentration(even, "k").collect()[0]
    assert (r["n_keys"], r["total"], r["gini_ppm"]) == (2, 4, 0)
    skew = spark.createDataFrame([("z",)] * 8 + [("x",), ("y",)], "k string")
    assert gini_concentration(skew, "k").collect()[0]["gini_ppm"] \
        == 14 * 1000000 // 30


def test_cmh_hand(spark):
    from graft.pipeline import cmh_test
    rows = ([("X", True, True)] * 20 + [("X", True, False)] * 30 +
            [("X", False, True)] * 35 + [("X", False, False)] * 15)
    df = spark.createDataFrame(rows, "st string, g boolean, s boolean")
    r = cmh_test(df, "st", "g", "s").collect()[0]
    num = round(1e6 * (20 - 50.0 * 55 / 100))
    den = round(1e6 * (50.0 * 50 * 55 * 45) / (100.0 * 100 * 99))
    assert (r["num_micro"], r["den_micro"]) == (num, den)
    assert r["chi2_micro"] == round(float(num) * num / den)


def test_ewma_smooth_exact(spark):
    from graft.pipeline import ewma_smooth
    df = spark.createDataFrame(
        [("k", 1, 10), ("k", 2, 20), ("k", 3, 40)],
        "key string, ord long, v long")
    got = {r["ord"]: r["ewma_milli"]
           for r in ewma_smooth(df, "key", "ord", "v", lags=3).collect()}
    assert got == {1: 10000, 2: 100000 // 6, 3: 30000}


def test_rbo_topk_hand(spark):
    from graft.pipeline import rbo_topk
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3)],
        "query_id long, neighbor_id long, rank int")
    b = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 21, 1), (2, 20, 2), (2, 22, 3)],
        "query_id long, neighbor_id long, rank int")
    got = {r["query_id"]: (r["n_common"], r["rbo_ppm"])
           for r in rbo_topk(a, b, 3).collect()}
    assert got == {1: (3, 875000), 2: (3, 375000)}


def test_neyman_sample_allocation(spark):
    from graft.pipeline import neyman_sample
    rows = ([(i, "hi", 1000 if i % 2 == 0 else 0) for i in range(1, 101)] +
            [(i, "lo", 500) for i in range(101, 201)])
    df = spark.createDataFrame(rows, "doc_id long, src string, v long")
    out = neyman_sample(df, "doc_id", "src", "v", 30)
    by_src = {r["src"]: r["count"]
              for r in out.groupBy("src").count().collect()}
    # w_hi = 50000, w_lo = 0 -> alloc_hi = 30, lo dropped
    assert by_src == {"hi": 30}


def test_quantile_normalize_pooled_scale(spark):
    from graft.pipeline import quantile_normalize
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "a", 40),
            (5, "b", 1000), (6, "b", 2000), (7, "b", 3000), (8, "b", 4000)]
    df = spark.createDataFrame(rows, "id long, g string, s long")
    got = {r["id"]: (r["src_permille"], r["norm_score"])
           for r in quantile_normalize(df, "g", "s").collect()}
    assert got[1] == (250, 20) and got[5] == (250, 20)
    assert got[4] == (1000, 4000) and got[8] == (1000, 4000)
    assert got[2][1] == got[6][1] and got[3][1] == got[7][1]


def test_effective_sample_size(spark):
    from graft.pipeline import effective_sample_size
    flat = spark.createDataFrame([(5,)] * 10, "w long")
    r = effective_sample_size(flat, "w").collect()[0]
    assert (r["n"], r["ess_milli"]) == (10, 10000)
    skew = spark.createDataFrame([(1,)] * 9 + [(1000,)], "w long")
    s = effective_sample_size(skew, "w").collect()[0]
    assert s["ess_milli"] == round(1000.0 * (1009.0 * 1009 / 1000009))


def test_spearman_corr(spark):
    from graft.pipeline import spearman_corr
    mono = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 40), (4, 45)], "x long, y long")
    assert spearman_corr(mono, "x", "y").collect()[0]["rho_micro"] == 1000000
    rev = spark.createDataFrame(
        [(1, 9), (2, 7), (3, 5), (4, 2)], "x long, y long")
    assert spearman_corr(rev, "x", "y").collect()[0]["rho_micro"] == -1000000


def test_token_jsd(spark):
    import math
    from graft.pipeline import token_jsd
    p = spark.createDataFrame([("aa bb",), ("aa cc",)], "text string")
    q = spark.createDataFrame([("bb cc",), ("bb dd",)], "text string")
    assert token_jsd(p, p, "text").collect()[0]["jsd_unats"] == 0

    def term(pv, qv):
        m = (pv + qv) / 2
        return round(1e6 * (0.5 * pv * math.log(pv / m) +
                            0.5 * qv * math.log(qv / m)))

    hand = (term(3 / 8, 1 / 8) + term(2 / 8, 3 / 8) +
            term(2 / 8, 2 / 8) + term(1 / 8, 2 / 8))
    assert token_jsd(p, q, "text").collect()[0]["jsd_unats"] == hand


def test_mann_whitney_u_hand(spark):
    from graft.pipeline import mann_whitney_u
    import math
    df = spark.createDataFrame(
        [("k", True, 1), ("k", True, 2), ("k", False, 3), ("k", False, 4)],
        "k string, g boolean, v long")
    r = mann_whitney_u(df, ["k"], "g", "v").collect()[0]
    assert (r["n_a"], r["n_b"], r["u2_a"]) == (2, 2, 0)
    assert r["z_micro"] == round(1e6 * -4 * math.sqrt(36.0) /
                                 math.sqrt(240.0))
    tie = spark.createDataFrame(
        [("k", True, 1), ("k", True, 1), ("k", False, 1), ("k", False, 2)],
        "k string, g boolean, v long")
    rt = mann_whitney_u(tie, ["k"], "g", "v").collect()[0]
    assert rt["u2_a"] == 2 and rt["z_micro"] == -1000000


def test_bh_fdr_stepup(spark):
    from graft.pipeline import bh_fdr
    df = spark.createDataFrame(
        [("t1", 1000), ("t2", 9000), ("t3", 20000), ("t4", 30000),
         ("t5", 500000), ("t6", 900000)], "id string, p long")
    out = bh_fdr(df, ["id"], "p").orderBy("rank").collect()
    assert [r["reject"] for r in out] == [True] * 4 + [False] * 2
    assert all(r["k_star"] == 4 and r["m_tests"] == 6 for r in out)
    # max_tests guard: at the cap passes, over fails loudly
    assert bh_fdr(df, ["id"], "p", max_tests=6).count() == 6
    import pytest
    with pytest.raises(Exception, match="bh_fdr"):
        bh_fdr(df, ["id"], "p", max_tests=5).collect()


def test_cuped_theta_and_adjustment(spark):
    from graft.pipeline import cuped
    df = spark.createDataFrame(
        [("e", 0, 10, 20), ("e", 0, 20, 40), ("e", 1, 30, 60),
         ("e", 1, 40, 80)], "k string, var int, x long, y long")
    out = cuped(df, ["k"], "var", "x", "y").orderBy("variant").collect()
    assert (out[0]["mean_adj_micro"], out[1]["mean_adj_micro"]) == \
        (50000000, 50000000)
    assert out[0]["theta_micro"] == 2000000
    assert out[0]["var_reduction_ppm"] == 1000000


def test_kendall_tau_hand(spark):
    from graft.pipeline import kendall_tau
    import math
    up = spark.createDataFrame([("k", 1, 1), ("k", 2, 2), ("k", 3, 3)],
                               "k string, x long, y long")
    u = kendall_tau(up, ["k"], "x", "y").collect()[0]
    assert (u["nc"], u["nd"], u["tau_b_micro"]) == (3, 0, 1000000)
    tie = spark.createDataFrame([("k", 1, 1), ("k", 1, 2), ("k", 2, 3)],
                                "k string, x long, y long")
    tb = kendall_tau(tie, ["k"], "x", "y").collect()[0]
    assert tb["tau_b_micro"] == round(2e6 * 2 / math.sqrt(4.0) /
                                      math.sqrt(6.0))


def test_kaplan_meier_walk_and_extinction(spark):
    from graft.pipeline import kaplan_meier
    import math
    df = spark.createDataFrame(
        [("k", 1, True), ("k", 2, True), ("k", 3, False), ("k", 4, True),
         ("k", 5, False)], "k string, d long, e boolean")
    out = kaplan_meier(df, ["k"], "d", "e").orderBy("t").collect()
    t1 = round(1e6 * math.log(4.0 / 5.0))
    t2 = round(1e6 * math.log(3.0 / 4.0))
    t4 = round(1e6 * math.log(1.0 / 2.0))
    assert [r["km_log_unats"] for r in out] == \
        [t1, t1 + t2, t1 + t2, t1 + t2 + t4, t1 + t2 + t4]
    ext = spark.createDataFrame([("k", 1, True), ("k", 1, True)],
                                "k string, d long, e boolean")
    assert kaplan_meier(ext, ["k"], "d", "e").collect()[0]["km_log_unats"] \
        is None


def test_log_rank_hand(spark):
    from graft.pipeline import log_rank
    import math
    df = spark.createDataFrame(
        [("k", True, 1, True), ("k", True, 3, True),
         ("k", False, 2, True), ("k", False, 4, False)],
        "k string, g boolean, d long, e boolean")
    r = log_rank(df, ["k"], "g", "d", "e").collect()[0]
    assert (r["n_times"], r["oe_sum_micro"], r["var_sum_micro"]) == \
        (3, 666667, 722222)
    assert r["z_micro"] == round(1e3 * 666667.0 / math.sqrt(722222.0))


def test_sprt_crossings_and_inverted_bounds(spark):
    from graft.pipeline import sprt, sprt_constants_micro
    import pytest
    lp_s, lp_f, a_up, b_lo = sprt_constants_micro(500, 600, 50, 50)
    assert (lp_s, lp_f, a_up) == (182322, -223144, 2944439)
    rows = ([("a", i, True) for i in range(1, 21)] +
            [("c", i, False) for i in range(1, 15)])
    df = spark.createDataFrame(rows, "k string, i long, succ boolean")
    out = {r["k"]: r for r in sprt(df, ["k"], "i", "succ").collect()}
    assert out["a"]["decision"] == "accept_h1" and \
        out["a"]["decided_at"] == 17
    assert out["c"]["decision"] == "accept_h0" and \
        out["c"]["decided_at"] == 14
    with pytest.raises(ValueError):
        sprt(df, ["k"], "i", "succ", alpha_permille=600, beta_permille=500)


def test_theil_sen_median_and_guard(spark):
    from graft.pipeline import theil_sen_slope
    df = spark.createDataFrame(
        [("k", 0, 0), ("k", 1, 1), ("k", 2, 2), ("k", 3, 100)],
        "k string, x long, y long")
    r = theil_sen_slope(df, ["k"], "x", "y").collect()[0]
    assert r["n_pairs"] == 6
    assert r["ts_slope_micro"] == round(1e6 * (1.0 + 100.0 / 3.0) / 2)
    import pytest
    with pytest.raises(Exception):
        theil_sen_slope(df, ["k"], "x", "y", max_series_len=3).collect()


def test_isotonic_calibrate_pav(spark):
    from graft.pipeline import isotonic_calibrate
    df = spark.createDataFrame(
        [(1, True), (1, True), (2, False), (2, False), (3, True),
         (3, False), (4, True), (4, True)], "s long, y boolean")
    out = isotonic_calibrate(df, "s", "y", buckets=4).orderBy("bucket") \
        .collect()
    assert [(r["bucket"], r["n"], r["n_pos"], r["cal_ppm"])
            for r in out] == [(1, 2, 2, 500000), (2, 2, 0, 500000),
                              (3, 4, 3, 750000)]


def test_modularity_textbook_and_coverage(spark):
    from graft.pipeline import modularity
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "node long, community long")
    r = modularity(labels, edges, "src", "dst").collect()[0]
    assert (r["n_communities"], r["m_edges"], r["q_ppm"]) == (2, 7, 357143)
    import pytest
    partial = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], "node long, community long")
    with pytest.raises(Exception):
        modularity(partial, edges, "src", "dst").collect()


def test_distribution_distance_hand(spark):
    from graft.pipeline import distribution_distance
    ref = spark.createDataFrame([(0,), (10,)], "v long")
    cur = spark.createDataFrame([(10,), (20,)], "v long")
    r = distribution_distance(ref, cur, "v").collect()[0]
    assert (r["w1_micro"], r["tv_ppm"], r["cvm_micro"]) == \
        (10000000, 500000, 187500)


def test_token_dispersion_hand(spark):
    from graft.pipeline import token_dispersion
    df = spark.createDataFrame([("a", "x x u"), ("b", "u z z")],
                               "part string, text string")
    out = {r["token"]: (r["f"], r["dp_ppm"])
           for r in token_dispersion(df, "part", "text",
                                     min_count=1, k=10).collect()}
    assert out["x"] == (2, 500000) and out["u"] == (2, 0)
    # max_parts guard: at the cap passes, over fails loudly
    assert token_dispersion(df, "part", "text", min_count=1, k=10,
                            max_parts=2).count() == 3
    import pytest
    with pytest.raises(Exception, match="token_dispersion"):
        token_dispersion(df, "part", "text", min_count=1, k=10,
                         max_parts=1).collect()


def test_roc_auc_hand(spark):
    from graft.pipeline import roc_auc
    perfect = spark.createDataFrame(
        [("k", True, 3), ("k", True, 4), ("k", False, 1), ("k", False, 2)],
        "k string, g boolean, v long")
    r = roc_auc(perfect, ["k"], "g", "v").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["u2"]) == (2, 2, 8)
    assert (r["auc_ppm"], r["delta_ppm"]) == (1000000, 1000000)
    tied = spark.createDataFrame(
        [("k", True, 1), ("k", False, 1), ("k", True, 2), ("k", False, 2)],
        "k string, g boolean, v long")
    t = roc_auc(tied, ["k"], "g", "v").collect()[0]
    assert (t["auc_ppm"], t["delta_ppm"]) == (500000, 0)


def test_pr_auc_hand(spark):
    from graft.pipeline import pr_auc
    df = spark.createDataFrame(
        [("k", True, 4), ("k", False, 3), ("k", True, 2), ("k", False, 1)],
        "k string, g boolean, v long")
    r = pr_auc(df, ["k"], "g", "v").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["n_thresholds"]) == (2, 2, 4)
    assert r["pr_auc_micro"] == (500000000 + 291666667) // 1000


def test_mcc_and_mcnemar_hand(spark):
    from graft.pipeline import mcc, mcnemar
    perfect = spark.createDataFrame(
        [("k", True, True), ("k", True, True),
         ("k", False, False), ("k", False, False)],
        "k string, y boolean, p boolean")
    assert mcc(perfect, ["k"], "y", "p").collect()[0]["mcc_micro"] == 1000000
    pairs = spark.createDataFrame(
        [("k", True, True), ("k", True, False),
         ("k", True, False), ("k", False, True)],
        "k string, a boolean, b boolean")
    r = mcnemar(pairs, ["k"], "a", "b").collect()[0]
    assert (r["n10"], r["n01"], r["chi2_micro"]) == (2, 1, 333333)


def test_calibration_report_hand(spark):
    from graft.pipeline import calibration_report
    df = spark.createDataFrame(
        [(200000, True), (200000, False), (900000, True), (900000, True)],
        "p long, y boolean")
    out = calibration_report(df, "p", "y", bins=2).orderBy("bin").collect()
    assert [(r["bin"], r["n"], r["n_pos"], r["gap_abs"]) for r in out] == \
        [(0, 2, 1, 600000), (1, 2, 2, 200000)]
    assert all(r["ece_micro"] == 200000 for r in out)


def test_nelson_aalen_and_welch_t_hand(spark):
    from graft.pipeline import nelson_aalen, welch_t
    surv = spark.createDataFrame(
        [("k", 1, True), ("k", 2, True), ("k", 3, False),
         ("k", 4, True), ("k", 5, False)], "k string, d long, e boolean")
    out = [(r["t"], r["na_cum_micro"])
           for r in nelson_aalen(surv, ["k"], "d", "e").orderBy("t").collect()]
    assert out == [(1, 200000), (2, 450000), (3, 450000),
                   (4, 950000), (5, 950000)]
    import math
    wt = spark.createDataFrame(
        [("k", True, 1), ("k", True, 2), ("k", True, 3),
         ("k", False, 5), ("k", False, 7)], "k string, g boolean, v long")
    r = welch_t(wt, ["k"], "g", "v").collect()[0]
    assert r["t_micro"] == round(1e6 * -4.0 / math.sqrt(4.0 / 3.0))
    assert r["df_milli"] == round(1e3 * 32.0 / 19.0)


def test_chi_square_kxm_hand(spark):
    from graft.pipeline import chi_square_kxm
    rows = [("t", "t")] * 10 + [("t", "f")] * 20 + \
        [("f", "t")] * 20 + [("f", "f")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square_kxm(df, "a", "b").collect()[0]
    assert (r["n"], r["k_levels"], r["m_levels"], r["dof"]) == (60, 2, 2, 1)
    assert r["chi2_nano"] == 4 * 1666666667


def test_acf_hand(spark):
    from graft.pipeline import acf
    df = spark.createDataFrame(
        [("k", 1, 1), ("k", 2, 2), ("k", 3, 3), ("k", 4, 4)],
        "k string, t long, x long")
    out = [(r["lag"], r["n_pairs"], r["r_micro"])
           for r in acf(df, ["k"], "t", "x", max_lag=2)
           .orderBy("lag").collect()]
    assert out == [(1, 3, 250000), (2, 2, -300000)]


def test_vocabulary_richness_hand(spark):
    from graft.pipeline import vocabulary_richness
    df = spark.createDataFrame([("a a b c",), ("c d",)], "text string")
    r = vocabulary_richness(df, "text").collect()[0]
    assert (r["n_tokens"], r["vocab"], r["n1"], r["n2"]) == (6, 4, 2, 2)
    assert (r["p0_ppm"], r["chao1_milli"]) == (333333, 4333)


def test_cohens_d_and_cochran_armitage_hand(spark):
    import math
    from graft.pipeline import cohens_d, cochran_armitage
    df = spark.createDataFrame(
        [("k", True, 2), ("k", True, 4), ("k", False, 6), ("k", False, 8)],
        "k string, g boolean, v long")
    r = cohens_d(df, ["k"], "g", "v").collect()[0]
    assert r["d_micro"] == round(1e6 * -4.0 / math.sqrt(2.0))
    assert r["g_micro"] == round(1e6 * -4.0 / math.sqrt(2.0) *
                                 (1.0 - 3.0 / 7.0))
    rows = [("k", 0, i < 1) for i in range(10)] + \
        [("k", 1, i < 5) for i in range(10)] + \
        [("k", 2, i < 9) for i in range(10)]
    ca = spark.createDataFrame(rows, "k string, s long, y boolean")
    z = cochran_armitage(ca, ["k"], "s", "y").collect()[0]
    assert (z["n"], z["r_pos"], z["n_levels"]) == (30, 15, 3)
    assert abs(z["z_micro"] - 1e6 * 8.0 / math.sqrt(5.0)) <= 1.0


def test_anova_f_and_brown_forsythe_hand(spark):
    from graft.pipeline import anova_f, brown_forsythe
    df = spark.createDataFrame(
        [("k", "a", 1), ("k", "a", 2), ("k", "a", 3),
         ("k", "b", 4), ("k", "b", 5), ("k", "b", 6)],
        "k string, g string, v long")
    r = anova_f(df, ["k"], "g", "v").collect()[0]
    assert (r["n"], r["k_groups"], r["ss_between"], r["ss_within"]) == \
        (6, 2, 13, 4)
    assert r["f_micro"] == 13500000
    bf = spark.createDataFrame(
        [("k", "a", 1), ("k", "a", 2), ("k", "a", 3),
         ("k", "b", 10), ("k", "b", 20), ("k", "b", 30)],
        "k string, g string, v long")
    b = brown_forsythe(bf, ["k"], "g", "v").collect()[0]
    assert (b["ss_between"], b["ss_within"]) == (53, 67)


def test_kruskal_wallis_and_grubbs_hand(spark):
    import math
    from graft.pipeline import kruskal_wallis, grubbs
    kw = spark.createDataFrame(
        [("k", "a", 1), ("k", "a", 2), ("k", "b", 3), ("k", "b", 4)],
        "k string, g string, v long")
    r = kruskal_wallis(kw, ["k"], "g", "v").collect()[0]
    assert (r["n"], r["k_groups"], r["h_micro"]) == (4, 2, 2400000)
    gb = spark.createDataFrame([("k", 1), ("k", 2), ("k", 3), ("k", 10)],
                               "k string, v long")
    g = grubbs(gb, ["k"], "v").collect()[0]
    assert g["at_value"] == 10
    assert g["g_micro"] == round(1e6 * 24.0 * math.sqrt(3.0) /
                                 math.sqrt(4.0) / math.sqrt(200.0))


def test_anderson_darling_hand(spark):
    from graft.pipeline import anderson_darling
    a = spark.createDataFrame([(1,), (2,)], "v long")
    b = spark.createDataFrame([(3,), (4,)], "v long")
    r = anderson_darling(a, b, "v").collect()[0]
    assert (r["n_ref"], r["n_cur"]) == (2, 2)
    assert r["a2_micro"] == round(3.0 * 2303030304 / 4.0 / 1000.0)
    same = anderson_darling(a, a, "v").collect()[0]
    assert same["a2_micro"] == 0


def test_calibration_stream_batch_face(spark):
    from graft.streaming import calibration_stream
    df = spark.createDataFrame(
        [(1, 200000, True), (1, 200000, False),
         (1, 900000, True), (1, 900000, True)],
        "k long, p long, y boolean")
    r = calibration_stream(df, "k", "p", "y", bins=2).collect()[0]
    assert (r["nTotal"], r["eceMicro"], r["worstBin"],
            r["worstGapMicro"]) == (4, 200000, 0, 300000)


def test_energy_distance_hand(spark):
    from graft.pipeline import energy_distance
    a = spark.createDataFrame([(0,), (2,)], "v long")
    b = spark.createDataFrame([(1,), (3,)], "v long")
    r = energy_distance(a, b, "v").collect()[0]
    assert (r["n_ref"], r["n_cur"], r["e_micro"]) == (2, 2, 1000000)
    assert energy_distance(a, a, "v").collect()[0]["e_micro"] == 0


def test_mutual_information_hand(spark):
    import math
    from graft.pipeline import mutual_information
    dep = spark.createDataFrame([("x", "p"), ("x", "p"), ("y", "q"),
                                 ("y", "q")], "a string, b string")
    r = mutual_information(dep, "a", "b").collect()[0]
    assert r["mi_nano_nats"] == 2 * round(1e9 * 0.5 * math.log(2.0))
    assert r["u_micro"] == 1000000
    ind = spark.createDataFrame([("x", "p"), ("x", "q"), ("y", "p"),
                                 ("y", "q")], "a string, b string")
    i = mutual_information(ind, "a", "b").collect()[0]
    assert (i["mi_nano_nats"], i["u_micro"]) == (0, 0)


def test_quantize_step_lattice(spark):
    from graft.pipeline import quantize_step
    df = spark.range(100).selectExpr("id as v")
    assert quantize_step(df, "v", max_bins=100) == 1
    assert quantize_step(df, "v", max_bins=32) == 10
    wide = spark.range(10000).selectExpr("id as v")
    assert quantize_step(wide, "v", max_bins=32) == 1000


def test_pooled_distinct_cap_guard(spark):
    # mirror of the Scala capPooledDistinct specs: 4 pooled distinct
    # values pass exactly at max_distinct=4, abort loudly at 3
    import pytest
    from graft.pipeline import ks_statistic
    ref = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "v long")
    cur = spark.createDataFrame([(v,) for v in (3, 4)], "v long")
    assert ks_statistic(ref, cur, "v", max_distinct=4).collect()[0][
        "n_ref"] == 4
    with pytest.raises(Exception, match="ks_statistic"):
        ks_statistic(ref, cur, "v", max_distinct=3).collect()
    with pytest.raises(ValueError):
        ks_statistic(ref, cur, "v", max_distinct=1)


def test_calibration_report_p_micro_guard(spark):
    # p outside [0, 1e6] fails loudly with a named diagnosis, never a
    # bogus negative-bin row (mirror of the Scala spec)
    import pytest
    from graft.pipeline import calibration_report
    bad = spark.createDataFrame([(1200000, True)], "p long, y boolean")
    with pytest.raises(Exception, match="calibration_report"):
        calibration_report(bad, "p", "y", bins=2).collect()


def test_durbin_watson_hand(spark):
    from graft.pipeline import durbin_watson
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("a", 4, 4), ("b", 1, 7)],
        "k string, t long, v long")
    out = {r["k"]: (r["n"], r["dw_micro"])
           for r in durbin_watson(df, ["k"], "t", "v").collect()}
    assert out["a"] == (4, 100000) and out["b"] == (1, None)


def test_runs_test_hand(spark):
    from graft.pipeline import runs_test
    df = spark.createDataFrame(
        [("a", 1, True), ("a", 2, True), ("a", 3, False), ("a", 4, False),
         ("a", 5, True), ("b", 1, True), ("b", 2, True)],
        "k string, t long, f boolean")
    out = {r["k"]: (r["n_pos"], r["n_neg"], r["runs"], r["z_micro"])
           for r in runs_test(df, ["k"], "t", "f").collect()}
    assert out["a"] == (3, 2, 3, -436436)
    assert out["b"] == (2, 0, 1, None)


def test_ljung_box_hand(spark):
    from graft.pipeline import ljung_box
    df = spark.createDataFrame([("a", i, i) for i in range(1, 7)],
                               "k string, t long, v long")
    r = ljung_box(df, ["k"], "t", "v", max_lag=3).collect()[0]
    assert (r["n"], r["h"], r["q_micro"]) == (6, 3, 3617963)


def test_jarque_bera_hand(spark):
    from graft.pipeline import jarque_bera
    df = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3, 4, 10)] + [("b", 5), ("b", 5)],
        "k string, v long")
    out = {r["k"]: (r["n"], r["skew_micro"], r["kurt_micro"], r["jb_micro"])
           for r in jarque_bera(df, ["k"], "v").collect()}
    assert out["a"] == (5, 1138420, -212000, 1089363)
    assert out["b"] == (2, None, None, None)


def test_cochran_q_hand(spark):
    import pytest
    from graft.pipeline import cochran_q
    rows = [("k1", i, "t%d" % j, bool(y))
            for i, ys in ((1, (1, 1, 0)), (2, (1, 1, 1)),
                          (3, (0, 1, 0)), (4, (0, 0, 0)))
            for j, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, i long, j string, y boolean")
    r = cochran_q(df, ["g"], "i", "j", "y").collect()[0]
    assert (r["n_items"], r["k"], r["q_micro"]) == (4, 3, 3000000)
    bad = spark.createDataFrame(rows[1:],
                                "g string, i long, j string, y boolean")
    with pytest.raises(Exception, match="cochran_q"):
        cochran_q(bad, ["g"], "i", "j", "y").collect()


def test_bartlett_hand(spark):
    from graft.pipeline import bartlett
    rows = ([("k1", "a", v) for v in (1, 2, 3, 4)] +
            [("k1", "b", v) for v in (1, 3, 5, 7, 9)] +
            [("k2", "a", 5), ("k2", "a", 5), ("k2", "b", 1), ("k2", "b", 9)])
    df = spark.createDataFrame(rows, "kk string, g string, v long")
    out = {r["kk"]: (r["k"], r["n"], r["chi2_micro"])
           for r in bartlett(df, ["kk"], "g", "v").collect()}
    assert out["k1"] == (2, 9, 1990232)
    assert out["k2"] == (2, 4, None)  # zero-variance group


def test_moods_median_hand(spark):
    from graft.pipeline import moods_median
    rows = ([("k1", "a", v) for v in (1, 2, 3)] +
            [("k1", "b", v) for v in (4, 5, 6)])
    df = spark.createDataFrame(rows, "kk string, g string, v long")
    r = moods_median(df, ["kk"], "g", "v").collect()[0]
    assert (r["n"], r["med"], r["k_groups"], r["dof"], r["chi2_micro"]) == \
        (6, 3, 2, 1, 6000000)


def test_rmst_hand(spark):
    from graft.pipeline import rmst
    df = spark.createDataFrame(
        [("k1", 1, True), ("k1", 2, False), ("k1", 3, True),
         ("k1", 5, True)], "kk string, dur long, ev boolean")
    r = rmst(df, ["kk"], "dur", "ev", tau=4).collect()[0]
    assert (r["tau"], r["n_times"], r["rmst_micro"]) == (4, 3, 2875000)


def test_gehan_wilcoxon_hand(spark):
    from graft.pipeline import gehan_wilcoxon
    df = spark.createDataFrame(
        [("k1", True, 1, True), ("k1", True, 3, True),
         ("k1", False, 2, True), ("k1", False, 4, False)],
        "kk string, g boolean, dur long, ev boolean")
    r = gehan_wilcoxon(df, ["kk"], "g", "dur", "ev").collect()[0]
    assert (r["n_times"], r["oe_w_sum_micro"], r["var_w_sum_micro"],
            r["z_micro"]) == (3, 2000000, 7000000, 755929)


def test_theil_inequality_hand(spark):
    import pytest
    from graft.pipeline import theil_inequality
    df = spark.createDataFrame([("k1", v) for v in (1, 1, 2, 4)],
                               "kk string, v long")
    r = theil_inequality(df, ["kk"], "v").collect()[0]
    assert (r["n"], r["theil_micro"], r["atkinson_micro"]) == \
        (4, 173287, 159104)
    bad = spark.createDataFrame([("k1", 0)], "kk string, v long")
    with pytest.raises(Exception, match="theil_inequality"):
        theil_inequality(bad, ["kk"], "v").collect()


def test_trimmed_mean_hand(spark):
    from graft.pipeline import trimmed_mean
    df = spark.createDataFrame(
        [("a", v) for v in range(1, 11)] +
        [("b", v) for v in (1, 1, 1, 5, 9, 9, 9)], "kk string, v long")
    out = {r["kk"]: (r["n"], r["trimmed_n"], r["trimmed_mean_micro"])
           for r in trimmed_mean(df, ["kk"], "v", trim_ppm=200000)
           .collect()}
    assert out["a"] == (10, 6, 5500000)
    assert out["b"] == (7, 5, 5000000)


def test_page_hinkley_hand(spark):
    from graft.pipeline import page_hinkley
    df = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate((10, 10, 10, 20, 20))],
        "kk string, t long, v long")
    r = page_hinkley(df, ["kk"], "t", "v",
                     lambda_micro=4000000).collect()[0]
    assert (r["n"], r["m_micro"], r["ph_micro"], r["alarm"]) == \
        (5, 13500000, 13500000, True)


def test_cronbach_alpha_hand(spark):
    import pytest
    from graft.pipeline import cronbach_alpha
    scores = {1: (2, 4, 3), 2: (4, 5, 5), 3: (1, 2, 2), 4: (3, 4, 3)}
    rows = [("g1", s, "item%d" % i, x)
            for s, xs in scores.items() for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "kk string, s long, i string, x long")
    r = cronbach_alpha(df, ["kk"], "s", "i", "x").collect()[0]
    assert (r["n_subjects"], r["k_items"], r["alpha_micro"]) == \
        (4, 3, 969512)
    bad = spark.createDataFrame(rows[1:],
                                "kk string, s long, i string, x long")
    with pytest.raises(Exception, match="cronbach_alpha"):
        cronbach_alpha(bad, ["kk"], "s", "i", "x").collect()


def test_two_proportion_z_hand(spark):
    from graft.pipeline import two_proportion_z
    rows = ([("k1", True, i <= 40) for i in range(1, 101)] +
            [("k1", False, i <= 30) for i in range(1, 121)])
    df = spark.createDataFrame(rows, "kk string, g boolean, s boolean")
    r = two_proportion_z(df, ["kk"], "g", "s").collect()[0]
    assert r["z_micro"] == 2378475
    assert (r["a_lo_ppm"], r["a_hi_ppm"]) == (309400, 497999)
    assert (r["b_lo_ppm"], r["b_hi_ppm"]) == (181097, 334413)


def test_hellinger_distance_hand(spark):
    from graft.pipeline import hellinger_distance
    ref = spark.createDataFrame([(v,) for v in (1, 1, 2, 2)], "v long")
    cur = spark.createDataFrame([(v,) for v in (2, 3, 3, 3)], "v long")
    r = hellinger_distance(ref, cur, "v").collect()[0]
    assert (r["n_ref"], r["n_cur"], r["bc_ppm"], r["hellinger_micro"],
            r["bhattacharyya_micro"]) == (4, 4, 353553, 804019, 1039721)


def test_weighted_kappa_hand(spark):
    from graft.pipeline import weighted_kappa
    pairs = ([(1, 1)] * 3 + [(1, 2), (2, 1)] + [(2, 2)] * 3 +
             [(3, 3)] * 2)
    df = spark.createDataFrame(pairs, "a long, b long")
    q = weighted_kappa(df, "a", "b").collect()[0]
    assert (q["n"], q["k_a"], q["k_b"], q["kappa_w_micro"]) == \
        (10, 3, 3, 821429)
    l = weighted_kappa(df, "a", "b", quadratic=False).collect()[0]
    assert l["kappa_w_micro"] == 750000


def test_heaps_law_hand(spark):
    from graft.pipeline import heaps_law
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "c a d")], "doc_id long, text string")
    r = heaps_law(df, "doc_id", "text").collect()[0]
    assert (r["n_docs"], r["n_tokens"], r["vocab"], r["beta_micro"],
            r["ln_k_micro"]) == (3, 8, 4, 707951, -70418)


def test_diff_in_diff_hand(spark):
    from graft.pipeline import diff_in_diff
    rows = ([("k1", True, True, v) for v in (20, 24)] +
            [("k1", True, False, v) for v in (10, 12)] +
            [("k1", False, True, v) for v in (12, 16)] +
            [("k1", False, False, v) for v in (10, 14)])
    df = spark.createDataFrame(rows,
                               "kk string, g boolean, post boolean, v long")
    r = diff_in_diff(df, ["kk"], "g", "post", "v").collect()[0]
    assert (r["did_micro"], r["se_micro"], r["t_micro"]) == \
        (9000000, 3605551, 2496151)


def test_poisson_rate_test_hand(spark):
    from graft.pipeline import poisson_rate_test
    df = spark.createDataFrame(
        [("k1", True, 30, 100), ("k1", False, 20, 200)],
        "kk string, g boolean, ev long, expo long")
    r = poisson_rate_test(df, ["kk"], "g", "ev", "expo").collect()[0]
    assert (r["rate_ratio_ppm"], r["z_micro"]) == (3000000, 3805705)


def test_icc_hand(spark):
    from graft.pipeline import icc
    scores = {1: (2, 4, 3), 2: (4, 5, 5), 3: (1, 2, 2), 4: (3, 4, 3)}
    rows = [("g1", s, x) for s, xs in scores.items() for x in xs]
    df = spark.createDataFrame(rows, "kk string, s long, x long")
    r = icc(df, ["kk"], "s", "x").collect()[0]
    assert (r["n_subjects"], r["k_ratings"], r["icc_micro"]) == \
        (4, 3, 730000)


def test_holm_bonferroni_hand(spark):
    from graft.pipeline import holm_bonferroni
    df = spark.createDataFrame(
        [("a", 1000), ("b", 20000), ("c", 30000), ("d", 400000)],
        "t string, p long")
    out = [r["reject"] for r in
           holm_bonferroni(df, ["t"], "p").orderBy("rank").collect()]
    assert out == [True, False, False, False]


def test_priority_sample_per_key(spark):
    from graft.pipeline import priority_sample_per_key
    df = spark.createDataFrame([(t, i) for t in ("a", "b")
                                for i in range(1, 21)],
                               "k string, id long")
    out = priority_sample_per_key(df, ["k"], "id", 3).collect()
    assert len(out) == 6
    assert all(r["priority"] >= 0 for r in out)
    # deterministic: a second run returns the identical sample
    again = priority_sample_per_key(df, ["k"], "id", 3).collect()
    assert sorted((r["k"], r["id"]) for r in out) == \
        sorted((r["k"], r["id"]) for r in again)


def test_pairwise_welch_hand(spark):
    from graft.pipeline import pairwise_welch
    rows = ([("k1", "a", v) for v in (1, 2, 3, 4)] +
            [("k1", "b", v) for v in (1, 3, 5, 7, 9)] +
            [("k1", "c", v) for v in (10, 10, 12)])
    df = spark.createDataFrame(rows, "kk string, g string, v long")
    out = {(r["g_a"], r["g_b"]): (r["t_micro"], r["df_milli"])
           for r in pairwise_welch(df, ["kk"], "g", "v").collect()}
    assert out[("a", "b")] == (-1608169, 5521)
    assert out[("a", "c")] == (-8800660, 4734)
    assert out[("b", "c")] == (-3624412, 5438)


def test_brier_score_hand(spark):
    import pytest
    from graft.pipeline import brier_score
    df = spark.createDataFrame(
        [("k1", 200000, True), ("k1", 200000, False),
         ("k1", 900000, True), ("k1", 900000, True)],
        "kk string, p long, y boolean")
    r = brier_score(df, ["kk"], "p", "y").collect()[0]
    assert (r["n"], r["base_rate_ppm"], r["brier_micro"],
            r["brier_ref_micro"]) == (4, 750000, 175000, 187500)
    bad = spark.createDataFrame([("k1", 1200000, True)],
                                "kk string, p long, y boolean")
    with pytest.raises(Exception, match="brier_score"):
        brier_score(bad, ["kk"], "p", "y").collect()


def test_cohens_h_hand(spark):
    from graft.pipeline import cohens_h
    rows = ([("k1", True, i <= 40) for i in range(1, 101)] +
            [("k1", False, i <= 30) for i in range(1, 121)])
    df = spark.createDataFrame(rows, "kk string, g boolean, s boolean")
    assert cohens_h(df, ["kk"], "g", "s").collect()[0]["h_micro"] == 322241


def test_by_fdr_hand(spark):
    from graft.pipeline import by_fdr
    df = spark.createDataFrame(
        [("a", 1000), ("b", 20000), ("c", 30000), ("d", 400000)],
        "t string, p long")
    out = [(r["rank"], r["reject"]) for r in
           by_fdr(df, ["t"], "p").orderBy("rank").collect()]
    assert out == [(1, True), (2, False), (3, False), (4, False)]


def test_g_test_hand(spark):
    from graft.pipeline import g_test
    rows = ([("x", "p")] * 3 + [("x", "q")] + [("y", "p")] +
            [("y", "q")] * 3)
    df = spark.createDataFrame(rows, "a string, b string")
    r = g_test(df, "a", "b").collect()[0]
    assert (r["n"], r["dof"], r["g_nano"], r["significant_95"]) == \
        (8, 1, 2092992576, False)


def test_corr_compare_hand(spark):
    from graft.pipeline import corr_compare
    rows = ([("k1", True, x, y) for x, y in
             ((1, 2), (2, 3), (3, 5), (4, 4), (5, 7))] +
            [("k1", False, x, y) for x, y in
             ((1, 5), (2, 4), (3, 4), (4, 2), (5, 1))])
    df = spark.createDataFrame(rows,
                               "kk string, seg boolean, x long, y long")
    r = corr_compare(df, ["kk"], "seg", "x", "y").collect()[0]
    assert (r["r_a_micro"], r["r_b_micro"], r["z_micro"]) == \
        (904194, -962250, 3470184)
