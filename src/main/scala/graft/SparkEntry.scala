package graft

import graft.functions._
import graft.pipeline.{Dedup, Multimodal, Similarity, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract: every operator exposed as a named query over the
 * testdata tables, with a DuckDB-oracle SQL twin where the semantics are
 * SQL-expressible (FIXTURES.md §3 oracle recipe).
 *
 * Tile construction: per-orderkey 8×4 tiles from lineitem. Cell index =
 * ROW_NUMBER over a fully deterministic sort — `(l_orderkey,
 * l_linenumber)` is NOT unique in the synthetic data, so the sort key
 * includes enough columns to be a total order. l_quantity is always
 * integer-valued ⇒ sums/means/variances below are exact in IEEE double
 * regardless of aggregation order, making hash-equality with DuckDB
 * well-defined.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    Raster.init(s)
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Per-orderkey aligned tiles: t_qty (l_quantity), t_ln (l_linenumber). */
  private def tiled(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    t(s, dir, "lineitem")
      .withColumn("i", row_number().over(w) - 1)
      .groupBy("l_orderkey")
      .agg(
        rf_assemble_tile(expr("i % 8"), expr("i div 8"), col("l_quantity"), 8, 4).as("t_qty"),
        rf_assemble_tile(expr("i % 8"), expr("i div 8"),
          col("l_linenumber").cast("double"), 8, 4).as("t_ln"))
      .withColumn("bucket", col("l_orderkey") % 10)
  }

  /** Explode a tile expression to (l_orderkey, i, cell), data cells only. */
  private def cells(s: SparkSession, dir: String, tile: Column): DataFrame =
    tiled(s, dir)
      .select(col("l_orderkey"), rf_explode_tiles(tile))
      .toDF("l_orderkey", "column_index", "row_index", "cell")
      .select(col("l_orderkey"),
        (col("row_index") * 8 + col("column_index")).cast("int").as("i"),
        col("cell"))
      .where(col("cell").isNotNull)
      .orderBy("l_orderkey", "i")

  private val IDX =
    """WITH idx AS (
      |  SELECT l_orderkey, l_orderkey % 10 AS bucket,
      |         CAST(l_quantity AS DOUBLE) AS q,
      |         CAST(l_linenumber AS DOUBLE) AS lnv,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |               ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) - 1
      |              AS INTEGER) AS i
      |  FROM lineitem)""".stripMargin

  /** Flagship: tiles → map algebra → aggregate stats, on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val d = tiled(spark, "/root/testdata/sf0.001")
    d.groupBy("bucket")
      .agg(
        rf_agg_mean(rf_normalized_difference(col("t_qty"), col("t_ln"))).as("mean_nd"),
        rf_agg_stats(col("t_qty")).as("stats"),
        rf_agg_data_cells(col("t_qty")).as("cells"))
      .orderBy("bucket")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- per-tile statistics ----
    "q_tile_sum" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"), rf_tile_sum(col("t_qty")).as("tile_sum"))
        .orderBy("l_orderkey")),
    "q_tile_mean" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"), rf_tile_mean(col("t_qty")).as("tile_mean"))
        .orderBy("l_orderkey")),
    "q_tile_minmax" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_min(col("t_qty")).as("tile_min"),
        rf_tile_max(col("t_qty")).as("tile_max"),
        rf_data_cells(col("t_qty")).as("dc"),
        rf_no_data_cells(col("t_qty")).as("ndc"))
        .orderBy("l_orderkey")),
    "q_tile_stats" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"), rf_tile_stats(col("t_qty")).as("st"))
        .select(col("l_orderkey"),
          col("st.data_cells").as("dc"), col("st.no_data_cells").as("ndc"),
          col("st.min").as("mn"), col("st.max").as("mx"),
          col("st.mean").as("mean"), col("st.variance").as("variance"))
        .orderBy("l_orderkey")),
    // ---- local map algebra ----
    "q_local_arith" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_local_add(col("t_qty"), col("t_ln"))).as("sum_add"),
        rf_tile_sum(rf_local_subtract(col("t_qty"), col("t_ln"))).as("sum_sub"),
        rf_tile_sum(rf_local_multiply(col("t_qty"), col("t_ln"))).as("sum_mul"))
        .orderBy("l_orderkey")),
    "q_local_scalar" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_local_add(col("t_qty"), 10.0)).as("s_add"),
        rf_tile_sum(rf_local_multiply(col("t_qty"), 2.0)).as("s_mul"),
        rf_tile_sum(rf_local_divide(col("t_qty"), 2.0)).as("s_div"),
        rf_tile_sum(rf_local_min(col("t_qty"), 25.0)).as("s_min"),
        rf_tile_sum(rf_local_max(col("t_qty"), 25.0)).as("s_max"))
        .orderBy("l_orderkey")),
    "q_local_divide" -> ((s, dir) =>
      cells(s, dir, rf_local_divide(col("t_qty"), col("t_ln")))),
    "q_normalized_difference" -> ((s, dir) =>
      cells(s, dir, rf_normalized_difference(col("t_qty"), col("t_ln")))),
    "q_comparisons" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_local_less(col("t_qty"), 25.0)).as("n_lt"),
        rf_tile_sum(rf_local_less_equal(col("t_qty"), 25.0)).as("n_le"),
        rf_tile_sum(rf_local_greater(col("t_qty"), 25.0)).as("n_gt"),
        rf_tile_sum(rf_local_greater_equal(col("t_qty"), 25.0)).as("n_ge"),
        rf_tile_sum(rf_local_equal(col("t_qty"), 25.0)).as("n_eq"),
        rf_tile_sum(rf_local_unequal(col("t_qty"), 25.0)).as("n_ne"))
        .orderBy("l_orderkey")),
    "q_clamp_where" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_local_clamp(col("t_qty"), 10.0, 40.0)).as("s_clamp"),
        rf_tile_sum(rf_where(rf_local_less(col("t_qty"), 25.0),
          col("t_qty"), rf_local_multiply(col("t_qty"), 2.0))).as("s_where"))
        .orderBy("l_orderkey")),
    "q_is_in" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_local_is_in(col("t_qty"),
          array(lit(1.0), lit(5.0), lit(10.0), lit(25.0), lit(50.0)))).as("n_in"))
        .orderBy("l_orderkey")),
    // ---- masking / nodata ----
    "q_masking" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_mask_by_value(col("t_qty"), col("t_ln"), 3.0)).as("s_mask"),
        rf_tile_sum(rf_inverse_mask_by_value(col("t_qty"), col("t_ln"), 3.0)).as("s_inv"),
        rf_data_cells(rf_mask(col("t_qty"), rf_with_no_data(col("t_ln"), 3.0))).as("dc_mask"))
        .orderBy("l_orderkey")),
    "q_masking2" -> ((s, dir) =>
      // the remaining mask family + predicate tiles + crop + exists/for_all
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_mask_by_values(col("t_qty"), col("t_ln"),
          array(lit(2.0), lit(4.0)))).as("s_mvals"),
        rf_tile_sum(rf_local_no_data(col("t_qty"))).as("n_nd"),
        rf_tile_sum(rf_local_data(col("t_qty"))).as("n_data"),
        rf_tile_sum(rf_crop(col("t_qty"), 0, 0, 4, 2)).as("s_crop"),
        rf_exists(rf_local_greater(col("t_qty"), 49.0)).as("any_50"),
        // for_all is NoData-strict: true iff the 4x1 crop is fully
        // populated (orders with >= 4 cells) and every value positive
        rf_for_all(rf_local_greater(rf_crop(col("t_qty"), 0, 0, 4, 1), 0.0)).as("all4_pos"))
        .orderBy("l_orderkey")),
    "q_envelope" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        rf_envelope(st_geometry(struct(
          (col("p_partkey") % 7).cast("double").as("xmin"),
          (col("p_partkey") % 5).cast("double").as("ymin"),
          (col("p_partkey") % 7 + 2).cast("double").as("xmax"),
          (col("p_partkey") % 5 + 3).cast("double").as("ymax")))).as("env"))
        .select(col("p_partkey"), col("env.minx").as("minx"), col("env.maxx").as("maxx"),
          col("env.miny").as("miny"), col("env.maxy").as("maxy"))
        .orderBy("p_partkey")),
    "q_with_no_data" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_data_cells(rf_with_no_data(col("t_qty"), 50.0)).as("dc"),
        rf_tile_sum(rf_with_no_data(col("t_qty"), 50.0)).as("s"))
        .orderBy("l_orderkey")),
    "q_convert" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_cell_type(col("t_qty")).as("ct_f64"),
        rf_cell_type(rf_convert_cell_type(col("t_qty"), "int32")).as("ct_i32"),
        rf_tile_sum(rf_convert_cell_type(col("t_qty"), "int32")).as("s_i32"),
        rf_tile_sum(rf_convert_cell_type(col("t_qty"), "uint8")).as("s_u8"))
        .orderBy("l_orderkey")),
    "q_extract_bits" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_local_extract_bits(rf_convert_cell_type(col("t_qty"), "int32"), 1, 3))
          .as("s_bits"))
        .orderBy("l_orderkey")),
    "q_mask_bits" -> ((s, dir) =>
      // QA bit-plane masking: NoData t_qty where bits [0,2) of the
      // linenumber tile land in {1,3} / where bit 0 is set
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_mask_by_bits(col("t_qty"),
          rf_convert_cell_type(col("t_ln"), "int32"), 0, 2, Seq(1, 3))).as("s_masked"),
        rf_data_cells(rf_mask_by_bit(col("t_qty"),
          rf_convert_cell_type(col("t_ln"), "int32"), 0, valueToMask = true)).as("dc_bit"))
        .orderBy("l_orderkey")),
    // ---- generators / converters ----
    "q_explode_tiles" -> ((s, dir) => cells(s, dir, col("t_qty"))),
    "q_assemble_roundtrip" -> ((s, dir) => {
      val c = tiled(s, dir)
        .select(col("l_orderkey"), rf_explode_tiles(col("t_qty")))
        .where(col("t_qty").isNotNull)
      c.groupBy("l_orderkey")
        .agg(rf_assemble_tile(col("column_index"), col("row_index"), col("t_qty"), 8, 4).as("t"))
        .select(col("l_orderkey"), rf_tile_sum(col("t")).as("tile_sum"))
        .orderBy("l_orderkey")
    }),
    "q_standardize" -> ((s, dir) =>
      cells(s, dir, rf_standardize(col("t_qty"), 25.0, 10.0))),
    "q_rescale" -> ((s, dir) =>
      cells(s, dir, rf_rescale(col("t_qty"), 1.0, 50.0))),
    "q_metadata" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_cell_type(col("t_qty")).as("ct"),
        col("bucket"),
        rf_dimensions(col("t_qty")).getField("cols").as("cols"),
        rf_dimensions(col("t_qty")).getField("rows").as("rows"),
        rf_is_no_data_tile(col("t_qty")).as("is_nd"),
        rf_exists(rf_local_greater(col("t_qty"), 49.0)).as("has_gt49"))
        .orderBy("l_orderkey")),
    // ---- columnar aggregates ----
    "q_agg_mean" -> ((s, dir) =>
      tiled(s, dir).groupBy("bucket").agg(rf_agg_mean(col("t_qty")).as("m"))
        .orderBy("bucket")),
    "q_agg_stats" -> ((s, dir) =>
      tiled(s, dir).groupBy("bucket").agg(rf_agg_stats(col("t_qty")).as("st"),
          rf_agg_data_cells(col("t_qty")).as("agg_dc"),
          rf_agg_no_data_cells(col("t_qty")).as("agg_ndc"))
        .select(col("bucket"),
          col("st.data_cells").as("dc"), col("st.no_data_cells").as("ndc"),
          col("st.min").as("mn"), col("st.max").as("mx"),
          col("st.mean").as("mean"), col("st.variance").as("variance"),
          col("agg_dc"), col("agg_ndc"))
        .orderBy("bucket")),
    "q_agg_histogram" -> ((s, dir) =>
      tiled(s, dir).agg(rf_agg_approx_histogram(col("t_qty")).as("h"))
        .select(explode(col("h.bins")).as("b"))
        .select(col("b.value").as("bin_value"), col("b.count").as("bin_count"))
        .orderBy("bin_value")),
    "q_tile_histogram" -> ((s, dir) =>
      tiled(s, dir)
        .select(col("l_orderkey"), rf_tile_histogram(col("t_qty")).as("h"))
        .select(col("l_orderkey"), explode(col("h.bins")).as("b"))
        .select(col("l_orderkey"), col("b.value").as("bin_value"), col("b.count").as("bin_count"))
        .orderBy("l_orderkey", "bin_value")),
    // ---- local (cell-wise) aggregates ----
    "q_agg_local" -> ((s, dir) =>
      tiled(s, dir).groupBy("bucket")
        .agg(rf_agg_local_min(col("t_qty")).as("tmin"),
          rf_agg_local_max(col("t_qty")).as("tmax"),
          rf_agg_local_mean(col("t_qty")).as("tmean"),
          rf_agg_local_data_cells(col("t_qty")).as("tcnt"))
        .select(col("bucket"),
          rf_explode_tiles(col("tmin"), col("tmax"), col("tmean"), col("tcnt")))
        .select(col("bucket"),
          (col("row_index") * 8 + col("column_index")).cast("int").as("i"),
          col("tmin").as("min_c"), col("tmax").as("max_c"),
          col("tmean").as("mean_c"), col("tcnt").as("cnt_c"))
        .where(col("cnt_c") > 0)
        .orderBy("bucket", "i")),
    "q_agg_local_nodata" -> ((s, dir) =>
      tiled(s, dir).groupBy("bucket")
        .agg(rf_agg_local_no_data_cells(col("t_qty")).as("tnd"))
        .select(col("bucket"), rf_explode_tiles(col("tnd")))
        .select(col("bucket"),
          (col("row_index") * 8 + col("column_index")).cast("int").as("i"),
          col("tnd").as("nd"))
        .orderBy("bucket", "i")),
    // ---- text analysis ----
    "q_text_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
        TextFunctions.char_count(col("text")).as("chars"),
        TextFunctions.token_count(col("text")).as("tokens"),
        size(array_distinct(TextFunctions.tokens(col("text")))).as("distinct_tokens"))
        .orderBy("doc_id")),
    "q_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.punct_ratio(col("text")).as("punct_ratio"),
        TextFunctions.distinct_ratio(col("text")).as("distinct_ratio"),
        TextFunctions.quality_score(col("text")).as("quality"))
        .orderBy("doc_id")),
    "q_token_freq" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy("token")),
    "q_lang_stats" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        avg("n_chars").as("avg_chars"),
        countDistinct("source").as("n_sources"))
        .orderBy("lang")),
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("content_hash")),
    "q_repetition" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        graft.pipeline.TextFunctions.repetition_ratio(col("text")).as("rep3"))
        .orderBy("doc_id")),
    "q_dedup_pipeline" -> ((s, dir) => {
      // Chained fixture: every 5th doc plus its 80%- and 64%-token
      // prefixes. Consecutive links share ~0.8 trigram Jaccard, the
      // v0↔v2 skip link only ~0.64 — so a single keep_id per chain
      // REQUIRES transitive (connected-components) clustering, and the
      // exact-Jaccard edges make the whole thing DuckDB-checkable.
      val docs = t(s, dir, "documents").where(col("doc_id") % 5 === 0)
      val toks = split(col("text"), " ")
      val n1 = floor(size(toks) * 4 / 5).cast("int")
      val n2 = floor(floor(size(toks) * 4 / 5) * 4 / 5).cast("int")
      val v0 = docs.select((col("doc_id") * 3).as("id"), col("source"), col("text"))
      val v1 = docs.select((col("doc_id") * 3 + 1).as("id"), col("source"),
        concat_ws(" ", slice(toks, lit(1), n1)).as("text"))
      val v2 = docs.select((col("doc_id") * 3 + 2).as("id"), col("source"),
        concat_ws(" ", slice(toks, lit(1), n2)).as("text"))
      graft.pipeline.Dedup2.keepDecisionsExact(
        v0.union(v1).union(v2), "id", "text", "source")
        .orderBy("id")
    }),
    "q_dedup_lsh" -> ((s, dir) =>
      graft.pipeline.Dedup2.keepDecisions(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("id")),
    "q_embed_dedup" -> ((s, dir) =>
      // embedding-cosine near-dup keep decisions (LSH candidates +
      // exact cosine + connected components) — rows-only check
      graft.pipeline.EmbeddingDedup.keepDecisions(
        t(s, dir, "embeddings"), "vec_id", "embedding", threshold = 0.99)
        .orderBy("id")),
    // ---- rows-only (non-SQL-expressible) operators ----
    "q_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextFunctions.language_id(col("text")).as("guess"))
        .orderBy("doc_id")),
    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.simhash(col("text")).as("sh"))
        .orderBy("doc_id")),
    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text", threshold = 0.2)
        .orderBy("a_id", "b_id")),
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 16)
        .orderBy("a_id", "b_id")),
    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text", "source", threshold = 0.05)
        .orderBy("blk", "a_id", "b_id")),
    "q_knn_brute" -> ((s, dir) =>
      Similarity.bruteTopK(t(s, dir, "embeddings"), "vec_id", "embedding", 3)
        .orderBy("query_id", "rank")),
    "q_knn_lsh" -> ((s, dir) =>
      Similarity.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding", 3)
        .orderBy("query_id", "rank")),
    "q_knn_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding", 3)
        .orderBy("query_id", "rank")),
    "q_multimodal" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        length(Multimodal.to_blob(col("text"))).as("byte_len"),
        size(Multimodal.frame_sample(Multimodal.to_blob(col("text")), 64, 32)).as("n_frames"))
        .orderBy("doc_id")),
    "q_multimodal_decode" -> ((s, dir) =>
      // hist exploded to orderable scalars (doc_id, bin, bin_count) so the
      // compare harness can sort it; frac*byte_len recovers the exact
      // integer count (float32 rel-err ≪ 1/byte_len for these sizes).
      t(s, dir, "documents").select(col("doc_id"),
        Multimodal.decode_image_stub(Multimodal.to_blob(col("text"))).as("img"),
        Multimodal.byte_histogram(Multimodal.to_blob(col("text"))).as("hist"))
        .select(col("doc_id"), col("img.channels").as("channels"),
          col("img.byte_len").as("byte_len"), posexplode(col("hist")))
        .select(col("doc_id"), col("channels"), col("byte_len"),
          col("pos").cast("int").as("bin"),
          round(col("col") * col("byte_len")).cast("long").as("bin_count"))
        .orderBy("doc_id", "bin")),
    "q_image_decode" -> ((s, dir) => {
      // Real PNG round-trip: pixels are a closed-form function of doc_id,
      // so after mm_encode_png → mm_decode_image/mm_image_pixel the dims
      // and probed pixels are recomputable by the oracle in pure integer
      // SQL. Channel c of pixel (x, y): (x*7 + y*13 + c*31 + doc_id*3) % 256.
      val d = col("doc_id")
      val w = (pmod(d, lit(13)) + 1).cast("int")
      val h = (pmod(d, lit(11)) + 1).cast("int")
      val pix = transform(sequence(lit(0L), (w * h - 1).cast("long")), { i =>
        val x = pmod(i, w.cast("long"))
        val y = (i - x) / w.cast("long")
        val base = x * 7 + y * 13 + d * 3
        (pmod(base, lit(256L)) * 65536L +
          pmod(base + 31, lit(256L)) * 256L +
          pmod(base + 62, lit(256L))).cast("int")
      })
      t(s, dir, "documents")
        .select(d, w.as("w"), h.as("h"),
          Multimodal.encode_png(pix, w, h).as("blob"))
        .select(d,
          Multimodal.decode_image(col("blob")).as("img"),
          Multimodal.image_pixel(col("blob"), lit(0), lit(0)).as("p00"),
          Multimodal.image_pixel(col("blob"), col("w") - 1, col("h") - 1).as("pll"))
        .select(d, col("img.width").as("width"), col("img.height").as("height"),
          col("img.channels").as("channels"), col("p00"), col("pll"))
        .orderBy("doc_id")
    }),
    "q_math" -> ((s, dir) =>
      // sqrt is IEEE-754 correctly rounded in both engines → exact oracle;
      // abs over integer-valued cells is exact
      cells(s, dir, rf_sqrt(col("t_qty")))
        .withColumnRenamed("cell", "sqrt_q")
        .join(cells(s, dir, rf_abs(rf_local_subtract(col("t_qty"), 25.0)))
          .withColumnRenamed("cell", "abs_q"), Seq("l_orderkey", "i"))
        .orderBy("l_orderkey", "i")),
    "q_math_rows" -> ((s, dir) =>
      // log/exp families: libm results differ at ulp level between engines —
      // rows-only check (correctness covered by ScalaTest against java.lang.Math)
      tiled(s, dir).select(col("l_orderkey"),
        rf_tile_sum(rf_log(col("t_qty"))).as("s_log"),
        rf_tile_sum(rf_log10(col("t_qty"))).as("s_log10"),
        rf_tile_sum(rf_log2(col("t_qty"))).as("s_log2"),
        rf_tile_sum(rf_log1p(col("t_qty"))).as("s_log1p"),
        rf_tile_sum(rf_exp(rf_local_divide(col("t_qty"), 50.0))).as("s_exp"),
        rf_tile_sum(rf_exp2(rf_local_divide(col("t_qty"), 10.0))).as("s_exp2"),
        rf_tile_sum(rf_exp10(rf_local_divide(col("t_qty"), 25.0))).as("s_exp10"),
        rf_tile_sum(rf_expm1(rf_local_divide(col("t_qty"), 50.0))).as("s_expm1"),
        rf_tile_sum(rf_round(rf_local_divide(col("t_qty"), 7.0))).as("s_round"),
        rf_tile_sum(rf_identity(col("t_qty"))).as("s_id"))
        .orderBy("l_orderkey")),
    "q_agg_quantiles" -> ((s, dir) =>
      tiled(s, dir).groupBy("bucket")
        .agg(rf_agg_approx_quantiles(col("t_qty"), Seq(0.25, 0.5, 0.75)).as("qs"))
        .select(col("bucket"),
          col("qs").getItem(0).as("p25"), col("qs").getItem(1).as("p50"),
          col("qs").getItem(2).as("p75"))
        .orderBy("bucket")),
    "q_resample" -> ((s, dir) =>
      tiled(s, dir)
        .select(col("l_orderkey"), rf_resample_nearest(col("t_qty"), lit(0.5)).as("rt"))
        .select(col("l_orderkey"), rf_explode_tiles(col("rt")))
        .select(col("l_orderkey"),
          (col("row_index") * 4 + col("column_index")).cast("int").as("i2"),
          col("rt").as("cell"))
        .where(col("cell").isNotNull)
        .orderBy("l_orderkey", "i2")),
    // ---- focal / terrain ----
    "q_focal" -> ((s, dir) =>
      tiled(s, dir).select(col("l_orderkey"),
        rf_mask(rf_focal_min(col("t_qty"), "square-1"), col("t_qty")).as("fmin"),
        rf_mask(rf_focal_max(col("t_qty"), "square-1"), col("t_qty")).as("fmax"),
        rf_mask(rf_focal_mean(col("t_qty"), "square-1"), col("t_qty")).as("fmean"),
        rf_mask(rf_convolve(col("t_qty"),
          array((0 until 9).map(_ => lit(1.0)): _*)), col("t_qty")).as("fsum"))
        .select(col("l_orderkey"),
          rf_explode_tiles(col("fmin"), col("fmax"), col("fmean"), col("fsum")))
        .select(col("l_orderkey"),
          (col("row_index") * 8 + col("column_index")).cast("int").as("i"),
          col("fmin"), col("fmax"), col("fmean"), col("fsum"))
        .where(col("fmin").isNotNull)
        .orderBy("l_orderkey", "i")),
    "q_terrain" -> ((s, dir) =>
      tiled(s, dir)
        .select(col("l_orderkey"), col("t_qty"),
          rf_proj_raster(col("t_qty"),
            struct(lit(0.0).as("xmin"), lit(0.0).as("ymin"),
              lit(8.0).as("xmax"), lit(4.0).as("ymax")),
            lit("epsg:3857")).as("pr"))
        .select(col("l_orderkey"),
          rf_tile_sum(rf_slope(col("pr"), 1.0)).as("slope_sum"),
          rf_tile_sum(rf_aspect(col("pr"))).as("aspect_sum"),
          rf_tile_sum(rf_hillshade(col("pr"), 315.0, 45.0, 1.0)).as("hillshade_sum"),
          rf_tile_sum(rf_focal_median(col("t_qty"), "square-1")).as("median_sum"),
          rf_tile_sum(rf_focal_mode(col("t_qty"), "circle-1")).as("mode_sum"),
          rf_tile_sum(rf_focal_stddev(col("t_qty"), "square-1")).as("stddev_sum"),
          rf_tile_sum(rf_focal_moransi(col("t_qty"), "square-1")).as("moransi_sum"))
        .orderBy("l_orderkey")),
    // ---- spatial ----
    "q_st_predicates" -> ((s, dir) => {
      val p = t(s, dir, "lineitem")
        .select(col("l_quantity").as("q"), col("l_linenumber").cast("double").as("lnv"))
        .distinct()
      val a = st_geometry(struct(col("q").as("xmin"), col("lnv").as("ymin"),
        (col("q") + lit(3.0)).as("xmax"), (col("lnv") + lit(2.0)).as("ymax")))
      val b = st_geomFromWKT(lit("POLYGON ((25 3, 35 3, 35 5, 25 5, 25 3))"))
      p.select(col("q"), col("lnv"),
        st_intersects(a, b).as("r_intersects"),
        st_contains(a, b).as("r_contains"),
        st_within(a, b).as("r_within"),
        st_disjoint(a, b).as("r_disjoint"))
        .orderBy("q", "lnv")
    }),
    "q_st_accessors" -> ((s, dir) => {
      val p = t(s, dir, "lineitem")
        .select(col("l_quantity").as("q"), col("l_linenumber").cast("double").as("lnv"))
        .distinct()
      val a = st_geometry(struct(col("q").as("xmin"), col("lnv").as("ymin"),
        (col("q") + lit(3.0)).as("xmax"), (col("lnv") + lit(2.0)).as("ymax")))
      p.select(col("q"), col("lnv"),
        st_area(a).as("area"),
        st_x(st_centroid(a)).as("cx"), st_y(st_centroid(a)).as("cy"),
        st_x(st_makePoint(col("q"), col("lnv"))).as("px"),
        st_y(st_makePoint(col("q"), col("lnv"))).as("py"))
        .orderBy("q", "lnv")
    }),
    "q_rasterize" -> ((s, dir) => {
      val p = t(s, dir, "lineitem")
        .select(col("l_quantity").as("q"), col("l_linenumber").cast("double").as("lnv"))
        .distinct()
      val tcol = rf_rasterize(
        st_geometry(struct(col("q").as("xmin"), col("lnv").as("ymin"),
          (col("q") + lit(3.0)).as("xmax"), (col("lnv") + lit(2.0)).as("ymax"))),
        st_geometry(struct(lit(0.0).as("xmin"), lit(0.0).as("ymin"),
          lit(64.0).as("xmax"), lit(16.0).as("ymax"))),
        col("q"), 64, 16)
      p.select(col("q"), col("lnv"),
        rf_data_cells(tcol).as("dc"), rf_tile_sum(tcol).as("s"))
        .orderBy("q", "lnv")
    }),
    "q_sfc_index" -> ((s, dir) => {
      val p = t(s, dir, "lineitem")
        .select((col("l_quantity") / 2.0).as("x"), col("l_linenumber").cast("double").as("y"))
        .distinct()
      p.select(col("x"), col("y"),
        rf_z2_index(st_makePoint(col("x"), col("y")), lit("epsg:4326")).as("z2"),
        rf_xz2_index(st_buffer(st_makePoint(col("x"), col("y")), lit(0.5)), lit("epsg:4326")).as("xz2"))
        .orderBy("x", "y")
    }),
    "q_raster_join" -> ((s, dir) => {
      val base = tiled(s, dir).where(col("l_orderkey") % 200 === 0)
        .select(col("l_orderkey"), col("t_qty").as("tile"),
          struct((col("l_orderkey") % 1000 * 2).cast("double").as("xmin"),
            expr("(l_orderkey div 1000) * 2").cast("double").as("ymin"),
            (col("l_orderkey") % 1000 * 2 + 1).cast("double").as("xmax"),
            expr("(l_orderkey div 1000) * 2 + 1").cast("double").as("ymax")).as("extent"),
          lit("epsg:4326").as("crs"))
      RasterJoin(base,
        base.select(col("tile").as("r_tile"), col("extent").as("r_extent"), col("crs").as("r_crs")),
        col("extent"), col("crs"), col("tile"),
        col("r_extent"), col("r_crs"), col("r_tile"))
        .select(col("l_orderkey"), rf_tile_sum(col("right_tile")).as("s"))
        .orderBy("l_orderkey")
    }),
    "q_raster_join_bucketed" -> ((s, dir) => {
      val base = tiled(s, dir).where(col("l_orderkey") % 200 === 0)
        .select(col("l_orderkey"), col("t_qty").as("tile"),
          struct((col("l_orderkey") % 1000 * 2).cast("double").as("xmin"),
            expr("(l_orderkey div 1000) * 2").cast("double").as("ymin"),
            (col("l_orderkey") % 1000 * 2 + 1).cast("double").as("xmax"),
            expr("(l_orderkey div 1000) * 2 + 1").cast("double").as("ymax")).as("extent"),
          lit("epsg:4326").as("crs"))
      RasterJoin.bucketed(base,
        base.select(col("tile").as("r_tile"), col("extent").as("r_extent"), col("crs").as("r_crs")),
        col("extent"), col("crs"), col("tile"),
        col("r_extent"), col("r_crs"), col("r_tile"), cellSize = 16.0,
        leftId = Some(col("l_orderkey")))
        .select(col("l_orderkey"), rf_tile_sum(col("right_tile")).as("s"))
        .orderBy("l_orderkey")
    }),
    // ---- events (temporal keys) ----
    // events.ts is parquet TIMESTAMP(NANOS): read as long nanos, convert.
    "q_events_daily" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      t(s, dir, "events")
        .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          min("value").as("min_value"), max("value").as("max_value"),
          countDistinct("user_id").as("n_users"))
        .orderBy("day", "event_type")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_tile_sum" ->
      "SELECT l_orderkey, SUM(l_quantity) AS tile_sum FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey",
    "q_tile_mean" ->
      "SELECT l_orderkey, AVG(l_quantity) AS tile_mean FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey",
    "q_tile_minmax" ->
      """SELECT l_orderkey, MIN(l_quantity) AS tile_min, MAX(l_quantity) AS tile_max,
        |CAST(COUNT(*) AS BIGINT) AS dc, CAST(32 - COUNT(*) AS BIGINT) AS ndc
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_tile_stats" -> (IDX +
      """ SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS dc, CAST(32 - COUNT(*) AS BIGINT) AS ndc,
        |MIN(q) AS mn, MAX(q) AS mx, SUM(q) / COUNT(q) AS mean,
        |CASE WHEN COUNT(q) > 1 THEN (SUM(q*q) - SUM(q) * (SUM(q) / COUNT(q))) / (COUNT(q) - 1) END AS variance
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_local_arith" -> (IDX +
      """ SELECT l_orderkey, SUM(q + lnv) AS sum_add, SUM(q - lnv) AS sum_sub, SUM(q * lnv) AS sum_mul
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_local_scalar" -> (IDX +
      """ SELECT l_orderkey, SUM(q + 10.0) AS s_add, SUM(q * 2.0) AS s_mul, SUM(q / 2.0) AS s_div,
        |SUM(LEAST(q, 25.0)) AS s_min, SUM(GREATEST(q, 25.0)) AS s_max
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_local_divide" -> (IDX +
      " SELECT l_orderkey, i, q / lnv AS cell FROM idx ORDER BY l_orderkey, i"),
    "q_normalized_difference" -> (IDX +
      " SELECT l_orderkey, i, (q - lnv) / (q + lnv) AS cell FROM idx ORDER BY l_orderkey, i"),
    "q_comparisons" -> (IDX +
      """ SELECT l_orderkey,
        |SUM(CASE WHEN q < 25.0 THEN 1.0 ELSE 0.0 END) AS n_lt,
        |SUM(CASE WHEN q <= 25.0 THEN 1.0 ELSE 0.0 END) AS n_le,
        |SUM(CASE WHEN q > 25.0 THEN 1.0 ELSE 0.0 END) AS n_gt,
        |SUM(CASE WHEN q >= 25.0 THEN 1.0 ELSE 0.0 END) AS n_ge,
        |SUM(CASE WHEN q = 25.0 THEN 1.0 ELSE 0.0 END) AS n_eq,
        |SUM(CASE WHEN q <> 25.0 THEN 1.0 ELSE 0.0 END) AS n_ne
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_clamp_where" -> (IDX +
      """ SELECT l_orderkey, SUM(LEAST(GREATEST(q, 10.0), 40.0)) AS s_clamp,
        |SUM(CASE WHEN q < 25.0 THEN q ELSE q * 2.0 END) AS s_where
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_is_in" -> (IDX +
      """ SELECT l_orderkey, SUM(CASE WHEN q IN (1.0, 5.0, 10.0, 25.0, 50.0) THEN 1.0 ELSE 0.0 END) AS n_in
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_masking" -> (IDX +
      """ SELECT l_orderkey,
        |COALESCE(SUM(CASE WHEN lnv <> 3.0 THEN q END), 0.0) AS s_mask,
        |COALESCE(SUM(CASE WHEN lnv = 3.0 THEN q END), 0.0) AS s_inv,
        |CAST(SUM(CASE WHEN lnv <> 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS dc_mask
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_masking2" -> (IDX +
      """ SELECT l_orderkey,
        |COALESCE(SUM(CASE WHEN lnv IN (2.0, 4.0) THEN NULL ELSE q END), 0.0) AS s_mvals,
        |CAST(32 - COUNT(*) AS DOUBLE) AS n_nd,
        |CAST(COUNT(*) AS DOUBLE) AS n_data,
        |COALESCE(SUM(CASE WHEN i % 8 < 4 AND i // 8 < 2 THEN q END), 0.0) AS s_crop,
        |MAX(CASE WHEN q > 49.0 THEN 1 ELSE 0 END) = 1 AS any_50,
        |SUM(CASE WHEN i < 4 THEN 1 ELSE 0 END) = 4 AS all4_pos
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_envelope" ->
      """SELECT p_partkey,
        |CAST(p_partkey % 7 AS DOUBLE) AS minx,
        |CAST(p_partkey % 7 + 2 AS DOUBLE) AS maxx,
        |CAST(p_partkey % 5 AS DOUBLE) AS miny,
        |CAST(p_partkey % 5 + 3 AS DOUBLE) AS maxy
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_with_no_data" -> (IDX +
      """ SELECT l_orderkey,
        |CAST(SUM(CASE WHEN q <> 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS dc,
        |COALESCE(SUM(CASE WHEN q <> 50.0 THEN q END), 0.0) AS s
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_convert" ->
      """SELECT l_orderkey, 'float64' AS ct_f64, 'int32' AS ct_i32,
        |SUM(l_quantity) AS s_i32, SUM(l_quantity) AS s_u8
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_extract_bits" -> (IDX +
      """ SELECT l_orderkey,
        |SUM(CAST((CAST(q AS BIGINT) >> 1) & 7 AS DOUBLE)) AS s_bits
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_mask_bits" -> (IDX +
      """ SELECT l_orderkey,
        |COALESCE(SUM(CASE WHEN (CAST(lnv AS BIGINT) & 3) IN (1, 3) THEN NULL ELSE q END), 0.0) AS s_masked,
        |CAST(COUNT(CASE WHEN (CAST(lnv AS BIGINT) & 1) = 1 THEN NULL ELSE 1 END) AS BIGINT) AS dc_bit
        |FROM idx GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
    "q_explode_tiles" -> (IDX +
      " SELECT l_orderkey, i, q AS cell FROM idx ORDER BY l_orderkey, i"),
    "q_assemble_roundtrip" ->
      "SELECT l_orderkey, SUM(l_quantity) AS tile_sum FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey",
    "q_standardize" -> (IDX +
      " SELECT l_orderkey, i, (q - 25.0) / 10.0 AS cell FROM idx ORDER BY l_orderkey, i"),
    "q_rescale" -> (IDX +
      " SELECT l_orderkey, i, (q - 1.0) / (50.0 - 1.0) AS cell FROM idx ORDER BY l_orderkey, i"),
    "q_metadata" ->
      """SELECT l_orderkey, 'float64' AS ct, l_orderkey % 10 AS bucket,
        |8 AS cols, 4 AS rows, FALSE AS is_nd,
        |CAST(MAX(CASE WHEN l_quantity > 49.0 THEN 1 ELSE 0 END) AS BOOLEAN) AS has_gt49
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_agg_mean" ->
      "SELECT l_orderkey % 10 AS bucket, AVG(l_quantity) AS m FROM lineitem GROUP BY 1 ORDER BY 1",
    "q_agg_stats" -> (IDX +
      """ SELECT bucket, CAST(COUNT(*) AS BIGINT) AS dc,
        |CAST(32 * COUNT(DISTINCT l_orderkey) - COUNT(*) AS BIGINT) AS ndc,
        |MIN(q) AS mn, MAX(q) AS mx, SUM(q) / COUNT(q) AS mean,
        |CASE WHEN COUNT(q) > 1 THEN (SUM(q*q) - SUM(q) * (SUM(q) / COUNT(q))) / (COUNT(q) - 1) END AS variance,
        |CAST(COUNT(*) AS BIGINT) AS agg_dc,
        |CAST(32 * COUNT(DISTINCT l_orderkey) - COUNT(*) AS BIGINT) AS agg_ndc
        |FROM idx GROUP BY bucket ORDER BY bucket""".stripMargin),
    "q_agg_histogram" -> (IDX +
      """ SELECT q AS bin_value, CAST(COUNT(*) AS BIGINT) AS bin_count
        |FROM idx GROUP BY q ORDER BY bin_value""".stripMargin),
    "q_tile_histogram" -> (IDX +
      """ SELECT l_orderkey, q AS bin_value, CAST(COUNT(*) AS BIGINT) AS bin_count
        |FROM idx GROUP BY l_orderkey, q ORDER BY l_orderkey, bin_value""".stripMargin),
    "q_agg_local" -> (IDX +
      """ SELECT bucket, i, MIN(q) AS min_c, MAX(q) AS max_c,
        |SUM(q) / COUNT(q) AS mean_c, CAST(COUNT(*) AS DOUBLE) AS cnt_c
        |FROM idx GROUP BY bucket, i ORDER BY bucket, i""".stripMargin),
    "q_agg_local_nodata" -> (IDX +
      """, b AS (SELECT bucket, CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM idx GROUP BY bucket),
        |d AS (SELECT bucket, i, CAST(COUNT(*) AS DOUBLE) AS c FROM idx GROUP BY bucket, i)
        |SELECT b.bucket AS bucket, CAST(gs.g AS INTEGER) AS i, b.n - COALESCE(d.c, 0.0) AS nd
        |FROM b CROSS JOIN generate_series(0, 31) gs(g)
        |LEFT JOIN d ON d.bucket = b.bucket AND d.i = gs.g
        |ORDER BY b.bucket, i""".stripMargin),
    "q_text_stats" ->
      """SELECT doc_id, n_chars, CAST(LENGTH(text) AS INTEGER) AS chars,
        |CAST(LEN(string_split(text, ' ')) AS INTEGER) AS tokens,
        |CAST(LEN(list_distinct(string_split(text, ' '))) AS INTEGER) AS distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality" ->
      """SELECT doc_id,
        |CAST(LENGTH(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE) / LENGTH(text) AS punct_ratio,
        |CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE) / LEN(string_split(text, ' ')) AS distinct_ratio,
        |((LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 64.0, 1.0) * 0.4)
        | + ((CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE) / LEN(string_split(text, ' '))) * 0.4))
        | + ((1.0 - CAST(LENGTH(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE) / LENGTH(text)) * 0.2) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_freq" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin,
    "q_lang_stats" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |AVG(n_chars) AS avg_chars, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, CAST(COUNT(*) AS BIGINT) AS cnt, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // chained fixture + exact trigram-Jaccard edges + recursive-CTE
    // connected components — the transitive-closure ground truth for the
    // Spark side's iterative label propagation
    "q_dedup_pipeline" ->
      """WITH RECURSIVE docs0 AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id % 5 = 0),
        |vars AS (
        |  SELECT doc_id * 3 AS id, source, t FROM docs0
        |  UNION ALL
        |  SELECT doc_id * 3 + 1, source, t[1:(LEN(t) * 4) // 5] FROM docs0
        |  UNION ALL
        |  SELECT doc_id * 3 + 2, source, t[1:(((LEN(t) * 4) // 5) * 4) // 5] FROM docs0),
        |vtext AS (SELECT id, source, array_to_string(t, ' ') AS text, t FROM vars),
        |grams AS (SELECT DISTINCT source AS blk, id,
        |  unnest([array_to_string(t[i:i+2], ' ') FOR i IN range(1, GREATEST(LEN(t) - 1, 2))]) AS gram
        |  FROM vtext),
        |sizes AS (SELECT blk, id, CAST(COUNT(*) AS DOUBLE) AS sz FROM grams GROUP BY blk, id),
        |common AS (SELECT a.blk AS blk, a.id AS a_id, b.id AS b_id, CAST(COUNT(*) AS DOUBLE) AS c
        |           FROM grams a JOIN grams b ON a.blk = b.blk AND a.gram = b.gram AND a.id < b.id
        |           GROUP BY a.blk, a.id, b.id),
        |near AS (SELECT a_id, b_id FROM common
        |         JOIN sizes sa ON sa.blk = common.blk AND sa.id = common.a_id
        |         JOIN sizes sb ON sb.blk = common.blk AND sb.id = common.b_id
        |         WHERE c / (sa.sz + sb.sz - c) >= 0.7),
        |exact AS (SELECT x.id AS a_id, y.id AS b_id FROM vtext x JOIN vtext y
        |          ON x.text = y.text AND x.id < y.id),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM near
        |          UNION SELECT b_id, a_id FROM near
        |          UNION SELECT a_id, b_id FROM exact
        |          UNION SELECT b_id, a_id FROM exact),
        |reach AS (
        |  SELECT id, id AS r FROM vtext
        |  UNION
        |  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
        |SELECT id, MIN(r) AS keep_id, MIN(r) <> id AS is_duplicate
        |FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "q_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id,
        |  [array_to_string(t[i:i+2], ' ') FOR i IN range(1, GREATEST(LEN(t) - 1, 2))] AS g
        |  FROM toks)
        |SELECT doc_id, 1.0 - CAST(LEN(list_distinct(g)) AS DOUBLE) / LEN(g) AS rep3
        |FROM grams ORDER BY doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH toks AS (SELECT source AS blk, doc_id AS id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT DISTINCT blk, id,
        |          unnest([array_to_string(t[i:i+2], ' ') FOR i IN range(1, GREATEST(LEN(t) - 1, 2))]) AS gram
        |          FROM toks),
        |sizes AS (SELECT blk, id, CAST(COUNT(*) AS DOUBLE) AS sz FROM grams GROUP BY blk, id),
        |common AS (SELECT a.blk AS blk, a.id AS a_id, b.id AS b_id, CAST(COUNT(*) AS DOUBLE) AS c
        |           FROM grams a JOIN grams b ON a.blk = b.blk AND a.gram = b.gram AND a.id < b.id
        |           GROUP BY a.blk, a.id, b.id)
        |SELECT common.blk AS blk, a_id, b_id, c / (sa.sz + sb.sz - c) AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.blk = common.blk AND sa.id = common.a_id
        |JOIN sizes sb ON sb.blk = common.blk AND sb.id = common.b_id
        |WHERE c / (sa.sz + sb.sz - c) >= 0.05
        |ORDER BY blk, a_id, b_id""".stripMargin,
    "q_multimodal" ->
      """SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS byte_len,
        |CAST(CASE WHEN LENGTH(text) >= 64 THEN (LENGTH(text) - 64) // 32 + 1 ELSE 0 END AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // text is pure ASCII in the synthetic corpus, so UTF-8 byte value ==
    // character code and the byte histogram is char-countable in SQL.
    "q_multimodal_decode" ->
      """WITH chars AS (
        |  SELECT d.doc_id, CAST(ascii(substring(d.text, CAST(u.ci AS INT), 1)) // 16 AS INT) AS bin
        |  FROM documents d, unnest(range(1, length(d.text) + 1)) AS u(ci)),
        |counts AS (SELECT doc_id, bin, COUNT(*) AS c FROM chars GROUP BY doc_id, bin),
        |grid AS (
        |  SELECT d.doc_id, CAST(length(d.text) AS INTEGER) AS byte_len, CAST(g.bin AS INT) AS bin
        |  FROM documents d, (SELECT unnest(range(0, 16)) AS bin) g)
        |SELECT grid.doc_id AS doc_id, CAST(3 AS INTEGER) AS channels, grid.byte_len AS byte_len,
        |  grid.bin AS bin, CAST(COALESCE(counts.c, 0) AS BIGINT) AS bin_count
        |FROM grid LEFT JOIN counts ON grid.doc_id = counts.doc_id AND grid.bin = counts.bin
        |ORDER BY doc_id, bin""".stripMargin,
    // PNG is lossless, so the decoded dims/pixels equal the closed-form
    // integer math the Spark side used to build the image.
    "q_image_decode" ->
      """SELECT doc_id,
        |CAST(doc_id % 13 + 1 AS INTEGER) AS width,
        |CAST(doc_id % 11 + 1 AS INTEGER) AS height,
        |CAST(3 AS INTEGER) AS channels,
        |CAST(((doc_id * 3) % 256) * 65536 + ((doc_id * 3 + 31) % 256) * 256
        |     + ((doc_id * 3 + 62) % 256) AS INTEGER) AS p00,
        |CAST((((doc_id % 13) * 7 + (doc_id % 11) * 13 + doc_id * 3) % 256) * 65536
        |     + (((doc_id % 13) * 7 + (doc_id % 11) * 13 + doc_id * 3 + 31) % 256) * 256
        |     + (((doc_id % 13) * 7 + (doc_id % 11) * 13 + doc_id * 3 + 62) % 256) AS INTEGER) AS pll
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_math" -> (IDX +
      """ SELECT l_orderkey, i, sqrt(q) AS sqrt_q, abs(q - 25.0) AS abs_q
        |FROM idx ORDER BY l_orderkey, i""".stripMargin),
    "q_resample" -> (IDX +
      """ SELECT l_orderkey,
        |CAST(((i // 8 - 1) // 2) * 4 + ((i % 8 - 1) // 2) AS INTEGER) AS i2, q AS cell
        |FROM idx WHERE (i % 8) % 2 = 1 AND (i // 8) % 2 = 1
        |ORDER BY l_orderkey, i2""".stripMargin),
    "q_focal" -> (IDX +
      """, cells AS (SELECT l_orderkey, i, q, i % 8 AS c, i // 8 AS r FROM idx)
        |SELECT a.l_orderkey AS l_orderkey, a.i AS i,
        |MIN(b.q) AS fmin, MAX(b.q) AS fmax,
        |SUM(b.q) / COUNT(b.q) AS fmean, SUM(b.q) AS fsum
        |FROM cells a JOIN cells b
        |  ON a.l_orderkey = b.l_orderkey AND abs(a.c - b.c) <= 1 AND abs(a.r - b.r) <= 1
        |GROUP BY a.l_orderkey, a.i ORDER BY l_orderkey, i""".stripMargin),
    "q_st_predicates" ->
      """WITH p AS (SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS q, CAST(l_linenumber AS DOUBLE) AS lnv FROM lineitem)
        |SELECT q, lnv,
        |(q <= 35.0 AND q + 3.0 >= 25.0 AND lnv <= 5.0 AND lnv + 2.0 >= 3.0) AS r_intersects,
        |(q <= 25.0 AND q + 3.0 >= 35.0 AND lnv <= 3.0 AND lnv + 2.0 >= 5.0) AS r_contains,
        |(q >= 25.0 AND q + 3.0 <= 35.0 AND lnv >= 3.0 AND lnv + 2.0 <= 5.0) AS r_within,
        |NOT (q <= 35.0 AND q + 3.0 >= 25.0 AND lnv <= 5.0 AND lnv + 2.0 >= 3.0) AS r_disjoint
        |FROM p ORDER BY q, lnv""".stripMargin,
    "q_st_accessors" ->
      """WITH p AS (SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS q, CAST(l_linenumber AS DOUBLE) AS lnv FROM lineitem)
        |SELECT q, lnv, 6.0 AS area, q + 1.5 AS cx, lnv + 1.0 AS cy, q AS px, lnv AS py
        |FROM p ORDER BY q, lnv""".stripMargin,
    "q_rasterize" ->
      """WITH p AS (SELECT DISTINCT CAST(l_quantity AS DOUBLE) AS q, CAST(l_linenumber AS DOUBLE) AS lnv FROM lineitem)
        |SELECT q, lnv, CAST(6 AS BIGINT) AS dc, 6.0 * q AS s
        |FROM p ORDER BY q, lnv""".stripMargin,
    "q_raster_join" ->
      """SELECT l_orderkey, SUM(l_quantity) AS s FROM lineitem
        |WHERE l_orderkey % 200 = 0 GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_raster_join_bucketed" ->
      """SELECT l_orderkey, SUM(l_quantity) AS s FROM lineitem
        |WHERE l_orderkey % 200 = 0 GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_events_daily" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |MIN(value) AS min_value, MAX(value) AS max_value,
        |CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
