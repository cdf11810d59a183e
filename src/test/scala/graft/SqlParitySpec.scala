package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Calls every registered SQL function once through spark.sql — catches
 * registration arity/type bugs that the column API can't see (three were
 * found at the SQL boundary during round 1: explode aliasing, DECIMAL
 * array literals ×2).
 */
class SqlParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val T = "rf_make_constant_tile(7.0, 4, 4, 'float64')"
  private val T2 = "rf_make_constant_tile(3.0, 4, 4, 'float64')"
  private val G = "st_geomfromwkt('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')"
  private val P = "st_makepoint(1.0, 2.0)"

  val calls: Seq[String] = Seq(
    s"rf_tile($T)", s"rf_crop($T, 1, 1, 2, 2)",
    "rf_array_to_tile(array(1.0, 2.0), 2, 1)",
    "rf_make_constant_tile(1.0, 2, 2, 'uint8')",
    s"rf_tile_to_array_double($T)", s"rf_tile_to_array_int($T)",
    s"rf_convert_cell_type($T, 'int32')", s"rf_interpret_cell_type_as($T, 'float64raw')",
    s"rf_with_no_data($T, 7.0)", s"rf_cell_type($T)", s"rf_dimensions($T)",
    s"rf_local_add($T, $T2)", s"rf_local_subtract($T, $T2)",
    s"rf_local_multiply($T, 2.0)", s"rf_local_divide($T, 2.0)",
    s"rf_local_min($T, 5.0)", s"rf_local_max($T, $T2)",
    s"rf_local_clamp($T, 1.0, 5.0)", s"rf_where(rf_local_less($T, 8.0), $T, $T2)",
    s"rf_normalized_difference($T, $T2)", s"rf_standardize($T, 5.0, 2.0)",
    s"rf_rescale($T, 0.0, 10.0)", s"rf_round($T)", s"rf_abs($T)", s"rf_sqrt($T)",
    s"rf_log($T)", s"rf_log10($T)", s"rf_log2($T)", s"rf_log1p($T)",
    s"rf_exp($T)", s"rf_exp10($T)", s"rf_exp2($T)", s"rf_expm1($T)", s"rf_identity($T)",
    s"rf_local_less($T, 8.0)", s"rf_local_less_equal($T, 8.0)",
    s"rf_local_greater($T, 8.0)", s"rf_local_greater_equal($T, 8.0)",
    s"rf_local_equal($T, $T2)", s"rf_local_unequal($T, $T2)",
    s"rf_local_is_in($T, array(7.0, 9.0))", s"rf_local_no_data($T)", s"rf_local_data($T)",
    s"rf_mask($T, $T2)", s"rf_inverse_mask($T, $T2)",
    s"rf_mask_by_value($T, $T2, 3.0)", s"rf_inverse_mask_by_value($T, $T2, 3.0)",
    s"rf_mask_by_values($T, $T2, array(3.0))",
    s"rf_local_extract_bits(rf_convert_cell_type($T, 'int32'), 0, 2)",
    s"rf_local_extract_bits(rf_convert_cell_type($T, 'int32'), 0)",
    s"rf_local_extract_bit(rf_convert_cell_type($T, 'int32'), 1)",
    "rf_cell_types()",
    s"rf_mask_by_bit($T, rf_convert_cell_type($T2, 'int32'), 0, 1)",
    s"rf_mask_by_bits($T, rf_convert_cell_type($T2, 'int32'), 0, 2, array(3.0))",
    "rf_make_zeros_tile(2, 2, 'uint8')", "rf_make_ones_tile(2, 2, 'float32')",
    s"rf_tile_sum($T)", s"rf_tile_mean($T)", s"rf_tile_min($T)", s"rf_tile_max($T)",
    s"rf_tile_stats($T)", s"rf_tile_histogram($T)",
    s"rf_data_cells($T)", s"rf_no_data_cells($T)", s"rf_is_no_data_tile($T)",
    s"rf_exists($T)", s"rf_for_all($T)",
    s"rf_resample($T, 2.0, 'bilinear')", s"rf_resample_nearest($T, 0.5)",
    s"rf_render_ascii($T)", s"rf_render_matrix($T)", s"rf_render_png($T)",
    s"rf_rgb_composite($T, $T2, $T)",
    s"rf_focal_mean($T, 'square-1')", s"rf_focal_min($T, '1')", s"rf_focal_max($T, 'circle-1')",
    s"rf_focal_median($T, '1')", s"rf_focal_mode($T, '1')", s"rf_focal_stddev($T, '1')",
    s"rf_focal_moransi($T, '1')",
    s"rf_convolve($T, array(0.0, 1.0, 0.0, 1.0, 1.0, 1.0, 0.0, 1.0, 0.0))",
    s"rf_slope($T, 1.0)", s"rf_aspect($T)", s"rf_hillshade($T, 315.0, 45.0, 1.0)",
    s"st_astext($G)", s"st_centroid($G)", s"st_area($G)", s"st_length($G)",
    s"st_x($P)", s"st_y($P)", s"st_buffer($P, 1.0)",
    s"st_distance($P, $G)", s"st_within_distance($P, $G, 2.0)",
    s"st_convexhull($G)", s"st_simplify($G, 0.5)",
    s"st_intersection($G, st_buffer($P, 1.0))", s"st_union($G, st_buffer($P, 1.0))",
    s"st_difference($G, st_buffer($P, 1.0))", s"st_npoints($G)",
    s"st_isempty($G)", s"st_isvalid($G)",
    s"st_extent($G)", s"st_geometry(st_extent($G))", s"rf_envelope($G)",
    s"st_geometrytype($G)", s"st_numgeometries($G)",
    "st_pointn(st_geomfromwkt('LINESTRING (0 0, 1 1, 2 4)'), 2)",
    "st_pointn(st_geomfromwkt('LINESTRING (0 0, 1 1, 2 4)'), -1)",
    s"st_exteriorring($G)", s"st_translate($P, 2.5, -1.5)",
    s"st_closestpoint($G, st_makepoint(9.0, 9.0))",
    s"st_reproject($P, 'epsg:4326', 'epsg:3857')",
    s"st_intersects($G, $P)", s"st_contains($G, $P)", s"st_covers($G, $P)",
    s"st_crosses($G, $P)", s"st_disjoint($G, $P)", s"st_overlaps($G, $G)",
    s"st_touches($G, $P)", s"st_within($P, $G)",
    s"rf_z2_index($P, 'epsg:4326')", s"rf_xz2_index($G, 'epsg:4326')",
    s"rf_rasterize($G, $G, 1.0, 8, 8)",
    s"rf_extent(rf_proj_raster($T, st_extent($G), 'epsg:4326'))",
    s"rf_crs(rf_proj_raster($T, st_extent($G), 'epsg:4326'))",
    s"rf_tile_context(rf_proj_raster($T, st_extent($G), 'epsg:4326'))",
    s"rf_geometry(rf_proj_raster($T, st_extent($G), 'epsg:4326'))",
    s"""st_geomfromgeojson('{"type":"Point","coordinates":[1,2]}')""",
    "mm_decode_image(mm_encode_png(array(16711680, 65280, 255, 0), 2, 2))",
    "mm_image_pixel(mm_encode_png(array(16711680, 65280, 255, 0), 2, 2), 1, 1)",
    "mm_image_pixel(mm_image_resize(mm_encode_png(array(16711680, 65280, 255, 0), 2, 2), 4, 4), 3, 3)",
    "mm_decode_image(encode('not an image', 'UTF-8'))",
    "mm_png_stats(mm_encode_png(array(16711680, 65280, 255, 0), 2, 2))",
    "mm_decode_image_stub(encode('hello', 'UTF-8'))",
    "mm_byte_histogram(encode('hello', 'UTF-8'), 16)",
    "mm_frame_sample(encode('hello world and more', 'UTF-8'), 4, 2)",
    "mm_frame_deltas(encode('hello world and more', 'UTF-8'), 4, 4, 16)",
    "pl_token_count('a b c')", "pl_char_count('abc')", "pl_punct_ratio('a, b.')",
    "pl_distinct_ratio('a a b')", "pl_quality_score('the quick brown fox jumps high')",
    "pl_language_id('the of and to in is')", "pl_fingerprint('hello world')",
    "pl_simhash('hello world')", "pl_repetition_ratio('a b a b a b', 2)",
    "pl_minhash('one two three four five')", "pl_distinct_ngrams(array('a', 'b', 'c'), 2)",
    "pl_mix64(42)", "pl_vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))",
    "pl_rand_proj(array(cast(0.5 as float), cast(-0.25 as float)), 4, 7)",
    "pl_feature_hash(array('the', 'cat', 'the'), 8, 5)",
    "pl_bpe_apply(array('that', 'hat'), array('t h', 'th a', 'tha t'))",
    "st_aggregate_distance_sphere(array(st_makepoint(0.0, 0.0)," +
      " st_makepoint(1.0, 0.0), st_makepoint(1.0, 1.0)))",
    "pl_cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D))",
    "pl_pii_emails('mail a@b.co')", "pl_pii_ipv4s('ip 1.2.3.4')",
    "pl_pii_phones('tel 415-555-0000')", "pl_pii_count('clean text')",
    "pl_redact_pii('write a@b.co')",
    "rf_synthetic_tile(1, 4, 4, 'uint8')" // registered? column-API only — via SQL expression below
  ).dropRight(1) // rf_synthetic_tile is column-API only

  val aggCalls: Seq[String] = Seq(
    s"rf_agg_mean($T)", s"rf_agg_data_cells($T)", s"rf_agg_no_data_cells($T)",
    s"rf_agg_stats($T)", s"rf_agg_approx_histogram($T)",
    s"rf_agg_approx_quantiles($T, array(0.5))",
    s"rf_agg_local_min($T)", s"rf_agg_local_max($T)", s"rf_agg_local_mean($T)",
    s"rf_agg_local_data_cells($T)", s"rf_agg_local_no_data_cells($T)",
    s"rf_agg_local_stats($T)",
    "rf_agg_overview_raster(rf_proj_raster(rf_make_constant_tile(7.0, 4, 4, 'float64')," +
      " named_struct('xmin', 0.0D, 'ymin', 0.0D, 'xmax', 4.0D, 'ymax', 4.0D)," +
      " 'epsg:4326'), 8, 8, 0.0, 0.0, 4.0, 4.0, 'epsg:4326')")

  val generatorCalls: Seq[String] = Seq(
    s"rf_explode_tiles_sample(0.5, 42, $T)")

  test("every registered scalar function evaluates via spark.sql") {
    val failures = calls.flatMap { call =>
      try { spark.sql(s"SELECT $call").collect(); None }
      catch { case e: Throwable => Some(s"$call -> ${e.getClass.getSimpleName}: ${Option(e.getMessage).map(_.linesIterator.next()).getOrElse("")}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every registered aggregate evaluates via spark.sql") {
    val failures = aggCalls.flatMap { call =>
      try { spark.sql(s"SELECT $call FROM range(5)").collect(); None }
      catch { case e: Throwable => Some(s"$call -> ${e.getClass.getSimpleName}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every registered function carries DESCRIBE FUNCTION EXTENDED docs") {
    // the reference's checkDocs invariant (TestEnvironment.scala:141-147)
    val names = FunctionDocs.usage.keys.toSeq.sorted
    val failures = names.flatMap { name =>
      try {
        val docs = spark.sql(s"DESCRIBE FUNCTION EXTENDED $name")
          .collect().map(_.getString(0)).mkString("\n")
        if (!docs.contains(name)) Some(s"$name: docs missing name")
        else if (!docs.contains("Usage:") || docs.contains("N/A"))
          Some(s"$name: missing usage")
        else if (!docs.contains(" - ")) Some(s"$name: usage has no description")
        else None
      } catch { case e: Throwable => Some(s"$name -> ${e.getClass.getSimpleName}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // and the doc map is EXACTLY the graft registry: no stale doc
    // entries, no undocumented registrations (regN already throws on a
    // missing usage entry, so set equality pins both directions)
    // Spark 4.1 ships its own st_* built-ins (st_srid, st_asbinary, ...),
    // so membership is decided by the registering className, not prefix
    val registry = org.apache.spark.sql.graft.shims.functionRegistry(spark)
    val graftRegistered = registry.listFunction()
      .filter(f => registry.lookupFunction(f).exists(_.getClassName == "graft.functions"))
      .map(_.funcName).toSet
    val docKeys = FunctionDocs.usage.keySet
    assert(docKeys == graftRegistered,
      s"docs-only: ${(docKeys -- graftRegistered).toSeq.sorted}; " +
        s"undocumented: ${(graftRegistered -- docKeys).toSeq.sorted}")
    // pinned surface size — README §2.15 and the Python parity test
    // (python/tests/test_sql_surface.py) quote this number
    assert(docKeys.size == 261, s"registered SQL surface moved: ${docKeys.size} names")
    // Examples blocks may only supplement documented names
    val strayExamples = FunctionDocs.examples.keySet -- docKeys
    assert(strayExamples.isEmpty, s"examples for undocumented names: $strayExamples")
  }

  test("generator and assembler via spark.sql") {
    spark.sql(s"SELECT rf_explode_tiles($T)").collect()
    generatorCalls.foreach(call => spark.sql(s"SELECT $call").collect())
    val n = spark.sql(
      s"""SELECT rf_tile_sum(rf_assemble_tile(c, r, v, 2, 2)) FROM
         |(SELECT 0 AS c, 0 AS r, 5.0 AS v UNION ALL SELECT 1, 1, 6.0)""".stripMargin)
      .collect()(0).getDouble(0)
    assert(n == 11.0)
  }
}
