package graft

/**
 * SQL-surface documentation, attached at registration so every
 * `rf_*`/`st_*` name answers `DESCRIBE FUNCTION EXTENDED` with real
 * usage text — the reference enforces the same property via
 * ExpressionDescription + checkDocs
 * (/root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/package.scala:72-190,
 * core/src/test/.../TestEnvironment.scala:141-147). SqlParitySpec sweeps
 * every registered name against this map.
 */
object FunctionDocs {

  /** name -> usage ("fn(args) - description"). */
  val usage: Map[String, String] = Map(
    // constructors / converters
    "rf_array_to_tile" -> "rf_array_to_tile(array, cols, rows) - Converts a numeric array into a tile with the given dimensions.",
    "rf_make_constant_tile" -> "rf_make_constant_tile(value, cols, rows, cell_type) - Creates a tile of the given dimensions with all cells set to value.",
    "rf_make_zeros_tile" -> "rf_make_zeros_tile(cols, rows, cell_type) - Creates a tile of the given dimensions with all cells set to 0.",
    "rf_make_ones_tile" -> "rf_make_ones_tile(cols, rows, cell_type) - Creates a tile of the given dimensions with all cells set to 1.",
    "rf_tile_to_array_double" -> "rf_tile_to_array_double(tile) - Flattens tile cells into an array of doubles (NoData becomes NULL).",
    "rf_tile_to_array_int" -> "rf_tile_to_array_int(tile) - Flattens tile cells into an array of integers (NoData becomes NULL).",
    "rf_convert_cell_type" -> "rf_convert_cell_type(tile, cell_type) - Converts the storage cell type of the tile, translating NoData.",
    "rf_interpret_cell_type_as" -> "rf_interpret_cell_type_as(tile, cell_type) - Reinterprets the raw cell bytes as the given cell type without conversion.",
    "rf_with_no_data" -> "rf_with_no_data(tile, value) - Returns the tile with the given value marked as NoData.",
    "rf_tile" -> "rf_tile(tile) - Realizes a (possibly lazy/reference) tile into a fully materialized tile.",
    "rf_crop" -> "rf_crop(tile, col_off, row_off, cols, rows) - Crops the tile to the given grid window.",
    "rf_cell_type" -> "rf_cell_type(tile) - Returns the cell type name of the tile.",
    "rf_dimensions" -> "rf_dimensions(tile) - Returns the (cols, rows) dimensions of the tile.",
    // local map algebra
    "rf_local_add" -> "rf_local_add(a, b) - Cell-wise sum of two tiles, or tile and scalar.",
    "rf_local_subtract" -> "rf_local_subtract(a, b) - Cell-wise difference of two tiles, or tile and scalar.",
    "rf_local_multiply" -> "rf_local_multiply(a, b) - Cell-wise product of two tiles, or tile and scalar.",
    "rf_local_divide" -> "rf_local_divide(a, b) - Cell-wise quotient of two tiles, or tile and scalar.",
    "rf_local_min" -> "rf_local_min(a, b) - Cell-wise minimum of two tiles, or tile and scalar.",
    "rf_local_max" -> "rf_local_max(a, b) - Cell-wise maximum of two tiles, or tile and scalar.",
    "rf_local_clamp" -> "rf_local_clamp(tile, lo, hi) - Clamps each cell into the inclusive range [lo, hi].",
    "rf_where" -> "rf_where(condition_tile, x, y) - Cell-wise selection: x where condition is nonzero, else y.",
    "rf_normalized_difference" -> "rf_normalized_difference(a, b) - Computes (a - b) / (a + b) cell-wise (e.g. NDVI).",
    "rf_standardize" -> "rf_standardize(tile, mean, stddev) - Standardizes cells to (x - mean) / stddev.",
    "rf_rescale" -> "rf_rescale(tile, min, max) - Rescales cells to [0, 1] given the value range [min, max].",
    "rf_round" -> "rf_round(tile) - Rounds each cell to the nearest integer.",
    "rf_abs" -> "rf_abs(tile) - Absolute value of each cell.",
    "rf_sqrt" -> "rf_sqrt(tile) - Square root of each cell.",
    "rf_log" -> "rf_log(tile) - Natural logarithm of each cell.",
    "rf_log10" -> "rf_log10(tile) - Base-10 logarithm of each cell.",
    "rf_log2" -> "rf_log2(tile) - Base-2 logarithm of each cell.",
    "rf_log1p" -> "rf_log1p(tile) - Natural logarithm of one plus each cell.",
    "rf_exp" -> "rf_exp(tile) - e raised to the power of each cell.",
    "rf_exp10" -> "rf_exp10(tile) - 10 raised to the power of each cell.",
    "rf_exp2" -> "rf_exp2(tile) - 2 raised to the power of each cell.",
    "rf_expm1" -> "rf_expm1(tile) - e raised to each cell, minus one.",
    "rf_identity" -> "rf_identity(tile) - Returns the tile unchanged (pipeline placeholder).",
    "rf_local_less" -> "rf_local_less(a, b) - Cell-wise a < b as a 0/1 tile.",
    "rf_local_less_equal" -> "rf_local_less_equal(a, b) - Cell-wise a <= b as a 0/1 tile.",
    "rf_local_greater" -> "rf_local_greater(a, b) - Cell-wise a > b as a 0/1 tile.",
    "rf_local_greater_equal" -> "rf_local_greater_equal(a, b) - Cell-wise a >= b as a 0/1 tile.",
    "rf_local_equal" -> "rf_local_equal(a, b) - Cell-wise a == b as a 0/1 tile.",
    "rf_local_unequal" -> "rf_local_unequal(a, b) - Cell-wise a != b as a 0/1 tile.",
    "rf_local_is_in" -> "rf_local_is_in(tile, array) - Cell-wise membership test against the array, as a 0/1 tile.",
    "rf_local_no_data" -> "rf_local_no_data(tile) - 1 where the cell is NoData, else 0.",
    "rf_local_data" -> "rf_local_data(tile) - 1 where the cell holds data, else 0.",
    // masking
    "rf_mask" -> "rf_mask(target, mask) - NoData target cells wherever the mask cell is NoData.",
    "rf_inverse_mask" -> "rf_inverse_mask(target, mask) - NoData target cells wherever the mask cell holds data.",
    "rf_mask_by_value" -> "rf_mask_by_value(target, mask, value) - NoData target cells wherever the mask cell equals value.",
    "rf_inverse_mask_by_value" -> "rf_inverse_mask_by_value(target, mask, value) - NoData target cells wherever the mask cell does not equal value.",
    "rf_mask_by_values" -> "rf_mask_by_values(target, mask, values) - NoData target cells wherever the mask cell is in the values array.",
    "rf_local_extract_bits" -> "rf_local_extract_bits(tile, start_bit, num_bits) - Extracts the value of bits [start_bit, start_bit+num_bits) of each cell, counting from the right.",
    "rf_mask_by_bit" -> "rf_mask_by_bit(target, mask, bit_position, value) - NoData target cells wherever bit bit_position of the mask cell equals value (QA-band masking).",
    "rf_mask_by_bits" -> "rf_mask_by_bits(target, mask, start_bit, num_bits, values) - NoData target cells wherever the extracted mask bits are in the values array.",
    // per-tile stats
    "rf_tile_sum" -> "rf_tile_sum(tile) - Sum of the data cells of the tile.",
    "rf_tile_mean" -> "rf_tile_mean(tile) - Mean of the data cells of the tile.",
    "rf_tile_min" -> "rf_tile_min(tile) - Minimum of the data cells of the tile.",
    "rf_tile_max" -> "rf_tile_max(tile) - Maximum of the data cells of the tile.",
    "rf_tile_stats" -> "rf_tile_stats(tile) - Struct of (data_cells, no_data_cells, min, max, mean, variance) for the tile.",
    "rf_tile_histogram" -> "rf_tile_histogram(tile) - Array of (value, count) pairs over the tile's data cells.",
    "rf_data_cells" -> "rf_data_cells(tile) - Number of data (non-NoData) cells in the tile.",
    "rf_no_data_cells" -> "rf_no_data_cells(tile) - Number of NoData cells in the tile.",
    "rf_is_no_data_tile" -> "rf_is_no_data_tile(tile) - True if every cell of the tile is NoData.",
    "rf_exists" -> "rf_exists(tile) - True if any cell of the tile is nonzero.",
    "rf_for_all" -> "rf_for_all(tile) - True if every data cell of the tile is nonzero.",
    // generators
    "rf_explode_tiles" -> "rf_explode_tiles(tile, ...) - One row per cell: (column_index, row_index, value per input tile).",
    "rf_explode_tiles_sample" -> "rf_explode_tiles_sample(fraction, seed, tile, ...) - rf_explode_tiles over a deterministic sample of cells.",
    // aggregates
    "rf_agg_mean" -> "rf_agg_mean(tile) - Aggregate mean over all data cells of all tiles in the group.",
    "rf_agg_data_cells" -> "rf_agg_data_cells(tile) - Aggregate count of data cells across the group.",
    "rf_agg_no_data_cells" -> "rf_agg_no_data_cells(tile) - Aggregate count of NoData cells across the group.",
    "rf_agg_stats" -> "rf_agg_stats(tile) - Aggregate (data_cells, no_data_cells, min, max, mean, variance) across the group.",
    "rf_agg_approx_quantiles" -> "rf_agg_approx_quantiles(tile, probabilities) - Approximate cell-value quantiles across the group.",
    "rf_agg_approx_histogram" -> "rf_agg_approx_histogram(tile) - Approximate cell-value histogram across the group.",
    "rf_agg_local_min" -> "rf_agg_local_min(tile) - Cell-wise minimum across all tiles of the group.",
    "rf_agg_local_max" -> "rf_agg_local_max(tile) - Cell-wise maximum across all tiles of the group.",
    "rf_agg_local_mean" -> "rf_agg_local_mean(tile) - Cell-wise mean across all tiles of the group.",
    "rf_agg_local_data_cells" -> "rf_agg_local_data_cells(tile) - Cell-wise data-cell count across all tiles of the group.",
    "rf_agg_local_no_data_cells" -> "rf_agg_local_no_data_cells(tile) - Cell-wise NoData count across all tiles of the group.",
    "rf_agg_local_stats" -> "rf_agg_local_stats(tile) - Cell-wise (min, max, mean, variance) tiles across the group.",
    "rf_agg_overview_raster" -> "rf_agg_overview_raster(proj_raster, cols, rows, xmin, ymin, xmax, ymax, crs) - Aggregates tiles into one overview raster over the destination grid.",
    "rf_assemble_tile" -> "rf_assemble_tile(column_index, row_index, value, cols, rows[, cell_type]) - Assembles exploded cells back into a tile.",
    // vector / spatial
    "st_geomfromwkt" -> "st_geomfromwkt(wkt) - Parses a WKT string into a geometry.",
    "st_geomfromgeojson" -> "st_geomfromgeojson(json) - Parses a GeoJSON string into a geometry.",
    "st_astext" -> "st_astext(geom) - Renders the geometry as WKT.",
    "st_makepoint" -> "st_makepoint(x, y) - Creates a point geometry.",
    "st_centroid" -> "st_centroid(geom) - Centroid point of the geometry.",
    "st_area" -> "st_area(geom) - Planar area of the geometry.",
    "st_length" -> "st_length(geom) - Planar length/perimeter of the geometry.",
    "st_x" -> "st_x(point) - X coordinate of the point.",
    "st_y" -> "st_y(point) - Y coordinate of the point.",
    "st_buffer" -> "st_buffer(geom, distance) - Geometry buffered by the given distance.",
    "st_distance" -> "st_distance(geomA, geomB) - Euclidean distance between the geometries in their shared CRS units.",
    "st_within_distance" -> "st_within_distance(geomA, geomB, distance) - True when the geometries lie within the given distance of each other (envelope short-circuit).",
    "st_convexhull" -> "st_convexhull(geom) - Convex hull of the geometry.",
    "st_intersection" -> "st_intersection(geomA, geomB) - Geometric intersection of the two geometries.",
    "st_union" -> "st_union(geomA, geomB) - Geometric union of the two geometries.",
    "st_difference" -> "st_difference(geomA, geomB) - Part of geomA not in geomB.",
    "st_npoints" -> "st_npoints(geom) - Number of vertices in the geometry.",
    "st_isempty" -> "st_isempty(geom) - True when the geometry is empty (e.g. an empty intersection).",
    "st_isvalid" -> "st_isvalid(geom) - OGC validity of the geometry.",
    "st_simplify" -> "st_simplify(geom, tolerance) - Douglas-Peucker simplification with the given tolerance (topology not guaranteed).",
    "st_extent" -> "st_extent(geom) - Bounding box of the geometry as an extent struct (xmin, ymin, xmax, ymax).",
    "st_geometrytype" -> "st_geometrytype(geom) - JTS type name of the geometry ('Point', 'LineString', 'Polygon', ...).",
    "st_numgeometries" -> "st_numgeometries(geom) - Number of member geometries (1 for a simple geometry).",
    "st_pointn" -> "st_pointn(line, n) - 1-based nth vertex of a LineString (negative n counts from the end); NULL when out of range or not a line.",
    "st_exteriorring" -> "st_exteriorring(polygon) - Exterior ring of a polygon as a LineString; NULL for non-polygons.",
    "st_translate" -> "st_translate(geom, dx, dy) - Geometry rigidly translated by (dx, dy).",
    "st_closestpoint" -> "st_closestpoint(geomA, geomB) - Point on geomA nearest to geomB.",
    "st_geometry" -> "st_geometry(extent) - Converts an extent struct into a polygon geometry.",
    "st_boundary" -> "st_boundary(geom) - Topological boundary: polygon rings as lines, line endpoints as points, empty for points.",
    "st_dimension" -> "st_dimension(geom) - Topological dimension: 0 point, 1 line, 2 polygon (max over a collection).",
    "st_coorddim" -> "st_coorddim(geom) - Coordinate dimension: 2 unless a vertex carries a real Z ordinate.",
    "st_isclosed" -> "st_isclosed(geom) - True when a (multi)line starts and ends at the same point; true for non-line types.",
    "st_iscollection" -> "st_iscollection(geom) - True when the geometry is a collection (Multi* or GeometryCollection).",
    "st_isring" -> "st_isring(line) - True when the line is a ring (closed and simple); NULL for non-lines.",
    "st_issimple" -> "st_issimple(geom) - OGC simplicity: no self-intersection or self-tangency.",
    "st_numpoints" -> "st_numpoints(geom) - Total vertex count of the geometry (alias of st_npoints, the spark-jts name).",
    "st_geometryn" -> "st_geometryn(geom, n) - 1-based nth member of a collection; NULL out of range.",
    "st_interiorringn" -> "st_interiorringn(polygon, n) - 1-based nth interior ring as a LineString; NULL out of range or for non-polygons.",
    "st_envelope" -> "st_envelope(geom) - Envelope as a geometry (degenerate inputs give point/line).",
    "st_makeline" -> "st_makeline(points) - LineString through an array of points, in array order.",
    "st_makepolygon" -> "st_makepolygon(shell) - Polygon from a closed LineString shell.",
    "st_makebox2d" -> "st_makebox2d(cornerA, cornerB) - Axis-aligned box polygon spanning the two corner points.",
    "st_point" -> "st_point(x, y) - Point geometry from coordinates (alias of st_makepoint, the spark-jts name).",
    "st_casttopoint" -> "st_casttopoint(geom) - The geometry when it is a Point, else NULL.",
    "st_casttolinestring" -> "st_casttolinestring(geom) - The geometry when it is a LineString, else NULL.",
    "st_casttopolygon" -> "st_casttopolygon(geom) - The geometry when it is a Polygon, else NULL.",
    "st_casttogeometry" -> "st_casttogeometry(geom) - The geometry unchanged (type-widening cast).",
    "st_bytearray" -> "st_bytearray(string) - UTF-8 bytes of the string.",
    "st_asgeojson" -> "st_asgeojson(geom) - GeoJSON geometry fragment (RFC 7946, no whitespace).",
    "st_aslatlontext" -> "st_aslatlontext(point) - Point as DMS text, latitude then longitude (seconds to 3 decimals).",
    "st_distancesphere" -> "st_distancesphere(pointA, pointB) - Great-circle distance in meters between two lon/lat points (haversine, IUGG mean radius).",
    "st_lengthsphere" -> "st_lengthsphere(line) - Great-circle length in meters of a lon/lat LineString; 0 for non-lines.",
    "st_relate" -> "st_relate(geomA, geomB) - DE-9IM intersection matrix of the two geometries as its 9-char string.",
    "st_relatebool" -> "st_relatebool(geomA, geomB, pattern) - True when the DE-9IM matrix matches the pattern (T/F/0/1/2/* per cell).",
    "st_geohash" -> "st_geohash(geom, precision) - Geohash of a lon/lat geometry (centroid for non-points) at the given character precision (1-12).",
    "st_geomfromgeohash" -> "st_geomfromgeohash(hash) - Geohash cell as its bounding-box polygon.",
    "st_pointfromgeohash" -> "st_pointfromgeohash(hash) - Geohash cell center as a point.",
    "st_geomfromtext" -> "st_geomfromtext(wkt) - Geometry from WKT (alias of st_geomfromwkt).",
    "st_pointfromtext" -> "st_pointfromtext(wkt) - Point from WKT; NULL when the text is a different geometry type.",
    "st_linefromtext" -> "st_linefromtext(wkt) - LineString from WKT; NULL when the text is a different geometry type.",
    "st_polygonfromtext" -> "st_polygonfromtext(wkt) - Polygon from WKT; NULL when the text is a different geometry type.",
    "st_makebbox" -> "st_makebbox(xmin, ymin, xmax, ymax) - Axis-aligned box polygon from four coordinate bounds.",
    "st_bufferpoint" -> "st_bufferpoint(point, meters) - Geodesic buffer of a lon/lat point: a 64-gon at the given great-circle radius (IUGG sphere).",
    "st_antimeridiansafegeom" -> "st_antimeridiansafegeom(geom) - Splits a geometry crossing the +-180 line into parts on each side; unchanged otherwise.",
    "st_idlsafegeom" -> "st_idlsafegeom(geom) - Alias of st_antimeridiansafegeom.",
    "rf_envelope" -> "rf_envelope(geom) - JTS envelope of the geometry as a struct (minx, maxx, miny, maxy).",
    // multimodal
    "mm_decode_image" -> "mm_decode_image(blob) - Decodes an image payload via javax.imageio (PNG/JPEG/GIF/BMP/TIFF) to (width, height, channels, byte_len); NULL when the bytes aren't a readable image.",
    "mm_decode_image_stub" -> "mm_decode_image_stub(blob) - Deterministic pseudo-decode of any payload to (width, height, channels, byte_len) derived from its hash; plumbing tests only — use mm_decode_image for real images.",
    "mm_encode_png" -> "mm_encode_png(pixels, width, height) - Encodes a row-major array of packed 0xRRGGBB ints into a PNG payload.",
    "mm_image_pixel" -> "mm_image_pixel(blob, x, y) - Packed 0xRRGGBB value of pixel (x, y) of a decodable image payload; NULL on decode failure or out-of-bounds.",
    "mm_image_resize" -> "mm_image_resize(blob, width, height) - Nearest-neighbor resize of a decodable image payload to width x height, re-encoded as PNG; NULL when the bytes aren't a readable image.",
    "mm_png_stats" -> "mm_png_stats(blob) - Whole-image summary struct (width, height, opaque, red_sum) of a decodable image payload: opaque counts alpha=255 pixels, red_sum sums their red channel; NULL when the bytes aren't a readable image.",
    "mm_byte_histogram" -> "mm_byte_histogram(blob[, bins]) - Normalized byte-value histogram of the payload (default 16 bins).",
    "mm_frame_sample" -> "mm_frame_sample(blob, frame_size, stride) - Every stride-th window of frame_size bytes, as an array of binaries.",
    // training-data pipeline (pl_*)
    "pl_token_count" -> "pl_token_count(text) - Number of whitespace-separated tokens in the text.",
    "pl_char_count" -> "pl_char_count(text) - Number of characters in the text.",
    "pl_punct_ratio" -> "pl_punct_ratio(text) - Fraction of characters that are punctuation.",
    "pl_distinct_ratio" -> "pl_distinct_ratio(text) - Distinct tokens divided by total tokens (type-token ratio).",
    "pl_quality_score" -> "pl_quality_score(text) - Heuristic document quality score in [0, 1] from length, punctuation, and token-diversity signals.",
    "pl_language_id" -> "pl_language_id(text) - Best-guess ISO language code from stopword-profile hits (heuristic-grade).",
    "pl_fingerprint" -> "pl_fingerprint(text) - 64-bit rolling document fingerprint (FNV-1a + splitmix64 finalizer).",
    "pl_simhash" -> "pl_simhash(text) - 64-bit SimHash of the whitespace tokens; near-duplicate texts land within a small Hamming distance.",
    "pl_repetition_ratio" -> "pl_repetition_ratio(text[, n]) - 1 minus distinct/total n-gram ratio (default n=3); high values flag boilerplate repetition.",
    "pl_minhash" -> "pl_minhash(text[, num_hashes, shingle]) - MinHash signature (default 32 hashes over 3-token shingles) as an array of longs.",
    "pl_winnow" -> "pl_winnow(text[, k, w]) - MOSS winnowing fingerprints: array of (pos, fp) structs selecting each w-window's rightmost-minimum k-token gram hash; shared substrings of w+k-1 tokens always share a fingerprint.",
    "pl_chunks" -> "pl_chunks(text[, size_tokens, overlap]) - Fixed-size token windows (default 512, overlap 0) as an array of (chunk_idx, start_token, chunk_text, n_chunk_tokens) structs; inline() it to get chunk rows.",
    "pl_distinct_ngrams" -> "pl_distinct_ngrams(tokens[, n]) - Distinct n-grams (default n=3) of a token array, in first-seen order.",
    "pl_ngrams" -> "pl_ngrams(tokens[, n]) - All n-grams (default n=2) of a token array with multiplicity; strict windows, so fewer than n tokens yields an empty array.",
    "pl_mix64" -> "pl_mix64(x) - splitmix64 finalizer of an integral value; a stable pseudo-random sort key for deterministic sampling.",
    "pl_nfc" -> "pl_nfc(text) - Unicode NFC (canonical composition) normalization of a string.",
    "pl_nfkc" -> "pl_nfkc(text) - Unicode NFKC (compatibility composition) normalization of a string.",
    "pl_unicode_normalize" -> "pl_unicode_normalize(text, form) - Unicode normalization with an explicit form: 'NFC', 'NFD', 'NFKC', or 'NFKD'.",
    "pl_strip_accents" -> "pl_strip_accents(text) - Removes diacritics (NFD decomposition, combining marks dropped): 'Café' becomes 'Cafe'.",
    "pl_normalize_whitespace" -> "pl_normalize_whitespace(text) - Collapses whitespace runs to single spaces and trims the ends.",
    "pl_strip_punct" -> "pl_strip_punct(text) - Removes every character that is not a letter, digit, or whitespace.",
    "pl_clean_text" -> "pl_clean_text(text) - Canonical cleaning pass: NFC normalization, lowercase, whitespace collapse.",
    "pl_strip_html" -> "pl_strip_html(text) - Drops HTML/XML tags and comments (tags become spaces) and decodes the predefined XML entities plus &nbsp;; &amp; decodes last so &amp;lt; yields a literal &lt;.",
    "pl_bloom_agg" -> "pl_bloom_agg(hash[, num_bits, k]) - Aggregates 64-bit key hashes into a Bloom bitset (array of num_bits/64 longs, default 2^20 bits / k=5); OR-mergeable across partitions for broadcast incremental dedup.",
    "pl_bloom_contains" -> "pl_bloom_contains(bits, hash[, k]) - Probes a literal Bloom bitset (from pl_bloom_agg) for a 64-bit key hash; false means certainly absent, true may be a false positive.",
    "pl_vector_dot" -> "pl_vector_dot(a, b) - Dot product of two float/double array vectors, accumulated in double.",
    "pl_cosine_similarity" -> "pl_cosine_similarity(a, b) - Cosine similarity of two float/double array vectors (0.0 when either norm is zero).",
    "pl_l2_norm" -> "pl_l2_norm(v) - Euclidean norm of a float/double array vector (index-order double accumulation).",
    "pl_pii_emails" -> "pl_pii_emails(text) - Every email-address span in the text, as an array of strings.",
    "pl_pii_ipv4s" -> "pl_pii_ipv4s(text) - Every dotted-quad IPv4 span in the text, as an array of strings.",
    "pl_pii_phones" -> "pl_pii_phones(text) - Every NNN-NNN-NNNN phone span in the text, as an array of strings.",
    "pl_pii_count" -> "pl_pii_count(text) - Total count of email, IPv4, and phone spans in the text.",
    "pl_redact_pii" -> "pl_redact_pii(text) - The text with every email/IPv4/phone span replaced by <EMAIL>/<IP>/<PHONE>.",
    "st_reproject" -> "st_reproject(geom, src_crs, dst_crs) - Reprojects geometry coordinates between CRSs.",
    "st_intersects" -> "st_intersects(a, b) - True if geometries/extents a and b intersect.",
    "st_contains" -> "st_contains(a, b) - True if a contains b.",
    "st_covers" -> "st_covers(a, b) - True if a covers b.",
    "st_crosses" -> "st_crosses(a, b) - True if a crosses b.",
    "st_disjoint" -> "st_disjoint(a, b) - True if a and b are disjoint.",
    "st_overlaps" -> "st_overlaps(a, b) - True if a overlaps b.",
    "st_touches" -> "st_touches(a, b) - True if a touches b.",
    "st_within" -> "st_within(a, b) - True if a is within b.",
    "rf_z2_index" -> "rf_z2_index(geom, crs) - Z2 space-filling-curve index of the geometry centroid.",
    "rf_xz2_index" -> "rf_xz2_index(geom, crs) - XZ2 space-filling-curve index of the geometry's extent.",
    "rf_rasterize" -> "rf_rasterize(geom, bounds, value, cols, rows) - Burns the geometry into a tile over the bounds grid.",
    // projected raster
    "rf_proj_raster" -> "rf_proj_raster(tile, extent, crs) - Bundles tile, extent and CRS into a projected raster struct.",
    "rf_extent" -> "rf_extent(proj_raster) - Extent struct of the projected raster.",
    "rf_tile_context" -> "rf_tile_context(proj_raster) - The (extent, crs) context struct of the projected raster.",
    "rf_crs" -> "rf_crs(proj_raster) - CRS identifier of the projected raster.",
    "rf_geometry" -> "rf_geometry(proj_raster) - Footprint polygon of the projected raster.",
    "rf_reproject_and_merge" -> "rf_reproject_and_merge(tiles, extents, crss, dst_extent, dst_crs, cols, rows) - Reprojects and mosaics tiles onto the destination grid.",
    "rf_resample" -> "rf_resample(tile, factor_or_tile, method) - Resamples the tile by a factor or to match a target tile ('nearest', 'bilinear', ...).",
    "rf_resample_nearest" -> "rf_resample_nearest(tile, factor) - Nearest-neighbor resample by the given factor.",
    // rendering
    "rf_render_ascii" -> "rf_render_ascii(tile) - Renders the tile as an ASCII-art string.",
    "rf_render_matrix" -> "rf_render_matrix(tile) - Renders the tile's cell values as a matrix string.",
    "rf_render_png" -> "rf_render_png(red, green, blue) - Renders three tiles as PNG bytes (single-tile form renders grayscale).",
    "rf_rgb_composite" -> "rf_rgb_composite(red, green, blue) - Packs three tiles into one RGB-composite int32 tile.",
    // focal / terrain
    "rf_focal_mean" -> "rf_focal_mean(tile, neighborhood) - Focal mean over the neighborhood (e.g. 'square-1', 'circle-2').",
    "rf_focal_min" -> "rf_focal_min(tile, neighborhood) - Focal minimum over the neighborhood.",
    "rf_focal_max" -> "rf_focal_max(tile, neighborhood) - Focal maximum over the neighborhood.",
    "rf_focal_median" -> "rf_focal_median(tile, neighborhood) - Focal median over the neighborhood.",
    "rf_focal_mode" -> "rf_focal_mode(tile, neighborhood) - Focal mode over the neighborhood.",
    "rf_focal_stddev" -> "rf_focal_stddev(tile, neighborhood) - Focal standard deviation over the neighborhood.",
    "rf_focal_moransi" -> "rf_focal_moransi(tile, neighborhood) - Local Moran's I spatial autocorrelation statistic.",
    "rf_convolve" -> "rf_convolve(tile, kernel_array) - Convolves the tile with the given square kernel.",
    "rf_slope" -> "rf_slope(tile, z_factor) - Terrain slope in degrees from an elevation tile.",
    "rf_aspect" -> "rf_aspect(tile) - Terrain aspect in degrees from an elevation tile.",
    "rf_hillshade" -> "rf_hillshade(tile, azimuth, altitude, z_factor) - Hillshade rendering of an elevation tile.")

  /** Optional Examples blocks (DESCRIBE FUNCTION EXTENDED), Spark format. */
  val examples: Map[String, String] = Map(
    "rf_local_add" ->
      """
        |    Examples:
        |      > SELECT rf_tile_sum(rf_local_add(rf_make_ones_tile(2, 2, 'float64'), 2.0));
        |       12.0""".stripMargin,
    "rf_tile_sum" ->
      """
        |    Examples:
        |      > SELECT rf_tile_sum(rf_make_constant_tile(7.0, 2, 2, 'float64'));
        |       28.0""".stripMargin,
    "rf_mask_by_bit" ->
      """
        |    Examples:
        |      > SELECT rf_tile_sum(rf_mask_by_bit(data_tile, qa_tile, 4, true)) FROM scenes;
        |       -- sum over cells whose QA bit 4 (e.g. cloud) is clear""".stripMargin,
    "rf_explode_tiles" ->
      """
        |    Examples:
        |      > SELECT rf_explode_tiles(rf_make_ones_tile(1, 2, 'uint8'));
        |       0	0	1.0
        |       0	1	1.0""".stripMargin,
    "rf_assemble_tile" ->
      """
        |    Examples:
        |      > SELECT rf_assemble_tile(column_index, row_index, value, 256, 256, 'uint16') FROM cells GROUP BY tile_id;""".stripMargin,
    "st_extent" ->
      """
        |    Examples:
        |      > SELECT st_extent(st_geomfromwkt('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'));
        |       {"xmin":0.0,"ymin":0.0,"xmax":4.0,"ymax":4.0}""".stripMargin)
}
