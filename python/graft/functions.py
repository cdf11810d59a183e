"""Column-function mirrors of the graft ``rf_*``/``st_*`` surface.

Counterpart of the reference's pyrasterframes.rasterfunctions
(/root/reference/python/pyrasterframes/rasterfunctions.py). Every
wrapper delegates to the SQL-registered Catalyst expression via
``call_function`` — no Python UDFs, so nothing here leaves the JVM on
the hot path. ``graft.init(spark)`` must run first.
"""

from pyspark.sql.column import Column
from pyspark.sql.functions import call_function, lit


def _c(v):
    """Columns pass through; python scalars become literals."""
    return v if isinstance(v, Column) else lit(v)


def _fn(name, *args):
    return call_function(name, *[_c(a) for a in args])


# --- constructors / converters -------------------------------------------
def rf_make_constant_tile(value, cols, rows, cell_type):
    """Create a `cols` x `rows` tile with all cells set to `value`."""
    return _fn("rf_make_constant_tile", value, cols, rows, cell_type)


def rf_make_zeros_tile(cols, rows, cell_type="float64"):
    """Create a tile of zeros."""
    return _fn("rf_make_zeros_tile", cols, rows, cell_type)


def rf_make_ones_tile(cols, rows, cell_type="float64"):
    """Create a tile of ones."""
    return _fn("rf_make_ones_tile", cols, rows, cell_type)


def rf_array_to_tile(array_col, cols, rows):
    """Convert a numeric array column into a tile."""
    return _fn("rf_array_to_tile", array_col, cols, rows)


def rf_tile_to_array_double(tile):
    """Flatten a tile into an array of doubles."""
    return _fn("rf_tile_to_array_double", tile)


def rf_tile_to_array_int(tile):
    """Flatten a tile into an array of integers."""
    return _fn("rf_tile_to_array_int", tile)


def rf_convert_cell_type(tile, cell_type):
    """Convert the storage cell type, translating NoData."""
    return _fn("rf_convert_cell_type", tile, cell_type)


def rf_interpret_cell_type_as(tile, cell_type):
    """Reinterpret raw cell bytes as another cell type."""
    return _fn("rf_interpret_cell_type_as", tile, cell_type)


def rf_with_no_data(tile, no_data):
    """Mark `no_data` as the NoData sentinel of the tile."""
    return _fn("rf_with_no_data", tile, no_data)


def rf_tile(tile):
    """Realize a lazy tile reference into a materialized tile."""
    return _fn("rf_tile", tile)


def rf_crop(tile, col_off, row_off, cols, rows):
    """Crop the tile to a grid window."""
    return _fn("rf_crop", tile, col_off, row_off, cols, rows)


def rf_cell_type(tile):
    """Cell type name of the tile."""
    return _fn("rf_cell_type", tile)


def rf_dimensions(tile):
    """(cols, rows) struct of the tile."""
    return _fn("rf_dimensions", tile)


# --- local map algebra ----------------------------------------------------
def rf_local_add(a, b):
    """Cell-wise addition (tile+tile or tile+scalar)."""
    return _fn("rf_local_add", a, b)


def rf_local_subtract(a, b):
    """Cell-wise subtraction."""
    return _fn("rf_local_subtract", a, b)


def rf_local_multiply(a, b):
    """Cell-wise multiplication."""
    return _fn("rf_local_multiply", a, b)


def rf_local_divide(a, b):
    """Cell-wise division."""
    return _fn("rf_local_divide", a, b)


def rf_local_min(a, b):
    """Cell-wise minimum."""
    return _fn("rf_local_min", a, b)


def rf_local_max(a, b):
    """Cell-wise maximum."""
    return _fn("rf_local_max", a, b)


def rf_local_clamp(tile, lo, hi):
    """Clamp cells into [lo, hi]."""
    return _fn("rf_local_clamp", tile, lo, hi)


def rf_where(condition, x, y):
    """Cell-wise conditional select."""
    return _fn("rf_where", condition, x, y)


def rf_normalized_difference(a, b):
    """(a - b) / (a + b), e.g. NDVI."""
    return _fn("rf_normalized_difference", a, b)


def rf_standardize(tile, mean, stddev):
    """(x - mean) / stddev per cell."""
    return _fn("rf_standardize", tile, mean, stddev)


def rf_rescale(tile, min_val, max_val):
    """Rescale cells into [0, 1]."""
    return _fn("rf_rescale", tile, min_val, max_val)


def rf_abs(tile):
    """Absolute value per cell."""
    return _fn("rf_abs", tile)


def rf_sqrt(tile):
    """Square root per cell."""
    return _fn("rf_sqrt", tile)


def rf_log(tile):
    """Natural log per cell."""
    return _fn("rf_log", tile)


def rf_exp(tile):
    """e**x per cell."""
    return _fn("rf_exp", tile)


def rf_round(tile):
    """Round per cell."""
    return _fn("rf_round", tile)


def rf_local_less(a, b):
    """Cell-wise a < b (0/1 tile)."""
    return _fn("rf_local_less", a, b)


def rf_local_greater(a, b):
    """Cell-wise a > b (0/1 tile)."""
    return _fn("rf_local_greater", a, b)


def rf_local_equal(a, b):
    """Cell-wise a == b (0/1 tile)."""
    return _fn("rf_local_equal", a, b)


def rf_local_unequal(a, b):
    """Cell-wise a != b (0/1 tile)."""
    return _fn("rf_local_unequal", a, b)


def rf_local_is_in(tile, values):
    """Cell-wise membership in `values` (0/1 tile)."""
    return _fn("rf_local_is_in", tile, values)


def rf_local_no_data(tile):
    """1 where NoData, else 0."""
    return _fn("rf_local_no_data", tile)


def rf_local_data(tile):
    """1 where data, else 0."""
    return _fn("rf_local_data", tile)


# --- masking --------------------------------------------------------------
def rf_mask(target, mask):
    """NoData target where mask is NoData."""
    return _fn("rf_mask", target, mask)


def rf_inverse_mask(target, mask):
    """NoData target where mask holds data."""
    return _fn("rf_inverse_mask", target, mask)


def rf_mask_by_value(target, mask, value):
    """NoData target where mask equals value."""
    return _fn("rf_mask_by_value", target, mask, value)


def rf_inverse_mask_by_value(target, mask, value):
    """NoData target where mask does not equal value."""
    return _fn("rf_inverse_mask_by_value", target, mask, value)


def rf_mask_by_values(target, mask, values):
    """NoData target where mask value is in `values`."""
    return _fn("rf_mask_by_values", target, mask, values)


def rf_mask_by_bit(target, mask, bit_position, value_to_mask):
    """QA-bit masking: NoData target where mask bit equals value."""
    return _fn("rf_mask_by_bit", target, mask, bit_position, 1 if value_to_mask else 0)


def rf_mask_by_bits(target, mask, start_bit, num_bits, values_to_mask):
    """NoData target where extracted mask bits fall in `values_to_mask`."""
    return _fn("rf_mask_by_bits", target, mask, start_bit, num_bits, values_to_mask)


def rf_local_extract_bits(tile, start_bit, num_bits=1):
    """Extract a bit field from each cell."""
    return _fn("rf_local_extract_bits", tile, start_bit, num_bits)


def rf_local_extract_bit(tile, bit_position):
    """Extract the single bit at bit_position of each cell (alias of
    rf_local_extract_bits with num_bits=1)."""
    return _fn("rf_local_extract_bit", tile, bit_position)


def rf_cell_types():
    """Array of supported cell type names, narrowest storage width
    first (constant)."""
    return _fn("rf_cell_types")


# --- per-tile statistics --------------------------------------------------
def rf_tile_sum(tile):
    """Sum of data cells."""
    return _fn("rf_tile_sum", tile)


def rf_tile_mean(tile):
    """Mean of data cells."""
    return _fn("rf_tile_mean", tile)


def rf_tile_min(tile):
    """Minimum of data cells."""
    return _fn("rf_tile_min", tile)


def rf_tile_max(tile):
    """Maximum of data cells."""
    return _fn("rf_tile_max", tile)


def rf_tile_stats(tile):
    """(data_cells, no_data_cells, min, max, mean, variance) struct."""
    return _fn("rf_tile_stats", tile)


def rf_tile_histogram(tile):
    """(value, count) histogram array."""
    return _fn("rf_tile_histogram", tile)


def rf_data_cells(tile):
    """Count of data cells."""
    return _fn("rf_data_cells", tile)


def rf_no_data_cells(tile):
    """Count of NoData cells."""
    return _fn("rf_no_data_cells", tile)


def rf_is_no_data_tile(tile):
    """True if the tile is entirely NoData."""
    return _fn("rf_is_no_data_tile", tile)


def rf_exists(tile):
    """True if any cell is nonzero."""
    return _fn("rf_exists", tile)


def rf_for_all(tile):
    """True if all data cells are nonzero."""
    return _fn("rf_for_all", tile)


def rf_log10(tile):
    """Base-10 log per cell."""
    return _fn("rf_log10", tile)


def rf_log2(tile):
    """Base-2 log per cell."""
    return _fn("rf_log2", tile)


def rf_log1p(tile):
    """log(1 + x) per cell."""
    return _fn("rf_log1p", tile)


def rf_exp10(tile):
    """10**x per cell."""
    return _fn("rf_exp10", tile)


def rf_exp2(tile):
    """2**x per cell."""
    return _fn("rf_exp2", tile)


def rf_expm1(tile):
    """e**x - 1 per cell."""
    return _fn("rf_expm1", tile)


def rf_identity(tile):
    """The tile unchanged."""
    return _fn("rf_identity", tile)


def rf_local_less_equal(a, b):
    """Cell-wise a <= b (0/1 tile)."""
    return _fn("rf_local_less_equal", a, b)


def rf_local_greater_equal(a, b):
    """Cell-wise a >= b (0/1 tile)."""
    return _fn("rf_local_greater_equal", a, b)


# --- generators / assembly ------------------------------------------------
def rf_explode_tiles(*tiles):
    """One row per cell: column_index, row_index, one value per tile."""
    return _fn("rf_explode_tiles", *tiles)


def rf_explode_tiles_sample(fraction, seed, *tiles):
    """Deterministically sampled rf_explode_tiles."""
    return _fn("rf_explode_tiles_sample", fraction, seed, *tiles)


def rf_assemble_tile(col_index, row_index, value, cols, rows, cell_type=None):
    """Assemble exploded cells back into a tile (optionally cell-typed)."""
    if cell_type is None:
        return _fn("rf_assemble_tile", col_index, row_index, value, cols, rows)
    return _fn("rf_assemble_tile", col_index, row_index, value, cols, rows, cell_type)


# --- aggregates -----------------------------------------------------------
def rf_agg_mean(tile):
    """Aggregate mean over all cells of the group."""
    return _fn("rf_agg_mean", tile)


def rf_agg_data_cells(tile):
    """Aggregate data-cell count of the group."""
    return _fn("rf_agg_data_cells", tile)


def rf_agg_no_data_cells(tile):
    """Aggregate NoData count of the group."""
    return _fn("rf_agg_no_data_cells", tile)


def rf_agg_stats(tile):
    """Aggregate stats struct over all cells of the group."""
    return _fn("rf_agg_stats", tile)


def rf_agg_approx_histogram(tile):
    """Approximate aggregate histogram of the group."""
    return _fn("rf_agg_approx_histogram", tile)


def rf_agg_local_min(tile):
    """Cell-wise min across the group's tiles."""
    return _fn("rf_agg_local_min", tile)


def rf_agg_local_max(tile):
    """Cell-wise max across the group's tiles."""
    return _fn("rf_agg_local_max", tile)


def rf_agg_local_mean(tile):
    """Cell-wise mean across the group's tiles."""
    return _fn("rf_agg_local_mean", tile)


# --- focal / terrain ------------------------------------------------------
def rf_focal_mean(tile, neighborhood):
    """Focal mean over a neighborhood such as 'square-1'."""
    return _fn("rf_focal_mean", tile, neighborhood)


def rf_focal_min(tile, neighborhood):
    """Focal min."""
    return _fn("rf_focal_min", tile, neighborhood)


def rf_focal_max(tile, neighborhood):
    """Focal max."""
    return _fn("rf_focal_max", tile, neighborhood)


def rf_slope(tile, z_factor=1.0):
    """Terrain slope in degrees."""
    return _fn("rf_slope", tile, z_factor)


def rf_aspect(tile):
    """Terrain aspect in degrees."""
    return _fn("rf_aspect", tile)


def rf_hillshade(tile, azimuth=315.0, altitude=45.0, z_factor=1.0):
    """Hillshade rendering of elevation."""
    return _fn("rf_hillshade", tile, azimuth, altitude, z_factor)


def rf_agg_approx_quantiles(tile, probabilities):
    """Approximate cell-value quantiles across the group."""
    return _fn("rf_agg_approx_quantiles", tile, probabilities)


def rf_agg_local_data_cells(tile):
    """Cell-wise data-cell counts across the group's tiles."""
    return _fn("rf_agg_local_data_cells", tile)


def rf_agg_local_no_data_cells(tile):
    """Cell-wise NoData counts across the group's tiles."""
    return _fn("rf_agg_local_no_data_cells", tile)


def rf_agg_local_stats(tile):
    """Cell-wise stats tiles across the group."""
    return _fn("rf_agg_local_stats", tile)


def rf_agg_overview_raster(proj_raster, cols, rows, xmin, ymin, xmax, ymax, crs):
    """Aggregate tiles into one overview raster over the destination grid."""
    return _fn("rf_agg_overview_raster", proj_raster, cols, rows, xmin, ymin, xmax, ymax, crs)


# --- projected raster -----------------------------------------------------
def rf_proj_raster(tile, extent, crs):
    """Bundle tile + extent + CRS into a projected raster struct."""
    return _fn("rf_proj_raster", tile, extent, crs)


def rf_extent(proj_raster):
    """Extent struct of a projected raster."""
    return _fn("rf_extent", proj_raster)


def rf_crs(proj_raster):
    """CRS identifier of a projected raster."""
    return _fn("rf_crs", proj_raster)


def rf_geometry(proj_raster):
    """Footprint polygon of a projected raster."""
    return _fn("rf_geometry", proj_raster)


def rf_tile_context(proj_raster):
    """(extent, crs) context struct of a projected raster."""
    return _fn("rf_tile_context", proj_raster)


def rf_reproject_and_merge(tiles, extents, crss, dst_extent, dst_crs, cols,
                           rows, method="nearest"):
    """Reproject and mosaic tile arrays onto a destination grid with the
    given point-interpolation resample method."""
    return _fn("rf_reproject_and_merge", tiles, extents, crss, dst_extent,
               dst_crs, cols, rows, method)


def rf_resample(tile, factor_or_tile, method="bilinear"):
    """Resample by factor or to a target tile's grid. Methods: nearest,
    bilinear, cubic_convolution, cubic_spline, lanczos, and the
    aggregate family average/mode/median/max/min/sum."""
    return _fn("rf_resample", tile, factor_or_tile, method)


def rf_resample_nearest(tile, factor):
    """Nearest-neighbor resample by factor."""
    return _fn("rf_resample_nearest", tile, factor)


# --- focal / rendering ----------------------------------------------------
def rf_focal_median(tile, neighborhood):
    """Focal median."""
    return _fn("rf_focal_median", tile, neighborhood)


def rf_focal_mode(tile, neighborhood):
    """Focal mode."""
    return _fn("rf_focal_mode", tile, neighborhood)


def rf_focal_stddev(tile, neighborhood):
    """Focal standard deviation."""
    return _fn("rf_focal_stddev", tile, neighborhood)


def rf_focal_moransi(tile, neighborhood):
    """Local Moran's I."""
    return _fn("rf_focal_moransi", tile, neighborhood)


def rf_convolve(tile, kernel):
    """Convolve with a square kernel given as a flat array."""
    return _fn("rf_convolve", tile, kernel)


def rf_render_ascii(tile):
    """ASCII-art rendering."""
    return _fn("rf_render_ascii", tile)


def rf_render_matrix(tile):
    """Cell-value matrix string."""
    return _fn("rf_render_matrix", tile)


def rf_cell_types():
    """The standard cell type names (8 bases, plus ``ud<N>`` user-NoData
    variants accepted anywhere a cell type string is)."""
    return ["bool", "int8raw", "int8", "uint8raw", "uint8", "int16raw", "int16",
            "uint16raw", "uint16", "int32raw", "int32", "float32raw", "float32",
            "float64raw", "float64"]


def rf_agg_extent(extent):
    """Aggregate extent union — min/max composition over the struct fields."""
    from pyspark.sql.functions import struct, min as fmin, max as fmax
    return struct(
        fmin(extent.getField("xmin")).alias("xmin"),
        fmin(extent.getField("ymin")).alias("ymin"),
        fmax(extent.getField("xmax")).alias("xmax"),
        fmax(extent.getField("ymax")).alias("ymax"))


def rf_agg_reprojected_extent(extent, src_crs, dest_crs):
    """Aggregate extent union after reprojecting each row into ``dest_crs``."""
    return rf_agg_extent(
        st_extent(st_reproject(st_geometry(extent), src_crs, dest_crs)))


def rf_focal_std_dev(tile, neighborhood):
    """Reference-name alias of :func:`rf_focal_stddev`."""
    return rf_focal_stddev(tile, neighborhood)


def rf_moransI(tile, neighborhood):
    """Reference-name alias of :func:`rf_focal_moransi`."""
    return rf_focal_moransi(tile, neighborhood)


def rf_render_color_ramp_png(tile, color_ramp_name):
    """Reference-name alias: render through a named color ramp."""
    return _fn("rf_render_png", tile, color_ramp_name)


def rf_render_png(tile, green=None, blue=None, color_ramp=None):
    """PNG bytes: RGB composite of three band tiles, a single tile
    through a named color ramp (``color_ramp="Viridis"``), or a single
    tile as a grayscale min-max stretch."""
    if green is not None and blue is not None:
        return _fn("rf_render_png", tile, green, blue)
    if green is not None or blue is not None:
        raise ValueError("rf_render_png needs both green and blue for the RGB form")
    if color_ramp is not None:
        return _fn("rf_render_png", tile, color_ramp)
    return _fn("rf_render_png", tile)


def rf_mk_crs(crs_text):
    """Normalized CRS identifier from text, e.g. ``rf_mk_crs('EPSG:4326')``."""
    return _fn("rf_mk_crs", crs_text)


def rf_rgb_composite(red, green, blue):
    """Pack three tiles into an RGB int32 composite."""
    return _fn("rf_rgb_composite", red, green, blue)


# --- vector ---------------------------------------------------------------
def st_geomFromGeoJSON(json_str):
    """Parse GeoJSON into a geometry."""
    return _fn("st_geomfromgeojson", json_str)


def st_length(geom):
    """Planar length/perimeter."""
    return _fn("st_length", geom)


def st_buffer(geom, distance):
    """Buffered geometry."""
    return _fn("st_buffer", geom, distance)


def st_distance(a, b):
    """Euclidean distance between two geometries in shared CRS units."""
    return _fn("st_distance", a, b)


def st_withinDistance(a, b, distance):
    """True when the geometries lie within `distance` of each other."""
    return _fn("st_within_distance", a, b, distance)


# exact-SQL-name alias (the camelCase fold drops the inner underscore)
st_within_distance = st_withinDistance


def st_convexHull(geom):
    """Convex hull of the geometry."""
    return _fn("st_convexhull", geom)


def st_intersection(a, b):
    """Geometric intersection of the two geometries."""
    return _fn("st_intersection", a, b)


def st_union(a, b):
    """Geometric union of the two geometries."""
    return _fn("st_union", a, b)


def st_difference(a, b):
    """Part of geometry a not in geometry b."""
    return _fn("st_difference", a, b)


def st_nPoints(geom):
    """Number of vertices in the geometry."""
    return _fn("st_npoints", geom)


def st_isEmpty(geom):
    """True when the geometry is empty."""
    return _fn("st_isempty", geom)


def st_isValid(geom):
    """OGC validity of the geometry."""
    return _fn("st_isvalid", geom)


def st_simplify(geom, tolerance):
    """Douglas-Peucker simplification with the given tolerance."""
    return _fn("st_simplify", geom, tolerance)


def st_covers(a, b):
    """True where a covers b."""
    return _fn("st_covers", a, b)


def st_crosses(a, b):
    """True where a crosses b."""
    return _fn("st_crosses", a, b)


def st_disjoint(a, b):
    """True where a and b are disjoint."""
    return _fn("st_disjoint", a, b)


def st_overlaps(a, b):
    """True where a overlaps b."""
    return _fn("st_overlaps", a, b)


def st_touches(a, b):
    """True where a touches b."""
    return _fn("st_touches", a, b)



def st_geomFromWKT(wkt):
    """Parse WKT into a geometry."""
    return _fn("st_geomfromwkt", wkt)


def st_asText(geom):
    """Geometry as WKT."""
    return _fn("st_astext", geom)


def st_makePoint(x, y):
    """Point geometry from coordinates."""
    return _fn("st_makepoint", x, y)


def st_centroid(geom):
    """Centroid of the geometry."""
    return _fn("st_centroid", geom)


def st_area(geom):
    """Planar area."""
    return _fn("st_area", geom)


def st_x(point):
    """X coordinate of a point."""
    return _fn("st_x", point)


def st_y(point):
    """Y coordinate of a point."""
    return _fn("st_y", point)


def st_extent(geom):
    """Bounding-box extent struct of the geometry."""
    return _fn("st_extent", geom)


def st_geometry(extent):
    """Extent struct as a polygon geometry."""
    return _fn("st_geometry", extent)


def st_geometryType(geom):
    """JTS type name of the geometry ('Point', 'LineString', ...)."""
    return _fn("st_geometrytype", geom)


def st_numGeometries(geom):
    """Number of member geometries (1 for a simple geometry)."""
    return _fn("st_numgeometries", geom)


def st_pointN(line, n):
    """1-based nth vertex of a LineString (negative n from the end)."""
    return _fn("st_pointn", line, n)


def st_exteriorRing(polygon):
    """Exterior ring of a polygon as a LineString."""
    return _fn("st_exteriorring", polygon)


def st_translate(geom, dx, dy):
    """Geometry rigidly translated by (dx, dy)."""
    return _fn("st_translate", geom, dx, dy)


def st_closestPoint(a, b):
    """Point on a nearest to b."""
    return _fn("st_closestpoint", a, b)


def st_boundary(geom):
    """Topological boundary: polygon rings as lines, line endpoints as points."""
    return _fn("st_boundary", geom)


def st_dimension(geom):
    """Topological dimension: 0 point, 1 line, 2 polygon."""
    return _fn("st_dimension", geom)


def st_coordDim(geom):
    """Coordinate dimension: 2 unless a vertex carries a real Z."""
    return _fn("st_coorddim", geom)


def st_isClosed(geom):
    """True when a (multi)line starts and ends at the same point."""
    return _fn("st_isclosed", geom)


def st_isCollection(geom):
    """True when the geometry is a collection (Multi* or GeometryCollection)."""
    return _fn("st_iscollection", geom)


def st_isRing(line):
    """True when the line is a ring (closed and simple); NULL for non-lines."""
    return _fn("st_isring", line)


def st_isSimple(geom):
    """OGC simplicity: no self-intersection or self-tangency."""
    return _fn("st_issimple", geom)


def st_numPoints(geom):
    """Total vertex count (alias of st_npoints, the spark-jts name)."""
    return _fn("st_numpoints", geom)


def st_geometryN(geom, n):
    """1-based nth member of a collection; NULL out of range."""
    return _fn("st_geometryn", geom, n)


def st_interiorRingN(polygon, n):
    """1-based nth interior ring as a LineString; NULL out of range."""
    return _fn("st_interiorringn", polygon, n)


def st_envelope(geom):
    """Envelope as a geometry (degenerate inputs give point/line)."""
    return _fn("st_envelope", geom)


def st_makeLine(points):
    """LineString through an array of points, in array order."""
    return _fn("st_makeline", points)


def st_makePolygon(shell):
    """Polygon from a closed LineString shell."""
    return _fn("st_makepolygon", shell)


def st_polygon(shell):
    """Polygon from a closed LineString (reference-name alias of
    :func:`st_makePolygon`)."""
    return _fn("st_makepolygon", shell)


def st_asBinary(geom):
    """WKB bytes of a geometry (delegates to Spark 4.1's built-in)."""
    return _fn("st_asbinary", geom)


def st_geomFromWKB(wkb):
    """Geometry from WKB bytes (delegates to Spark 4.1's built-in)."""
    return _fn("st_geomfromwkb", wkb)


def st_pointFromWKB(wkb):
    """Point geometry from WKB bytes (the WKB already encodes the type;
    delegates to Spark 4.1's built-in reader)."""
    return _fn("st_geomfromwkb", wkb)


def st_makeBox2D(corner_a, corner_b):
    """Axis-aligned box polygon spanning the two corner points."""
    return _fn("st_makebox2d", corner_a, corner_b)


def st_point(x, y):
    """Point geometry from coordinates (alias of st_makepoint)."""
    return _fn("st_point", x, y)


def st_castToPoint(geom):
    """The geometry when it is a Point, else NULL."""
    return _fn("st_casttopoint", geom)


def st_castToLineString(geom):
    """The geometry when it is a LineString, else NULL."""
    return _fn("st_casttolinestring", geom)


def st_castToPolygon(geom):
    """The geometry when it is a Polygon, else NULL."""
    return _fn("st_casttopolygon", geom)


def st_castToGeometry(geom):
    """The geometry unchanged (type-widening cast)."""
    return _fn("st_casttogeometry", geom)


def st_byteArray(s):
    """UTF-8 bytes of the string."""
    return _fn("st_bytearray", s)


def st_asGeoJSON(geom):
    """GeoJSON geometry fragment (RFC 7946, no whitespace)."""
    return _fn("st_asgeojson", geom)


def st_asLatLonText(point):
    """Point as DMS text, latitude then longitude."""
    return _fn("st_aslatlontext", point)


def st_distanceSphere(a, b):
    """Great-circle distance in meters between two lon/lat points."""
    return _fn("st_distancesphere", a, b)


def st_lengthSphere(line):
    """Great-circle length in meters of a lon/lat LineString."""
    return _fn("st_lengthsphere", line)


def st_aggregateDistanceSphere(points):
    """Total great-circle distance in meters along an array of lon/lat
    points (sum of consecutive st_distanceSphere legs); 0 for fewer
    than two points."""
    return _fn("st_aggregate_distance_sphere", points)


def st_relate(a, b):
    """DE-9IM intersection matrix of the two geometries as its 9-char string."""
    return _fn("st_relate", a, b)


def st_relateBool(a, b, pattern):
    """True when the DE-9IM matrix matches the pattern."""
    return _fn("st_relatebool", a, b, pattern)


def st_geoHash(geom, precision):
    """Geohash of a lon/lat geometry at the given character precision."""
    return _fn("st_geohash", geom, precision)


def st_geomFromGeoHash(hash_col):
    """Geohash cell as its bounding-box polygon."""
    return _fn("st_geomfromgeohash", hash_col)


def st_pointFromGeoHash(hash_col):
    """Geohash cell center as a point."""
    return _fn("st_pointfromgeohash", hash_col)


def st_geomFromText(wkt):
    """Geometry from WKT (alias of st_geomFromWKT)."""
    return _fn("st_geomfromtext", wkt)


def st_pointFromText(wkt):
    """Point from WKT; NULL when the text is a different geometry type."""
    return _fn("st_pointfromtext", wkt)


def st_lineFromText(wkt):
    """LineString from WKT; NULL when the text is a different geometry type."""
    return _fn("st_linefromtext", wkt)


def st_polygonFromText(wkt):
    """Polygon from WKT; NULL when the text is a different geometry type."""
    return _fn("st_polygonfromtext", wkt)


def st_makeBBOX(xmin, ymin, xmax, ymax):
    """Axis-aligned box polygon from four coordinate bounds."""
    return _fn("st_makebbox", xmin, ymin, xmax, ymax)


def st_bufferPoint(point, meters):
    """Geodesic buffer of a lon/lat point (64-gon at the great-circle radius)."""
    return _fn("st_bufferpoint", point, meters)


def st_antimeridianSafeGeom(geom):
    """Splits a geometry crossing the +-180 line into parts on each side."""
    return _fn("st_antimeridiansafegeom", geom)


def st_idlSafeGeom(geom):
    """Alias of st_antimeridianSafeGeom."""
    return _fn("st_idlsafegeom", geom)


def st_equals(a, b):
    """True when the two geometries are topologically equal."""
    return _fn("st_equals", a, b)


def st_mPointFromText(wkt):
    """MultiPoint from WKT; NULL when the text is a different geometry type."""
    return _fn("st_mpointfromtext", wkt)


def st_mLineFromText(wkt):
    """MultiLineString from WKT; NULL when the text is a different geometry type."""
    return _fn("st_mlinefromtext", wkt)


def st_mPolyFromText(wkt):
    """MultiPolygon from WKT; NULL when the text is a different geometry type."""
    return _fn("st_mpolyfromtext", wkt)


def st_makePointM(x, y, m):
    """Point with a measure (M) coordinate; WKT output stays XY."""
    return _fn("st_makepointm", x, y, m)


def st_distanceSpheroid(a, b):
    """Ellipsoidal WGS84 (Vincenty) distance in meters between two lon/lat points."""
    return _fn("st_distancespheroid", a, b)


def st_lengthSpheroid(line):
    """Ellipsoidal WGS84 (Vincenty) length in meters of a lon/lat LineString."""
    return _fn("st_lengthspheroid", line)


def rf_envelope(geom):
    """JTS envelope struct (minx, maxx, miny, maxy)."""
    return _fn("rf_envelope", geom)


def st_reproject(geom, src_crs, dst_crs):
    """Reproject geometry coordinates between CRSs."""
    return _fn("st_reproject", geom, src_crs, dst_crs)


def st_intersects(a, b):
    """True where a intersects b."""
    return _fn("st_intersects", a, b)


def st_contains(a, b):
    """True where a contains b."""
    return _fn("st_contains", a, b)


def st_within(a, b):
    """True where a is within b."""
    return _fn("st_within", a, b)


def rf_z2_index(geom, crs):
    """Z2 space-filling-curve index."""
    return _fn("rf_z2_index", geom, crs)


def rf_xz2_index(geom, crs):
    """XZ2 space-filling-curve index."""
    return _fn("rf_xz2_index", geom, crs)


def rf_hilbert_index(geom, crs):
    """Hilbert space-filling-curve index of the geometry centroid
    (order 16): locality-first alternative to rf_z2_index -- consecutive
    cells are always grid-adjacent."""
    return _fn("rf_hilbert_index", geom, crs)


def rf_rasterize(geom, bounds, value, cols, rows):
    """Burn a geometry into a tile."""
    return _fn("rf_rasterize", geom, bounds, value, cols, rows)


# --- multimodal binary-column ops ----------------------------------------
def mm_decode_image(blob):
    """Decode an image payload via the JVM's javax.imageio codecs to a
    (width, height, channels, byte_len) struct; NULL for unreadable bytes."""
    return _fn("mm_decode_image", blob)


def mm_decode_image_stub(blob):
    """Deterministic pseudo-decode of any payload (plumbing tests only)."""
    return _fn("mm_decode_image_stub", blob)


def mm_encode_png(pixels, width, height):
    """Encode a row-major array of packed 0xRRGGBB ints into a PNG payload."""
    return _fn("mm_encode_png", pixels, width, height)


def mm_image_pixel(blob, x, y):
    """Packed 0xRRGGBB of pixel (x, y); NULL on decode failure or OOB."""
    return _fn("mm_image_pixel", blob, x, y)


def mm_png_stats(blob):
    """(width, height, opaque, red_sum) summary struct of a decodable image."""
    return _fn("mm_png_stats", blob)


def mm_image_ahash(blob):
    """64-bit average-hash (aHash) image near-dup fingerprint; compare
    with bit_count(a ^ b) Hamming distance."""
    return _fn("mm_image_ahash", blob)


def mm_wav_energy(blob, window):
    """Per-window energy (exact long sum of squared samples) of a PCM16
    WAV payload — the silence-split / voice-activity primitive."""
    return _fn("mm_wav_energy", blob, window)


def mm_byte_histogram(blob, bins=16):
    """Normalized byte-value histogram of the payload."""
    return _fn("mm_byte_histogram", blob, bins)


def mm_frame_deltas(blob, frame_size, stride, bins=16):
    """L1 distances between consecutive frames' byte histograms
    (integer counts) -- the scene-change primitive over framed binary
    streams; one entry per adjacent frame pair."""
    return _fn("mm_frame_deltas", blob, frame_size, stride, bins)


def mm_frame_sample(blob, frame_size, stride):
    """Every stride-th frame_size-byte window as an array of binaries."""
    return _fn("mm_frame_sample", blob, frame_size, stride)


def mm_wav_synth(seed, n):
    """Deterministic PCM16 WAV fixture: canonical RIFF header (mono,
    16 kHz) + n closed-form samples."""
    return _fn("mm_wav_synth", seed, n)


def mm_wav_stats(blob):
    """Real PCM16 WAV parse: (sample_rate, channels, n_samples, min_s,
    max_s, sum_s); NULL for non-PCM16 payloads."""
    return _fn("mm_wav_stats", blob)


# --- training-data pipeline (pl_*) ---------------------------------------
def pl_token_count(text):
    """Number of whitespace-separated tokens."""
    return _fn("pl_token_count", text)


def pl_char_count(text):
    """Number of characters."""
    return _fn("pl_char_count", text)


def pl_punct_ratio(text):
    """Fraction of characters that are punctuation."""
    return _fn("pl_punct_ratio", text)


def pl_distinct_ratio(text):
    """Distinct tokens / total tokens (type-token ratio)."""
    return _fn("pl_distinct_ratio", text)


def pl_quality_score(text):
    """Heuristic document quality score in [0, 1]."""
    return _fn("pl_quality_score", text)


def pl_language_id(text):
    """Best-guess ISO language code from stopword profiles."""
    return _fn("pl_language_id", text)


def pl_fingerprint(text):
    """64-bit rolling document fingerprint."""
    return _fn("pl_fingerprint", text)


def pl_script_counts(text):
    """Unicode script composition: struct of codepoint counts (latin,
    digit, cjk, cyrillic, arabic, space, other)."""
    return _fn("pl_script_counts", text)


def pl_simhash(text):
    """64-bit SimHash of the whitespace tokens."""
    return _fn("pl_simhash", text)


def pl_repetition_ratio(text, n=3):
    """1 - distinct/total n-gram ratio; high values flag boilerplate."""
    return _fn("pl_repetition_ratio", text, n)


def pl_minhash(text, num_hashes=32, shingle=3):
    """MinHash signature as an array of longs."""
    return _fn("pl_minhash", text, num_hashes, shingle)


def pl_distinct_ngrams(tokens, n=3):
    """Distinct n-grams of a token array, in first-seen order."""
    return _fn("pl_distinct_ngrams", tokens, n)


def pl_ngrams(tokens, n=2):
    """All n-grams of a token array with multiplicity (strict windows)."""
    return _fn("pl_ngrams", tokens, n)


def pl_mix64(x):
    """splitmix64 finalizer; a stable pseudo-random sort key."""
    return _fn("pl_mix64", x)


def pl_vector_dot(a, b):
    """Dot product of two float/double array vectors."""
    return _fn("pl_vector_dot", a, b)


def pl_cosine_similarity(a, b):
    """Cosine similarity of two float/double array vectors."""
    return _fn("pl_cosine_similarity", a, b)


def pl_pii_emails(text):
    """Every email-address span, as an array of strings."""
    return _fn("pl_pii_emails", text)


def pl_pii_ipv4s(text):
    """Every dotted-quad IPv4 span, as an array of strings."""
    return _fn("pl_pii_ipv4s", text)


def pl_pii_phones(text):
    """Every NNN-NNN-NNNN phone span, as an array of strings."""
    return _fn("pl_pii_phones", text)


def pl_pii_count(text):
    """Total count of email, IPv4, and phone spans."""
    return _fn("pl_pii_count", text)


def pl_redact_pii(text):
    """Text with email/IPv4/phone spans replaced by typed placeholders."""
    return _fn("pl_redact_pii", text)


def mm_image_resize(blob, width, height):
    """Nearest-neighbor resize of a decodable image, re-encoded as PNG."""
    return _fn("mm_image_resize", blob, width, height)


def pl_bloom_agg(hash_col, num_bits=1 << 20, k=5):
    """Aggregate 64-bit key hashes into a Bloom bitset (array of longs)."""
    return _fn("pl_bloom_agg", hash_col, num_bits, k)


def pl_bloom_contains(bits, hash_col, k=5):
    """Probe a literal Bloom bitset; False means certainly absent."""
    return _fn("pl_bloom_contains", bits, hash_col, k)


def pl_nfc(text):
    """Unicode NFC (canonical composition) normalization."""
    return _fn("pl_nfc", text)


def pl_nfkc(text):
    """Unicode NFKC (compatibility composition) normalization."""
    return _fn("pl_nfkc", text)


def pl_unicode_normalize(text, form):
    """Unicode normalization with an explicit form (NFC/NFD/NFKC/NFKD)."""
    return _fn("pl_unicode_normalize", text, form)


def pl_strip_accents(text):
    """Remove diacritics: 'Café' becomes 'Cafe'."""
    return _fn("pl_strip_accents", text)


def pl_normalize_whitespace(text):
    """Collapse whitespace runs to single spaces and trim."""
    return _fn("pl_normalize_whitespace", text)


def pl_normalize_url(url):
    """Canonicalize a URL for dedup keys: trim, strip the #fragment,
    lowercase scheme and host, strip default :80/:443 ports and one
    trailing slash."""
    return _fn("pl_normalize_url", url)


def pl_strip_punct(text):
    """Remove every character that is not a letter, digit, or whitespace."""
    return _fn("pl_strip_punct", text)


def pl_clean_text(text):
    """Canonical cleaning: NFC, lowercase, whitespace collapse."""
    return _fn("pl_clean_text", text)


def pl_winnow(text, k=3, w=4):
    """MOSS winnowing fingerprints as an array of (pos, fp) structs."""
    return _fn("pl_winnow", text, k, w)


def pl_l2_norm(v):
    """Euclidean norm of a float/double array vector."""
    return _fn("pl_l2_norm", v)


def pl_int8_scale(v):
    """Per-vector symmetric int8 quantization scale: max(abs)/127 in
    double, clamped to 1 for the all-zero vector."""
    return _fn("pl_int8_scale", v)


def pl_quantize_int8(v, scale):
    """Symmetric int8 quantization: round(v_i / scale) as int. Stage the
    scale once per row (a column) rather than inlining pl_int8_scale."""
    return _fn("pl_quantize_int8", v, scale)


def pl_dequantize_int8(codes, scale):
    """Inverse of pl_quantize_int8: codes_i * scale as double."""
    return _fn("pl_dequantize_int8", codes, scale)


def pl_cms_agg(key, depth=4, width=1024):
    """Aggregate integral keys into an ADD-mergeable count-min sketch
    (array<bigint>, depth*width row-major, width a power of two)."""
    return _fn("pl_cms_agg", key, depth, width)


def pl_cms_estimate(sketch, key, depth=4, width=1024):
    """Point frequency estimate against a pl_cms_agg sketch — min across
    rows; never underestimates."""
    return _fn("pl_cms_estimate", sketch, key, depth, width)


def pl_hll_agg(key, m=64):
    """Aggregate integral keys into a MAX-mergeable HyperLogLog register
    array (array<bigint> of m registers, m a power of two in [16, 256])."""
    return _fn("pl_hll_agg", key, m)


def pl_hll_merge(sketch, m=64):
    """Roll finer-grained pl_hll_agg sketches up (daily -> monthly) by
    elementwise MAX with bounded m-register state."""
    return _fn("pl_hll_merge", sketch, m)


def pl_hll_estimate(sketch, m=64):
    """Integer-exact raw-HLL distinct-count estimate of a register array;
    relative error ~ 1.04/sqrt(m) for n >> m."""
    return _fn("pl_hll_estimate", sketch, m)


def pl_char_pairs(token):
    """Adjacent character bigrams of a token (the unit a BPE merge
    iteration counts); empty for tokens shorter than 2."""
    return _fn("pl_char_pairs", token)


def pl_deletion_variants(token):
    """The token plus each single-character deletion (FastSS/SymSpell
    blocking keys): edit-distance-1 matching as an equi-join."""
    return _fn("pl_deletion_variants", token)


def pl_z_index(a, b):
    """Morton/Z2 bit-interleave of two non-negative integer keys (16 bits
    each): the clustering key for z-ordered data layout (see
    graft.pipeline.zorder_write). Geometry variant: rf_z2_index."""
    return _fn("pl_z_index", a, b)


def pl_url_host(url):
    """Host of a URL: lowercased authority, :port stripped; empty for
    scheme-less input."""
    return _fn("pl_url_host", url)


def pl_url_domain(url):
    """Registered-domain approximation: last two dot-labels of
    pl_url_host; not public-suffix-aware."""
    return _fn("pl_url_domain", url)


def pl_clean_lines(text):
    """C4-style line-level boilerplate cleanup: keep trimmed lines with
    >= 3 words and no stop marker, re-joined with newlines."""
    return _fn("pl_clean_lines", text)


def pl_kept_lines(text):
    """Kept-line count of pl_clean_lines under the same rules."""
    return _fn("pl_kept_lines", text)


def pl_strip_html(text):
    """Drop HTML tags/comments and decode predefined XML entities."""
    return _fn("pl_strip_html", text)


def pl_chunks(text, size_tokens=512, overlap=0):
    """Fixed-size token windows as an array of chunk structs."""
    return _fn("pl_chunks", text, size_tokens, overlap)


def pl_multi_match_counts(text, patterns):
    """Counts of ALL (overlapping) occurrences of each pattern in text,
    as an array aligned with the patterns array — one Aho-Corasick pass
    per row. See graft.pipeline.blocklist_hits for the exploded view."""
    return _fn("pl_multi_match_counts", text, patterns)


def pl_rand_proj(vec, out_dim=16, seed=0x5eed):
    """Johnson-Lindenstrauss +/-1 random projection of a float/double
    array to out_dim exact-integer components (floor(v*1024)
    quantization, sign from mix64) -- the width reducer in front of
    exact cosine refine."""
    return _fn("pl_rand_proj", vec, out_dim, seed)


def pl_feature_hash(tokens, dim=1024, seed=0):
    """Signed feature hashing (the hashing trick) of a token array into
    dim integer buckets -- vocabulary-free per-row vectorizer; each
    token adds +/-1 at mix64(fnv(token)+seed) mod dim."""
    return _fn("pl_feature_hash", tokens, dim, seed)


def pl_bpe_apply(tokens, merges):
    """BPE-tokenize each word of a token array against a LEARNED merge
    list and flatten the subword units. ``merges`` is a literal list of
    'x y' pair strings in learned order (bpe_learn's ``pair`` column);
    the whole table rides inside one native expression, so cost is
    independent of the merge-table size."""
    from pyspark.sql.functions import array
    if isinstance(merges, (list, tuple)):
        merges = array(*[lit(m) for m in merges])
    return _fn("pl_bpe_apply", tokens, merges)


def pl_unigram_segment(tokens, pieces, costs, max_piece_len=4):
    """Unigram-LM (SentencePiece) Viterbi tokenization of each word of a
    token array under a literal vocab: ``pieces`` (list of strings) and
    ``costs`` (list of integer micro-nat costs, unigram_learn's
    ``cost_unats``) fold into one native expression; the DP compares
    exact longs and ties prefer the longer last piece."""
    from pyspark.sql.functions import array
    if isinstance(pieces, (list, tuple)):
        pieces = array(*[lit(p) for p in pieces])
    if isinstance(costs, (list, tuple)):
        costs = array(*[lit(int(c)) for c in costs])
    return _fn("pl_unigram_segment", tokens, pieces, costs, lit(int(max_piece_len)))
