"""graft for PySpark — Python mirror of the Scala raster engine.

Usage::

    import graft
    spark = graft.init(spark)          # registers UDTs + rf_*/st_* SQL names
    from graft.functions import *      # column-function API
"""

from graft.functions import *  # noqa: F401,F403
from graft.rf_types import CellType, Extent, Tile, TileUDT  # noqa: F401


def init(spark):
    """Register the graft UDTs and SQL functions on this session's JVM.

    Mirrors ``graft.Raster.init(spark)`` on the Scala side; the graft
    classes must be on the driver classpath
    (``spark.driver.extraClassPath``).
    """
    spark._jvm.graft.Raster.init(spark._jsparkSession)
    return spark
