"""Python mirrors of the graft UDTs.

Counterpart of the reference's pyrasterframes type mirrors
(/root/reference/python/pyrasterframes/rf_types.py): a ``Tile`` value
class backed by numpy and a ``TileUDT`` whose sqlType matches the Scala
side (graft/udt/TileUDT.scala), so tiles survive a py4j round trip.
"""

import struct

import numpy as np
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    UserDefinedType,
)

# cell-type base name -> (numpy dtype, struct fmt char, default NoData)
_CELL_DTYPES = {
    "bit": (np.uint8, "B", None),
    "uint8": (np.uint8, "B", 0),
    "int8": (np.int8, "b", -128),
    "uint16": (np.uint16, "H", 0),
    "int16": (np.int16, "h", -32768),
    "int32": (np.int32, "i", -2147483648),
    "float32": (np.float32, "f", float("nan")),
    "float64": (np.float64, "d", float("nan")),
}


class CellType(object):
    """Parsed cell type name: base plus optional 'ud<value>' / 'raw' suffix."""

    def __init__(self, name):
        self.name = name
        base = name
        self.no_data = None
        self.raw = False
        if "ud" in name:
            base, ud = name.split("ud", 1)
            self.no_data = float(ud)
        elif name.endswith("raw"):
            base = name[:-3]
            self.raw = True
        self.base = base
        if base not in _CELL_DTYPES:
            raise ValueError("Unknown cell type: %s" % name)
        self.dtype, self.fmt, default_nd = _CELL_DTYPES[base]
        if self.no_data is None and not self.raw:
            self.no_data = default_nd

    def is_floating(self):
        return self.base in ("float32", "float64")

    def __repr__(self):
        return "CellType(%s)" % self.name

    def __eq__(self, other):
        return isinstance(other, CellType) and other.name == self.name


class Tile(object):
    """A 2-D grid of cells. ``cells`` is a numpy array shaped (rows, cols);
    NoData cells are numpy ``nan`` in a float view via :meth:`to_masked`."""

    def __init__(self, cells, cell_type=None):
        cells = np.asarray(cells)
        if cell_type is None:
            dt = cells.dtype
            names = {v[0]: k for k, v in _CELL_DTYPES.items() if k != "bit"}
            match = next((n for d, n in names.items() if np.dtype(d) == dt), None)
            if match is None:
                cells = cells.astype(np.float64)
                match = "float64"
            cell_type = CellType(match)
        elif isinstance(cell_type, str):
            cell_type = CellType(cell_type)
        self.cell_type = cell_type
        self.cells = cells.astype(cell_type.dtype, copy=False)

    @property
    def rows(self):
        return self.cells.shape[0]

    @property
    def cols(self):
        return self.cells.shape[1]

    def to_masked(self):
        """Cells as a float64 array with NoData replaced by nan."""
        out = self.cells.astype(np.float64)
        nd = self.cell_type.no_data
        if nd is not None and not (isinstance(nd, float) and np.isnan(nd)):
            out[self.cells == self.cell_type.dtype(nd)] = np.nan
        return out

    def __eq__(self, other):
        return (
            isinstance(other, Tile)
            and other.cell_type == self.cell_type
            and other.cells.shape == self.cells.shape
            and bool(np.array_equal(other.cells, self.cells, equal_nan=self.cell_type.is_floating()))
        )

    def __repr__(self):
        return "Tile(%s, %dx%d)" % (self.cell_type.name, self.cols, self.rows)


class TileUDT(UserDefinedType):
    """Python mirror of graft.udt.TileUDT — must match its sqlType
    (cell_type, cols, rows, cells, ref) field-for-field."""

    @classmethod
    def sqlType(cls):
        return StructType(
            [
                StructField("cell_type", StringType(), False),
                StructField("cols", IntegerType(), False),
                StructField("rows", IntegerType(), False),
                StructField("cells", BinaryType(), True),
                StructField(
                    "ref",
                    StructType(
                        [
                            StructField("path", StringType(), False),
                            StructField("col_min", IntegerType(), False),
                            StructField("row_min", IntegerType(), False),
                            StructField("col_max", IntegerType(), False),
                            StructField("row_max", IntegerType(), False),
                            StructField("band", IntegerType(), False),
                        ]
                    ),
                    True,
                ),
            ]
        )

    @classmethod
    def module(cls):
        return "graft.rf_types"

    @classmethod
    def scalaUDT(cls):
        return "graft.udt.TileUDT"

    def serialize(self, tile):
        ct = tile.cell_type
        n = tile.cells.size
        payload = struct.pack("<%d%s" % (n, ct.fmt), *tile.cells.reshape(-1).tolist())
        return (ct.name, tile.cols, tile.rows, bytearray(payload), None)

    def deserialize(self, datum):
        cell_type, cols, rows, cells, ref = datum
        ct = CellType(cell_type)
        if cells is None:
            raise ValueError(
                "Lazy tile reference reached Python (%r); realize with rf_tile() first" % (ref,)
            )
        arr = np.frombuffer(bytes(cells), dtype=np.dtype(ct.dtype).newbyteorder("<"))
        return Tile(arr.reshape((rows, cols)).copy(), ct)

    def simpleString(self):
        return "tile"


class Extent(object):
    """Bounding box (xmin, ymin, xmax, ymax) mirroring the extent struct."""

    def __init__(self, xmin, ymin, xmax, ymax):
        self.xmin, self.ymin, self.xmax, self.ymax = xmin, ymin, xmax, ymax

    @property
    def width(self):
        return self.xmax - self.xmin

    @property
    def height(self):
        return self.ymax - self.ymin

    def __repr__(self):
        return "Extent(%s, %s, %s, %s)" % (self.xmin, self.ymin, self.xmax, self.ymax)
