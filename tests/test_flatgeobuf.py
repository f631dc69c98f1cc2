"""Native FlatGeobuf IO: round-trips, a hand-assembled spec fixture (reader
validated independently of the writer), index skipping, and dispatch."""

import struct

import pytest
from pyspark.sql import functions as F

import polars_st_spark as st
from polars_st_spark.sources.files import read_file, write_file
from polars_st_spark.sources.flatgeobuf_io import (
    _MAGIC,
    _index_size,
    read_flatgeobuf,
    write_flatgeobuf,
)

WKTS = [
    (1, "alpha", 1.5, True, "POINT (1 2)"),
    (2, "beta", -2.25, False, "LINESTRING (0 0, 1 1, 2 0)"),
    (3, None, None, None,
     "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
    (4, "delta", 0.0, True,
     "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
     "((5 5, 6 5, 6 6, 5 6, 5 5), (5.2 5.2, 5.8 5.2, 5.8 5.8, 5.2 5.8, 5.2 5.2)))"),
    (5, "eps", 9.75, False, "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))"),
    (6, "zeta", 3.5, True, "MULTIPOINT (1 1, 2 2)"),
    (7, "eta", 1.0, False, None),
    (8, "theta", 2.0, True,
     "GEOMETRYCOLLECTION (POINT (9 9), LINESTRING (0 0, 1 0))"),
]


def _gdf(spark):
    df = spark.createDataFrame(WKTS, ["id", "tag", "score", "flag", "wkt"])
    return df.select(
        "id", "tag", "score", "flag",
        F.when(F.col("wkt").isNotNull(),
               st.st_set_srid(st.st_from_wkt("wkt"), 4326)).alias("geometry"),
    )


def test_fgb_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.fgb")
    write_flatgeobuf(_gdf(spark), path)
    with open(path, "rb") as f:
        assert f.read(8) == _MAGIC
    back = read_flatgeobuf(spark, path)
    assert [f.name for f in back.schema.fields] == ["id", "tag", "score", "flag", "geometry"]
    rows = back.select(
        "id", "tag", "score", "flag",
        st.st_to_wkt("geometry").alias("wkt"),
        st.st_srid("geometry").alias("srid"),
    ).orderBy("id").collect()
    assert len(rows) == len(WKTS)
    # engine-normalized expected WKT (MULTIPOINT etc. formatting)
    exp_wkt = {
        r["id"]: r["exp"]
        for r in spark.createDataFrame(
            [(i, w) for i, _, _, _, w in WKTS if w is not None], ["id", "wkt"]
        ).select("id", st.st_to_wkt(st.st_from_wkt("wkt")).alias("exp")).collect()
    }
    for (eid, etag, escore, eflag, ewkt), r in zip(WKTS, rows):
        assert (r["id"], r["tag"], r["score"], r["flag"]) == (eid, etag, escore, eflag)
        if ewkt is None:
            assert r["wkt"] is None
        else:
            assert r["srid"] == 4326
            assert r["wkt"] == exp_wkt[eid]


def test_fgb_roundtrip_values_exact(spark, tmp_path):
    """Numeric exactness through the binary format (no text round-off)."""
    path = str(tmp_path / "x.fgb")
    df = spark.createDataFrame(
        [(10**17 + 7, 0.1 + 0.2, "POINT (1.0000000001 -2.9999999999)")],
        ["big", "frac", "wkt"],
    ).select("big", "frac", st.st_from_wkt("wkt").alias("geometry"))
    write_flatgeobuf(df, path)
    r = read_flatgeobuf(spark, path).select(
        "big", "frac", st.st_x("geometry").alias("x"), st.st_y("geometry").alias("y")
    ).first()
    assert r["big"] == 10**17 + 7
    assert r["frac"] == 0.1 + 0.2
    assert r["x"] == 1.0000000001 and r["y"] == -2.9999999999


def _handcrafted_fgb(with_index: bool) -> bytes:
    """A minimal FlatGeobuf file assembled byte-by-byte from the spec (NOT
    via the writer): Point layer named 't', features_count=1, one feature
    POINT (3 4). Layout is the forward-vtable variant, exercising offset
    arithmetic differently from the writer's bottom-up layout."""
    # ---- header flatbuffer
    h = bytearray()
    h += struct.pack("<I", 28)                 # 0: root offset -> table at 28
    # 4: vtable covering fields 0..9 (name, geometry_type, count, node size)
    h += struct.pack("<2H", 24, 20)            # vt_size, table_size
    h += struct.pack("<10H", 4, 0, 18, 0, 0, 0, 0, 0, 8, 16)
    # 28: table
    h += struct.pack("<i", 24)                 # soffset: vtable 24 bytes before
    h += struct.pack("<I", 16)                 # +4  name -> string at 48
    h += struct.pack("<Q", 1)                  # +8  features_count
    h += struct.pack("<H", 16 if with_index else 0)  # +16 index_node_size
    h += struct.pack("<B", 1)                  # +18 geometry_type = Point
    h += b"\x00"                               # +19 pad to table_size 20
    # 48: string "t"
    h += struct.pack("<I", 1) + b"t\x00\x00\x00"
    assert len(h) == 56

    # ---- feature flatbuffer: POINT (3 4)
    f = bytearray()
    f += struct.pack("<I", 12)                 # 0: root -> feature table at 12
    f += struct.pack("<2H", 6, 8)              # 4: feature vtable {geometry}
    f += struct.pack("<H", 4)
    f += b"\x00\x00"                           # pad to 12
    f += struct.pack("<i", 8)                  # 12: soffset
    f += struct.pack("<I", 24)                 # 16: geometry -> table at 40
    # 20: geometry vtable for fields {1: xy, 6: type}
    f += struct.pack("<2H", 18, 12)
    f += struct.pack("<7H", 0, 4, 0, 0, 0, 0, 8)
    f += b"\x00\x00"                           # pad to 40
    assert len(f) == 40
    f += struct.pack("<i", 20)                 # 40: soffset (vtable at 20)
    f += struct.pack("<I", 8)                  # 44: xy -> vector at 52
    f += struct.pack("<B", 1) + b"\x00\x00\x00"  # 48: type Point + pad
    f += struct.pack("<I", 2)                  # 52: vector length (doubles)
    f += struct.pack("<2d", 3.0, 4.0)          # 56: elements (8-aligned)
    assert len(f) == 72

    out = bytearray(_MAGIC)
    out += struct.pack("<I", len(h)) + h
    if with_index:
        out += b"\x00" * _index_size(1, 16)    # 40-byte dummy R-tree
    out += struct.pack("<I", len(f)) + f
    return bytes(out)


@pytest.mark.parametrize("with_index", [False, True])
def test_fgb_reader_against_spec_fixture(spark, tmp_path, with_index):
    path = str(tmp_path / "hand.fgb")
    with open(path, "wb") as fh:
        fh.write(_handcrafted_fgb(with_index))
    df = read_flatgeobuf(spark, path)
    r = df.select(
        st.st_to_wkt("geometry").alias("wkt"), st.st_srid("geometry").alias("srid")
    ).first()
    assert r["wkt"] == "POINT (3 4)"
    assert r["srid"] == 0  # no Crs table in the fixture


def test_fgb_index_size():
    # leaf-only
    assert _index_size(1, 16) == 40
    assert _index_size(0, 16) == 0
    assert _index_size(100, 0) == 0
    # 100 leaves + 7 internal + root = 108 nodes
    assert _index_size(100, 16) == (100 + 7 + 1) * 40


def test_fgb_file_dispatch(spark, tmp_path):
    path = str(tmp_path / "d.fgb")
    write_file(_gdf(spark), path)
    back = read_file(spark, path)
    assert back.count() == len(WKTS)
    assert back.where(F.col("geometry").isNotNull()).count() == len(WKTS) - 1


def test_fgb_max_rows_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="max_rows"):
        write_flatgeobuf(_gdf(spark), str(tmp_path / "m.fgb"), max_rows=3)


def test_fgb_z_roundtrip(spark, tmp_path):
    path = str(tmp_path / "z.fgb")
    df = spark.createDataFrame(
        [(1, "LINESTRING Z (0 0 5, 1 1 6)")], ["id", "wkt"]
    ).select("id", st.st_from_wkt("wkt").alias("geometry"))
    write_flatgeobuf(df, path)
    r = read_flatgeobuf(spark, path).select(
        st.st_to_wkt("geometry").alias("wkt")
    ).first()
    assert r["wkt"] in ("LINESTRING Z (0 0 5, 1 1 6)", "LINESTRING (0 0 5, 1 1 6)")


def test_fgb_edge_cases(spark):
    """Zero-row frames, unicode, NaN/±inf/-0.0 doubles, extreme longs, and
    empty strings all survive the binary round-trip."""
    df0 = spark.createDataFrame([], "id long, tag string, geometry binary")
    p0 = "/tmp/fgb_edge0.fgb"
    write_flatgeobuf(df0, p0)
    back0 = read_flatgeobuf(spark, p0)
    assert back0.count() == 0
    assert [f.name for f in back0.schema.fields] == ["id", "tag", "geometry"]

    rows = [
        (1, "héllo wörld — ünïcödé ✓", float("nan"), -2**62, "POINT (1 2)"),
        (2, "", float("inf"), 2**62, "POINT (3 4)"),
        (3, "tab\there\nnewline", -0.0, 0, "POINT (5 6)"),
    ]
    df = spark.createDataFrame(rows, ["id", "tag", "val", "big", "wkt"]) \
        .select("id", "tag", "val", "big", st.st_from_wkt("wkt").alias("geometry"))
    p1 = "/tmp/fgb_edge1.fgb"
    write_flatgeobuf(df, p1)
    out = read_flatgeobuf(spark, p1).orderBy("id").collect()
    assert out[0]["tag"] == "héllo wörld — ünïcödé ✓"
    assert out[0]["val"] != out[0]["val"] or out[0]["val"] is None  # NaN/NULL
    assert out[0]["big"] == -2**62
    assert out[1]["val"] == float("inf")
    assert out[1]["big"] == 2**62
    assert out[2]["tag"] == "tab\there\nnewline"
