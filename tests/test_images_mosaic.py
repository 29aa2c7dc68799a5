"""Image payload integrity through the distributed pipeline
(BASELINE input_hint: decoded-pixel allclose / PSNR>=40dB for lossy +
caption byte-equality after every shuffle/join) + tile mosaics +
raster<->vector extents."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernels import png as PNG
from s2geometry_spark.operators import mosaic as M
from s2geometry_spark.sources import images as IMG

N = 300
TILE_LEVEL = 4


class TestPngCodec:
    def test_round_trip_exact(self):
        rng = np.random.default_rng(7)
        for shape in [(16, 16, 3), (33, 47, 3), (64, 17, 3)]:
            rgb = rng.integers(0, 256, size=shape, dtype=np.uint8)
            np.testing.assert_array_equal(PNG.decode_png(PNG.encode_png(rgb)), rgb)

    def test_fake_jpeg_lossy_but_above_40db(self):
        rng = np.random.default_rng(8)
        rgb = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        dec = PNG.decode_fake_jpeg(PNG.encode_fake_jpeg(rgb))
        p = PNG.psnr(rgb, dec)
        assert 40.0 <= p < math.inf  # genuinely lossy, above the gate

    def test_decoder_handles_standard_filters(self):
        # synthetic scanline data exercising filters 1-4 via re-filter:
        # encode with filter 0, then verify unfilter identity path. The
        # sub/up/avg/paeth paths are covered by crafting raw streams.
        import struct
        import zlib

        rng = np.random.default_rng(9)
        rgb = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        h, w = 8, 8
        # build filter-2 (Up) encoded stream manually
        raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
        for y in range(h):
            raw[y, 0] = 2
            prev = rgb[y - 1].reshape(-1).astype(int) if y else np.zeros(w * 3, int)
            raw[y, 1:] = (rgb[y].reshape(-1).astype(int) - prev) % 256
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + PNG._chunk(b"IHDR", ihdr)
            + PNG._chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + PNG._chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(PNG.decode_png(data), rgb)


@pytest.fixture(scope="module")
def images_df(spark):
    return IMG.image_table(spark, N).cache()


class TestImageTable:
    def test_deterministic_and_distributed(self, spark, images_df):
        assert images_df.count() == N
        # same rows regardless of partitioning
        a = {r["image_id"]: (r["phash"], r["caption"]) for r in images_df.collect()}
        b = {
            r["image_id"]: (r["phash"], r["caption"])
            for r in IMG.image_table(spark, N, partitions=7).collect()
        }
        assert a == b

    def test_payload_invariants_after_shuffle_join(self, spark, images_df):
        """Pipeline: tile assign -> repartition (shuffle) -> self-join;
        decoded payloads must match the regenerated oracle."""
        tiled = M.with_tiles(images_df, TILE_LEVEL)
        shuffled = tiled.repartition(11, "tile_id")
        dim = tiled.select(F.col("image_id").alias("jid"), "tile_id").distinct()
        joined = shuffled.join(
            F.broadcast(dim), shuffled["image_id"] == dim["jid"], "inner"
        ).drop("jid")
        rows = joined.select(
            "image_id", "bytes", "fmt", "caption", "phash"
        ).collect()
        assert len(rows) == N
        for r in rows:
            i = int(r["image_id"][3:])
            rec = IMG.row_record(i)
            assert r["caption"] == rec["caption"]  # byte-equal
            assert r["phash"] == rec["phash"]
            dec = PNG.decode_image(bytes(r["bytes"]), r["fmt"])
            # oracle pixels: regenerate source and compare
            src_rec = IMG.row_record(i)
            src = PNG.decode_image(src_rec["bytes"], src_rec["fmt"])
            np.testing.assert_array_equal(dec, src)
            if r["fmt"] == "jpeg":
                # lossy vs ORIGINAL (pre-encode) pixels: PSNR gate
                stream = IMG._mix64(
                    np.arange(rec["w"] * rec["h"] * 3, dtype=np.uint64)
                    + np.uint64(IMG._mix64(np.array([i], np.uint64))[0])
                )
                orig = (stream & np.uint64(0xFF)).astype(np.uint8).reshape(
                    rec["h"], rec["w"], 3
                )
                assert PNG.psnr(orig, dec) >= 40.0

    def test_hotspot_skew_present(self, images_df):
        tiled = M.with_tiles(images_df, TILE_LEVEL)
        counts = [r["n"] for r in tiled.groupBy("tile_id").agg(F.count("*").alias("n")).collect()]
        assert max(counts) >= 5  # clustered tiles exist


class TestMosaics:
    def test_mosaic_deterministic_and_decodable(self, spark, images_df):
        tiled = M.with_tiles(images_df, TILE_LEVEL)
        mos = M.tile_mosaics(tiled).collect()
        assert len(mos) == tiled.select("tile_id").distinct().count()
        total = sum(r["n_images"] for r in mos)
        assert total == N
        r0 = max(mos, key=lambda r: r["n_images"])
        raster = PNG.decode_png(bytes(r0["mosaic"]))
        assert raster.shape == (64, 64, 3)
        # deterministic: rerun matches byte-for-byte
        mos2 = {r["tile_id"]: bytes(r["mosaic"]) for r in M.tile_mosaics(tiled).collect()}
        for r in mos:
            assert mos2[r["tile_id"]] == bytes(r["mosaic"])

    def test_tile_extents_projected_round_trip(self, spark, images_df):
        from s2geometry_spark.kernels import projections as PR
        from s2geometry_spark.kernels.geom import Cell

        tiled = M.with_tiles(images_df, TILE_LEVEL)
        tiles = tiled.select("tile_id").distinct().limit(5)
        exts = M.tile_extents(tiles).collect()
        proj = PR.PlateCarree()
        rings: dict = {}
        for r in exts:
            rings.setdefault(int(r["tile_id"]), []).append(
                (int(r["ring_idx"]), (r["x"], r["y"]))
            )
        assert len(rings) == 5
        for tid, pts in rings.items():
            ring = [xy for _, xy in sorted(pts)]
            assert len(ring) >= 5  # 4 corners + closure, tessellated
            cell = Cell(tid)
            # each ring point unprojects to within the cell's cap bound
            # slightly expanded (points lie ON the boundary; the
            # project/unproject round trip adds ~1e-12 noise)
            cap = cell.get_cap_bound().expanded(1e-9)
            for pt in ring:
                lat, lng = proj.unproject(np.array([pt[0]]), np.array([pt[1]]))
                la, lo = float(lat[0]), float(lng[0])
                c = math.cos(la)
                p = (math.cos(lo) * c, math.sin(lo) * c, math.sin(la))
                assert cap.contains_point(p)


def test_extract_features_tolerant_mode(spark):
    """strict=False must turn undecodable payloads into ok=False rows
    instead of failing the task (the curation-job contract); strict
    mode still raises so codec bugs cannot hide."""
    import pytest
    from pyspark.sql import functions as F

    from s2geometry_spark.operators import image_features as IF
    from s2geometry_spark.sources import images as IMG

    good = IMG.image_table(spark, 4).select(
        "image_id", "bytes", "fmt", "phash"
    )
    bad = spark.createDataFrame(
        [("corrupt0", bytearray(b"not an image"), "png", 0),
         ("corrupt1", bytearray(b""), "tiff", 0)],
        "image_id STRING, bytes BINARY, fmt STRING, phash LONG",
    )
    rows = IF.extract_features(
        good.unionByName(bad), strict=False
    ).collect()
    by_id = {r["image_id"]: r for r in rows}
    assert len(by_id) == 6
    assert not by_id["corrupt0"]["ok"] and not by_id["corrupt1"]["ok"]
    assert all(
        by_id[r["image_id"]]["ok"]
        for r in good.select("image_id").collect()
    )
    with pytest.raises(Exception):
        IF.extract_features(bad, strict=True).collect()


def test_mosaic_small_image_has_no_black_stripe_bins(spark):
    """An image smaller than the patch size maps no source pixel into
    some downsample bins; those bins must fill by nearest-neighbor,
    not stay black (the old np.maximum(cnt,1) masked the divide but
    left zero-count bins at 0)."""
    from s2geometry_spark.kernels import png as PNG
    from s2geometry_spark.operators import mosaic as MO

    rgb = np.full((8, 8, 3), 200, dtype=np.uint8)  # uniform gray 8x8
    img = PNG.encode_png(rgb)
    df = spark.createDataFrame(
        [(7, "i0", bytearray(img), "png")],
        "tile_id long, image_id string, bytes binary, fmt string",
    )
    row = MO.tile_mosaics(df, grid=1, patch=16).collect()[0]
    out = PNG.decode_png(bytes(row.mosaic))
    # every patch pixel should be the uniform source value
    assert int(out.min()) == 200 and int(out.max()) == 200
