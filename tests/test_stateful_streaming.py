"""Custom stateful streaming (applyInPandasWithState + HLL sketch):
estimates track exact distincts, state survives availableNow drains."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.streaming import stateful as ST


class TestHll:
    def test_estimate_accuracy(self):
        rng = np.random.default_rng(3)
        for n in (50, 500, 5000, 50000):
            regs = np.zeros(ST.HLL_M, dtype=np.uint8)
            vals = rng.integers(0, 1 << 62, size=n)
            regs = ST.hll_add(regs, vals)
            est = ST.hll_estimate(regs)
            assert abs(est - n) / n < 0.25, (n, est)

    def test_merge_by_max_and_determinism(self):
        rng = np.random.default_rng(4)
        a = rng.integers(0, 1 << 62, 1000)
        b = rng.integers(0, 1 << 62, 1000)
        r_all = ST.hll_add(np.zeros(ST.HLL_M, np.uint8), np.r_[a, b])
        ra = ST.hll_add(np.zeros(ST.HLL_M, np.uint8), a)
        rb = ST.hll_add(np.zeros(ST.HLL_M, np.uint8), b)
        np.testing.assert_array_equal(np.maximum(ra, rb), r_all)
        # deterministic: same input, same registers
        np.testing.assert_array_equal(
            ST.hll_add(np.zeros(ST.HLL_M, np.uint8), a), ra
        )


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    import os

    d = tmp_path_factory.mktemp("events_state")
    os.symlink(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


class TestStatefulStream:
    def test_uniques_track_exact(self, spark, events_dir, tmp_path):
        q = (
            ST.streaming_tile_uniques(spark, events_dir)
            .writeStream.format("memory")
            .queryName("tile_uniques")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["tile_id"]: r
            for r in spark.sql("SELECT * FROM tile_uniques").collect()
        }
        exact = {
            r["tile_id"]: r
            for r in ST.batch_tile_uniques(spark, events_dir).collect()
        }
        assert set(got) == set(exact)
        for tid, r in got.items():
            e = exact[tid]
            assert r["n_events"] == e["n_events"]
            rel = abs(r["approx_uniques"] - e["exact_uniques"]) / max(
                e["exact_uniques"], 1
            )
            assert rel < 0.3, (tid, r["approx_uniques"], e["exact_uniques"])
