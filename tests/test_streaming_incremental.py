"""Streaming incremental tile maintenance: a 3-epoch file stream through
foreach_batch_incremental must converge to exactly the batch recompute
over the full page union, and the epoch commit protocol must leave a
resumable version chain behind."""

from pathlib import Path

from pyspark.sql import functions as F

from convert_spark import datagen
from convert_spark.operators import extract, tiles
from convert_spark.streaming import ingest


class TestIncrementalStream:
    def test_stream_state_matches_batch_recompute(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        state = str(tmp_path / "state")
        pages = datagen.webpages(spark, 300)
        for i in range(3):
            pages.filter(F.col("page_id") % 3 == i).coalesce(1).write.mode("append").parquet(landing)

        stream = ingest.read_page_stream(spark, landing, max_files_per_trigger=1)
        q = ingest.foreach_batch_incremental(stream, state, zoom=8).start()
        q.processAllAvailable()
        q.stop()

        versions = sorted(p.name for p in Path(state).glob("v*"))
        assert len(versions) >= 2, versions  # the merge path actually ran
        latest = (Path(state) / "_LATEST").read_text().strip()
        assert f"v{latest}" == versions[-1]

        # per-epoch lineage + metrics snapshots (north_rule surface)
        import json

        snaps = [
            json.loads(p.read_text())
            for p in sorted(Path(state).glob("_log/_snapshots/snapshot-*.json"))
        ]
        assert len(snaps) == len(versions)
        for s in snaps:
            assert s["rows_in"] >= 0 and s["n_tiles"] > 0 and s["wall_s"] > 0
            assert s["manifest"] and all(f["bytes"] > 0 for f in s["manifest"])
        assert snaps[0]["lineage"] == ["pages-stream"]
        assert snaps[-1]["lineage"][-1].startswith("v")  # chained to prior epoch
        assert [s["parent_id"] for s in snaps] == [None] + [s["snapshot_id"] for s in snaps[:-1]]

        got = (
            spark.read.parquet(f"{state}/v{latest}")
            .orderBy("cell_id")
            .toPandas()
            .reset_index(drop=True)
        )
        full = tiles.tile_datasets(
            tiles.with_tile(
                extract.normalize_points(extract.extract_mentions(spark.read.parquet(landing))), 8
            )
        )
        want = full.orderBy("cell_id").toPandas().reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path):
        """Re-running the last epoch against the same prior pointer (what
        foreachBatch does after a crash before the pointer write) must
        reproduce the same state."""
        landing = str(tmp_path / "landing")
        state = str(tmp_path / "state")
        pages = datagen.webpages(spark, 120)
        pages.filter(F.col("page_id") % 2 == 0).coalesce(1).write.parquet(landing)

        stream = ingest.read_page_stream(spark, landing, max_files_per_trigger=1)
        q = ingest.foreach_batch_incremental(stream, state, zoom=8).start()
        q.processAllAvailable()
        q.stop()
        before = spark.read.parquet(f"{state}/v0").orderBy("cell_id").toPandas()

        # crash simulation: pointer rolled back, epoch 0 replays
        (Path(state) / "_LATEST").unlink()
        batch = spark.read.parquet(landing)
        mentions = extract.extract_mentions(batch)
        tiled = tiles.with_tile(extract.normalize_points(mentions), 8)
        tiles.tile_datasets(tiled).write.mode("overwrite").parquet(f"{state}/v0")
        (Path(state) / "_LATEST").write_text("0")
        after = spark.read.parquet(f"{state}/v0").orderBy("cell_id").toPandas()
        import pandas as pd

        pd.testing.assert_frame_equal(before, after)

    def test_replay_after_pointer_write_is_idempotent(self, spark, tmp_path):
        """ADVICE r7: a crash AFTER the _LATEST pointer write but before
        Structured Streaming commits the epoch's offsets replays epoch E
        with the pointer already at E. The handler must fold the replayed
        batch into the state STRICTLY BELOW E (not vE itself — that would
        double-count the batch and overwrite the directory being read)."""
        import pandas as pd

        landing = str(tmp_path / "landing")
        state = str(tmp_path / "state")
        pages = datagen.webpages(spark, 160)
        pages.coalesce(1).write.parquet(landing)

        stream = ingest.read_page_stream(spark, landing, max_files_per_trigger=1)
        h = ingest.foreach_batch_incremental(stream, state, zoom=8)._convert_spark_handle
        b0 = pages.filter(F.col("page_id") % 2 == 0)
        b1 = pages.filter(F.col("page_id") % 2 == 1)
        h(b0, 0)
        h(b1, 1)
        assert (Path(state) / "_LATEST").read_text().strip() == "1"
        before = spark.read.parquet(f"{state}/v1").orderBy("cell_id").toPandas()

        # crash-after-pointer simulation: the pointer is already at 1 and
        # foreachBatch re-delivers the SAME batch + epoch id
        h(b1, 1)
        after = spark.read.parquet(f"{state}/v1").orderBy("cell_id").toPandas()
        pd.testing.assert_frame_equal(before, after)
