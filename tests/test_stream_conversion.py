"""Streaming conversion e2e: the stack-blocks STREAM source composed
with the zarr sink through foreachBatch — incremental microscope
ingestion, killed mid-acquisition and restarted from the checkpoint,
ending voxel-exact.  This is the restartable-end-to-end claim of
``StackBlockStreamReader`` proven, not asserted: offset replay on the
source + idempotent chunk-aligned region writes on the sink."""

from __future__ import annotations

import time

import numpy as np

from aind_hcr_data_transformation_spark.sinks.zarr_sink import read_array
from aind_hcr_data_transformation_spark.sources.czi import synthetic_ramp_block
from aind_hcr_data_transformation_spark.sources.datasource import (
    StackBlockDataSource,
)

Z, Y, X = 40, 32, 32
TILE = 16


def _reader(spark, per_batch):
    spark.dataSource.register(StackBlockDataSource)
    return (
        spark.readStream.format("stack_blocks")
        .option("stacks", "a")
        .option("z", Z)
        .option("y", Y)
        .option("x", X)
        .option("block_z", TILE)
        .option("block_y", TILE)
        .option("block_x", TILE)
        .option("stream_batch_tiles", per_batch)
        .load()
    )


def test_stream_conversion_restarts_voxel_exact(spark, tmp_path):
    from aind_hcr_data_transformation_spark.sinks.zarr_sink import (
        init_array,
        write_region,
    )

    url = (tmp_path / "a.zarr").as_uri()
    ck = str(tmp_path / "ck")
    init_array(url, (Z, Y, X), (TILE, TILE, TILE), "uint16", compressor="zstd")

    written = []  # (batch_id, n_tiles) from the driver-side foreachBatch
    tile_keys = set()  # distinct (z0, y0, x0) origins ever delivered

    def sink(df, batch_id):
        rows = df.collect()  # a handful of tiles per micro-batch
        for r in rows:
            arr = np.frombuffer(
                bytes(r.block), dtype=np.dtype(r.dtype)
            ).reshape(r.shape[-3:])
            write_region(url, (r.z0, r.y0, r.x0), arr)
            tile_keys.add((r.z0, r.y0, r.x0))
        written.append((batch_id, len(rows)))

    # phase 1: ingest a few micro-batches, then "crash"
    q1 = (
        _reader(spark, 3)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        # spaced micro-batches: the stop below lands BETWEEN batches, so
        # phase 1 deterministically ends mid-acquisition on any host
        .trigger(processingTime="2 seconds")
        .start()
    )
    deadline = time.time() + 60
    while sum(n for _, n in written) < 6 and time.time() < deadline:
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination(30)
    n_before = sum(n for _, n in written)
    assert n_before >= 6, "first phase never ingested"
    total_tiles = (Z // TILE + 1) * (Y // TILE) * (X // TILE)  # 3*2*2*... = 12
    assert n_before < 12 * 1  # stopped mid-acquisition (12 tiles for stack a)

    # phase 2: restart from the checkpoint, drain to completion
    q2 = (
        _reader(spark, 3)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .start()
    )
    deadline = time.time() + 120
    # drain on distinct tiles, not raw deliveries — a replayed batch
    # inflates the count without completing coverage
    while len(tile_keys) < 12 and time.time() < deadline:
        time.sleep(0.3)
    q2.stop()
    q2.awaitTermination(30)

    # exactly-once at the TILE level: every tile delivered, and the raw
    # delivery count allows at most ONE replayed micro-batch (q1.stop()
    # can land after sink() ran but before that batch's checkpoint
    # commit, in which case the restart legitimately replays it — the
    # idempotent writes make the replay harmless, so asserting a bare
    # ==12 would flake on a loaded host)
    assert len(tile_keys) == 12
    delivered = sum(n for _, n in written)
    assert 12 <= delivered <= 12 + 3, written

    got = read_array(url)
    np.testing.assert_array_equal(got, synthetic_ramp_block(0, Z, 0, Y, 0, X))
