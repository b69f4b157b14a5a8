"""Custom Spark 4 Python Data Source for image-stack blocks (SURVEY §2.1
S2 long-term plan: "Spark 4 Python Data Source API (custom DataSource)
for CZI").

Usage::

    spark.dataSource.register(StackBlockDataSource)
    df = (spark.read.format("stack_blocks")
          .option("stacks", "a,b")
          .option("z", 40).option("y", 32).option("x", 32)
          .option("block_z", 16).option("block_y", 16).option("block_x", 16)
          .load())

Each input partition is one (stack, z0, y0, x0) tile — Spark schedules
tiles exactly like parquet splits, and the reader streams Arrow-friendly
rows. ``reader="synthetic"`` emits the deterministic ramp; a czifile
backend drops into ``_make_block`` unchanged (import-gated like
``sources/czi.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .czi import BLOCK_SCHEMA, synthetic_ramp_block


@dataclass
class _TilePartition(InputPartition):
    stack_name: str
    z0: int
    z1: int
    y0: int
    y1: int
    x0: int
    x1: int


class StackBlockDataSource(DataSource):
    """``format("stack_blocks")`` — block rows of BLOCK_SCHEMA."""

    @classmethod
    def name(cls) -> str:
        return "stack_blocks"

    def schema(self):
        return BLOCK_SCHEMA

    def reader(self, schema) -> "StackBlockReader":
        return StackBlockReader(self.options)


class StackBlockReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.stacks = [s for s in options.get("stacks", "stack").split(",") if s]
        self.z = int(options.get("z", 128))
        self.y = int(options.get("y", 128))
        self.x = int(options.get("x", 128))
        self.bz = int(options.get("block_z", 128))
        self.by = int(options.get("block_y", 128))
        self.bx = int(options.get("block_x", 128))
        self.reader = options.get("reader", "synthetic")
        if self.reader != "synthetic":
            raise NotImplementedError(
                "only the synthetic backend exists in this environment; the "
                "czifile backend plugs into _make_block (sources/czi.py)"
            )

    def partitions(self) -> list[_TilePartition]:
        """One partition per 3-D tile (gen_slices semantics,
        ``zarr_writer.py:129-186``) — the split list Spark schedules."""
        parts = []
        for s in self.stacks:
            for z0 in range(0, self.z, self.bz):
                for y0 in range(0, self.y, self.by):
                    for x0 in range(0, self.x, self.bx):
                        parts.append(
                            _TilePartition(
                                s,
                                z0,
                                min(z0 + self.bz, self.z),
                                y0,
                                min(y0 + self.by, self.y),
                                x0,
                                min(x0 + self.bx, self.x),
                            )
                        )
        return parts

    def read(self, partition: _TilePartition) -> Iterator[tuple]:
        arr = synthetic_ramp_block(
            partition.z0,
            partition.z1,
            partition.y0,
            partition.y1,
            partition.x0,
            partition.x1,
        )
        yield (
            partition.stack_name,
            0,
            0,
            partition.z0,
            partition.z1,
            partition.y0,
            partition.y1,
            partition.x0,
            partition.x1,
            [1, 1, *arr.shape],
            str(arr.dtype),
            arr.tobytes(),
        )
