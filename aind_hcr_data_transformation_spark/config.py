"""Validated job settings — the engine twin of the reference's pydantic
``ZeissJobSettings`` (``models.py:23-81``), dependency-free (stdlib
dataclass with explicit validation, validated before any Spark job runs —
SURVEY §1.4: schema'd config up front).

Partition-plumbing fields of the reference (``num_of_partitions``,
``partition_to_process``) are intentionally absent: Spark's scheduler
replaces them (SURVEY §4 X1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

#: compressors the sink understands (CompressorName enum, models.py:17-20;
#: blosc-zstd in the reference — "zstd" here is the same compression via
#: pyarrow's bundled codec (numcodecs ``{"id": "zstd"}`` metadata, minus
#: blosc's byte-shuffle wrapper); zlib is the stdlib-only fallback and
#: numcodecs/blosc plugs in when available)
SUPPORTED_COMPRESSORS = ("zlib", "zstd", "none")


@dataclass
class ZarrConversionSettings:
    """Settings for a stack→OME-Zarr conversion job.

    Defaults mirror the reference (``models.py:46-81``): 128³ chunks,
    2×2×2 scale factor, 4 levels, compression on.
    """

    input_source: str = ""
    output_directory: str = ""
    chunk_size: tuple[int, int, int] = (128, 128, 128)
    scale_factor: tuple[int, int, int] = (2, 2, 2)
    downsample_levels: int = 4
    # zstd (pyarrow codec, numcodecs-standard metadata) is the default —
    # the same compression the reference's blosc-zstd-3 uses, and ~5-10x
    # faster than zlib on dense uint16 chunks; zlib remains the
    # stdlib-only fallback
    compressor_name: str = "zstd"
    compressor_kwargs: dict[str, Any] = field(default_factory=lambda: {"level": 3})
    target_size_mb: int = 19_200
    s3_location: str | None = None

    def __post_init__(self) -> None:
        if len(self.chunk_size) != 3 or any(c <= 0 for c in self.chunk_size):
            raise ValueError(f"chunk_size must be 3 positive ints, got {self.chunk_size}")
        if len(self.scale_factor) != 3 or any(s <= 1 for s in self.scale_factor):
            raise ValueError(f"scale_factor must be 3 ints > 1, got {self.scale_factor}")
        if self.downsample_levels < 1:
            raise ValueError(f"downsample_levels must be >= 1, got {self.downsample_levels}")
        if self.downsample_levels > 1 and any(
            c % s for c, s in zip(self.chunk_size, self.scale_factor)
        ):
            # the fused pyramid pools each level-0 tile independently;
            # a chunk not divisible by the factor drops edge rows at the
            # tile seam and surfaces as a cryptic region-extent error
            # mid-job — reject it here instead
            raise ValueError(
                f"chunk_size {self.chunk_size} must be divisible by "
                f"scale_factor {self.scale_factor} when downsampling "
                "(blocks pool independently)"
            )
        if self.compressor_name not in SUPPORTED_COMPRESSORS:
            raise ValueError(
                f"compressor {self.compressor_name!r} not in {SUPPORTED_COMPRESSORS}"
            )
        if self.target_size_mb <= 0:
            raise ValueError(f"target_size_mb must be positive, got {self.target_size_mb}")

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ZarrConversionSettings":
        """Build from a JSON-style dict (CLI ``--job-settings`` analog,
        ``zeiss_job.py:230-245``), rejecting unknown keys."""
        known = {f for f in cls.__dataclass_fields__}  # noqa: C416
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown settings: {sorted(unknown)}")
        d = dict(d)
        for key in ("chunk_size", "scale_factor"):
            if key in d:
                d[key] = tuple(d[key])
        return cls(**d)
