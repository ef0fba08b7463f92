"""Neuroglancer "precomputed" dataset metadata.

Python re-expression of the reference's Info/InfoScale system
(src/Infos.jl) — the JSON ``info`` file at the dataset root that declares
dtype, per-mip geometry, chunk size and encoding.  Round-trips the same
JSON the reference reads/writes (src/Infos.jl:234-293), so a dataset
written by this engine stays neuroglancer-compatible.

Divergence note (intentional, documented): the reference maps encoding
``"raw"`` to its gzip codec because cloud storage auto-gzips raw objects
(src/Infos.jl:23-30).  Our chunk payloads live inside Parquet pages that
Parquet itself compresses (zstd), so ``"raw"`` here is a true
passthrough — round-trip semantics are unchanged, double compression is
avoided at the storage layer instead of the codec layer.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace

import numpy as np

# src/Infos.jl:6-14 — the complete supported dtype set.
DATATYPE_MAP: dict[str, np.dtype] = {
    "bool": np.dtype(np.bool_),
    "uint8": np.dtype(np.uint8),
    "uint16": np.dtype(np.uint16),
    "uint32": np.dtype(np.uint32),
    "uint64": np.dtype(np.uint64),
    "float32": np.dtype(np.float32),
    "float64": np.dtype(np.float64),
}

# Spark SQL type used when a chunk payload is exploded to a voxel view.
# Spark has no unsigned ints: each unsigned type widens to the next signed
# type that holds its full range; uint64 maps to DECIMAL(20,0).
VOXEL_SQL_TYPE: dict[str, str] = {
    "bool": "boolean",
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "bigint",
    "uint64": "decimal(20,0)",
    "float32": "float",
    "float64": "double",
}

LAYER_TYPES = ("image", "segmentation")


@dataclass
class InfoScale:
    """One mip level (src/Infos.jl:33-40)."""

    key: str                                 # e.g. "4_4_40" (nm resolution triple)
    chunk_size: tuple[int, int, int]         # exactly one per scale (src/Infos.jl:105-108)
    encoding: str = "gzip"
    resolution: tuple[float, float, float] = (1.0, 1.0, 1.0)
    volume_size: tuple[int, int, int] = (0, 0, 0)
    voxel_offset: tuple[int, int, int] = (0, 0, 0)   # may be negative

    @classmethod
    def from_dict(cls, d: dict) -> "InfoScale":
        chunk_sizes = d["chunk_sizes"]
        if len(chunk_sizes) != 1:
            raise ValueError("exactly one chunk size per scale is supported")
        return cls(
            key=d["key"],
            chunk_size=tuple(chunk_sizes[0]),
            encoding=d.get("encoding", "gzip"),
            resolution=tuple(d.get("resolution", (1.0, 1.0, 1.0))),
            volume_size=tuple(d["size"]),
            voxel_offset=tuple(d.get("voxel_offset", (0, 0, 0))),
        )

    def to_dict(self) -> dict:
        return {
            "key": self.key,
            "chunk_sizes": [list(self.chunk_size)],
            "encoding": self.encoding,
            "resolution": list(self.resolution),
            "size": list(self.volume_size),
            "voxel_offset": list(self.voxel_offset),
        }

    def next_mip(self) -> "InfoScale":
        """Derive the next pyramid level: 2× downsample in x,y only — z,
        chunk size and encoding unchanged (src/Infos.jl:162-178).

        Size/offset halving truncates toward zero, matching the
        reference's ``map(div, ..., (2,2,1))`` (Julia ``div`` truncates),
        and matching ``Volume.downsample``, which drops odd trailing
        rows/columns rather than padding a ceil voxel.  The mip key
        rounds each resolution to the nearest integer (half-even), as
        the reference's ``round(Int, x)`` does."""
        res = (self.resolution[0] * 2, self.resolution[1] * 2, self.resolution[2])
        key = "_".join(str(round(r)) for r in res)
        half = lambda v: v // 2 if v >= 0 else -((-v) // 2)  # noqa: E731
        return InfoScale(
            key=key,
            chunk_size=self.chunk_size,
            encoding=self.encoding,
            resolution=res,
            volume_size=(
                self.volume_size[0] // 2,
                self.volume_size[1] // 2,
                self.volume_size[2],
            ),
            voxel_offset=(
                half(self.voxel_offset[0]),
                half(self.voxel_offset[1]),
                self.voxel_offset[2],
            ),
        )


@dataclass
class Info:
    """Dataset metadata (src/Infos.jl:185-196)."""

    data_type: str
    scales: list[InfoScale] = field(default_factory=list)
    num_channels: int = 1
    layer_type: str = "image"
    mesh: str = ""
    skeletons: str = ""

    def __post_init__(self):
        if self.data_type not in DATATYPE_MAP:
            raise ValueError(f"unsupported data_type {self.data_type!r}; "
                             f"supported: {sorted(DATATYPE_MAP)}")
        if self.layer_type not in LAYER_TYPES:
            raise ValueError(f"layer_type must be one of {LAYER_TYPES}")

    # -- JSON round-trip (src/Infos.jl:234-293) -----------------------------

    @classmethod
    def from_dict(cls, d: dict) -> "Info":
        return cls(
            data_type=d["data_type"],
            scales=[InfoScale.from_dict(s) for s in d["scales"]],
            num_channels=int(d.get("num_channels", 1)),
            layer_type=d.get("type", "image"),
            mesh=d.get("mesh", ""),
            skeletons=d.get("skeletons", ""),
        )

    def to_dict(self) -> dict:
        d = {
            "num_channels": self.num_channels,
            "type": self.layer_type,
            "data_type": self.data_type,
            "scales": [s.to_dict() for s in self.scales],
        }
        if self.mesh:
            d["mesh"] = self.mesh
        if self.skeletons:
            d["skeletons"] = self.skeletons
        return d

    @classmethod
    def from_json(cls, s: str | bytes) -> "Info":
        return cls.from_dict(json.loads(s))

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    # -- dtype / geometry accessors (src/Infos.jl:296-394) ------------------

    @property
    def dtype(self) -> np.dtype:
        return DATATYPE_MAP[self.data_type]

    @property
    def voxel_sql_type(self) -> str:
        return VOXEL_SQL_TYPE[self.data_type]

    @property
    def ndim(self) -> int:
        """3 for single-channel, 4 with a trailing channel axis
        (src/Infos.jl:350-357)."""
        return 3 if self.num_channels == 1 else 4

    def scale(self, mip: int) -> InfoScale:
        return self.scales[mip]

    def chunk_shape(self, mip: int) -> tuple[int, ...]:
        """Chunk array shape incl. channel axis (src/Infos.jl:376-381):
        chunking is spatial-only; channels ride along whole."""
        cs = self.scales[mip].chunk_size
        return cs if self.num_channels == 1 else (*cs, self.num_channels)

    def with_mips(self, num_mip: int) -> "Info":
        """Extend the pyramid to ``num_mip`` levels (src/Infos.jl:220-229)."""
        scales = list(self.scales)
        while len(scales) < num_mip:
            scales.append(scales[-1].next_mip())
        return replace(self, scales=scales)
