"""bigarrays_jl_spark — a PySpark-native chunked-array + analytics engine.

Re-expresses the capabilities of seung-lab/BigArrays.jl (reference at
/root/reference, v1.3.2) on top of Apache Spark DataFrames over object
storage, and extends them with the relational / LLM-data-pipeline surface
(dedup, similarity search, multimodal columns, text analysis, streaming)
required for 100 TB-scale training-data processing.

Layout
------
- ``infos``      — neuroglancer "precomputed" metadata (Info/InfoScale),
                   dtype map, mip-pyramid metadata generation.
- ``indexes``    — chunk-lattice arithmetic & neuroglancer key strings
                   (the reference's src/Indexes.jl, as pure functions +
                   Spark column expressions).
- ``codecs``     — chunk payload codecs (raw/gzip/zstd/blosc) with
                   magic-byte sniffing decode.
- ``volume``     — the Volume handle: open/create, cutout, write,
                   maintenance ops, voxel view (src/type.jl + src/modes).
- ``operators``  — relational + LLM-pipeline operators over DataFrames.
- ``sources``    — testdata loaders and path-scheme dispatch.
- ``streaming``  — Structured Streaming operators over event streams.
- ``session``    — SparkSession factory tuned for the engine.
"""

from bigarrays_jl_spark.infos import Info, InfoScale
from bigarrays_jl_spark.volume import Volume

__version__ = "0.1.0"

__all__ = ["Info", "InfoScale", "Volume", "__version__"]
