# NOTE: codec modules (imagecodec/jpegcodec/audiocodec/videocodec) are
# deliberately NOT eagerly imported: they import numpy at module top and
# run inside executor-side mapInPandas kernels — keeping them lazy keeps
# driver imports light and numpy out of purely-relational use.  Import
# them explicitly: `from kerf_spark.operators import jpegcodec`.
from . import (  # noqa: F401
    asof,
    curation,
    dedup,
    graph,
    multimodal,
    packing,
    relational,
    sampling,
    similarity,
    sketches,
    skew,
    text,
    validate,
    windows,
)
