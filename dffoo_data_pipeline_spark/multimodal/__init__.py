"""Multimodal columns (BASELINE north star; no analog in the reference).

Image/audio/video payloads are opaque `binary` columns plus a typed
metadata struct; all plumbing — schemas, frame sampling, Arrow-batched
feature extraction — is real Spark, while the codec step (the only part
needing libs this container lacks) is stubbed deterministically.
"""

from dffoo_data_pipeline_spark.multimodal.assets import (  # noqa: F401
    QUERIES,
    ORACLES,
    byte_histogram_features,
    byte_histogram_rows,
    decode_image,
    documents_as_assets,
    fake_decode,
    frame_sample,
)
