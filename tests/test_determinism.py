"""Determinism guard for rows-only queries.

Oracled queries prove determinism implicitly (they hash-match DuckDB);
the rows-only ones (sketches, ANN, Python feature extractors, packing)
could silently drift between executions — which would flake the driver's
repeated runs.  Two executions must return identical sorted results.
"""

from __future__ import annotations

import pytest

from dffoo_data_pipeline_spark.plans import all_queries
from tests.conftest import SF_SMOKE

# rows-only queries cheap enough to run twice (streaming and the
# disk-writing pipeline query are covered by their own tests)
ROWS_ONLY = [
    "agg_approx_distinct",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "multimodal_features",
    "text_compression_ratio",
    "embedding_pca_project",
    "events_sketch_rollup",
    "profile_approx_quantiles_lineitem",
    "corpus_bpe_encode",
    "dedup_lsh_quality_report",
]
# upgraded to full oracles in round 5 (determinism now proven by the
# DuckDB hash match): multimodal_audio_rms, multimodal_image_pixel_stats,
# abilities_parse_scaled; in round 6: multimodal_phash_neardup (integer-
# exact bit rule), multimodal_audio_segments (exact integer energy); in
# round 7: similarity_lsh_topk / similarity_ivf_topk (integer-lattice
# bucketing + exact-int cosine ranking), text_sequence_packing
# (hash-chunked next-fit replayed by a recursive-CTE oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_two_runs_identical(spark, name):
    q, o = all_queries()
    assert name not in o, f"{name} is oracled - drop it from this list"
    fn = q[name]

    def run():
        return sorted(map(tuple, fn(spark, SF_SMOKE).collect()))

    a, b = run(), run()
    assert a == b, f"{name} differs between executions"
    assert a, f"{name} returned no rows"
