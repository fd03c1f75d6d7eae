"""Index-artifact lifecycle: the MLlib LSH model is the engine's
persistent 'index' (the analog of the reference's Pinecone index,
/root/reference/main.py:23-71) — fit once as a batch job, save, load
anywhere, query identically."""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSHModel

from articulation_vector_db_api_spark.operators.mllib_index import (
    fit_brp_index,
    normalized_vectors,
)
from articulation_vector_db_api_spark.sources.readers import load_table
from tests.conftest import SF_SMALL


def test_lsh_index_save_load_roundtrip(spark, tmp_path):
    vectors = normalized_vectors(load_table(spark, SF_SMALL, "embeddings")).cache()
    model = fit_brp_index(vectors)
    path = str(tmp_path / "brp_index")
    model.write().overwrite().save(path)

    loaded = BucketedRandomProjectionLSHModel.load(path)
    orig = model.transform(vectors).select("vec_id", "hashes").collect()
    back = loaded.transform(vectors).select("vec_id", "hashes").collect()
    to_map = lambda rows: {  # noqa: E731
        r.vec_id: [tuple(v.toArray()) for v in r.hashes] for r in rows
    }
    assert to_map(orig) == to_map(back)  # identical bucket assignments
