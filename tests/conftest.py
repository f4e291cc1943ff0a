from __future__ import annotations

import pytest

from pyspark.sql import SparkSession, types as T


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from ner_ocr_spark.session import get_spark

    s = get_spark(app_name="ner_ocr_spark-tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), False),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("offset", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


@pytest.fixture(scope="session")
def documents_df(spark):
    """Small deterministic corpus as the input_hint-shaped table."""
    from ner_ocr_spark import corpus

    rows = corpus.build_documents(40)
    return spark.createDataFrame(rows, DOC_SCHEMA).cache()
