import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from rag_pdf_parser_spark.session import get_spark

    s = get_spark("local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_df(spark):
    from rag_pdf_parser_spark.sources.pages import synth_pages

    return synth_pages(spark, 150).cache()


@pytest.fixture(scope="session")
def golden_docs():
    from rag_pdf_parser_spark.datagen import make_pages
    from rag_pdf_parser_spark.kernel import extract_document

    return {p["url"]: extract_document(p["html"]) for p in make_pages(150)}
