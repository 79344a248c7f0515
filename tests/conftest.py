from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medical_doc_knowledge_graph_system_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mdkgs_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages50():
    from medical_doc_knowledge_graph_system_spark.datagen import gen_pages

    return gen_pages(50)


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    from medical_doc_knowledge_graph_system_spark.datagen import write_pages_parquet

    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    write_pages_parquet(str(p), 50)
    return str(p)


@pytest.fixture(scope="session")
def oracle50(pages50):
    from medical_doc_knowledge_graph_system_spark.corelib.oracle import run_pipeline

    return run_pipeline(pages50)


@pytest.fixture(scope="session")
def warehouse50(spark, pages_parquet, tmp_path_factory):
    from medical_doc_knowledge_graph_system_spark.pipeline import run_pipeline

    root = str(tmp_path_factory.mktemp("wh"))
    pages = spark.read.parquet(pages_parquet)
    stats = run_pipeline(spark, pages, root)
    return root, stats
