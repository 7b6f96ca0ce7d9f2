import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from lucene_solr_1_spark.session import get_spark
    s = get_spark(cores=4, shuffle_partitions=8, app="tests", driver_mem="6g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    import os
    p = tmp_path_factory.mktemp("idx")
    yield str(p)
    if not os.environ.get("KEEP_TMP"):
        shutil.rmtree(str(p), ignore_errors=True)
