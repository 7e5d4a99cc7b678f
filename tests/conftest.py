import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from quadtree_block_compression_spark.session import build_session
    s = build_session("qbcs-tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ["SPARK_GRAFT_SF_DIR"]


@pytest.fixture(scope="session")
def tiny_images(spark):
    """16-row deterministic images table (FIXTURES.md 'tiny' scale)."""
    from quadtree_block_compression_spark.fixtures.images import images_pandas
    pdf = images_pandas(16, seed=42, max_side=128)
    return spark.createDataFrame(pdf).cache()
