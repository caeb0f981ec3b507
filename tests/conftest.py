import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pdf_inspector_spark.session import get_spark
    spark = get_spark("pdf-inspector-tests", cpus=4, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tsmall_path():
    from pdf_inspector_spark.transcripts import write_transcripts
    return write_transcripts("t-small")
