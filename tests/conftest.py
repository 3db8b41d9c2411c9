import pytest

from codebased_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("codebased-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from codebased_spark.synth.pages import gen_pages

    return gen_pages(n_docs=120)
