import pytest

from xtract import session


@pytest.fixture(scope="session")
def spark():
    s = session.build(app="xtract-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
