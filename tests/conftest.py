from __future__ import annotations

import pytest

from memo_fraktur_ocr_code_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
