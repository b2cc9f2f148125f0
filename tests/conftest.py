from __future__ import annotations

import sys
from pathlib import Path

# repo root on the path regardless of pytest's cwd — the per-file
# sys.path.insert(0, '.') / hardcoded-path variants only worked when
# pytest ran from the repo root
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest

from memo_fraktur_ocr_code_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
