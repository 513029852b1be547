from __future__ import annotations

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.path.join(REPO, ".data", "test-ds")
N_DOCS = 300
SEED = 42


@pytest.fixture(scope="session")
def dataset():
    from ocr_service_spark.datagen import ensure_dataset

    return ensure_dataset(DATA_DIR, N_DOCS, SEED)


@pytest.fixture(scope="session")
def spark():
    from ocr_service_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[8]")
    yield s
    s.stop()
