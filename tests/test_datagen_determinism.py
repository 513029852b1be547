"""The north rule requires the input table to be synthesised
DETERMINISTICALLY: generate() must be a pure function of
(n_docs, seed, media_scale) — byte-identical tables on every run."""

from __future__ import annotations

import hashlib

from ocr_service_spark.datagen import generate


def _file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def test_generate_is_pure_function_of_seed(tmp_path):
    a = generate(str(tmp_path / "a"), n_docs=40, seed=7)
    b = generate(str(tmp_path / "b"), n_docs=40, seed=7)
    for name in ("documents", "media", "golden"):
        assert _file_md5(a[name]) == _file_md5(b[name]), name


def test_generate_differs_across_seeds(tmp_path):
    a = generate(str(tmp_path / "a"), n_docs=40, seed=7)
    c = generate(str(tmp_path / "c"), n_docs=40, seed=8)
    assert _file_md5(a["media"]) != _file_md5(c["media"])
