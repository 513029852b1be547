"""Split planning: the sidecar split manifest must yield the exact
(path, row_group, bytes, rows) tuples the parquet footers do, with a
clean fallback to (threaded) footer reads when the manifest is missing
or stale — the O(1)-driver analog of Iceberg-manifest planning."""

from __future__ import annotations

import os
import shutil

from ocr_service_spark.pipeline.extract import (
    SPLIT_MANIFEST_NAME,
    _direct_read_splits,
    _splits_from_manifest,
    write_split_manifest,
)


def _media_paths(dataset):
    return dataset["media"]


def test_manifest_matches_footers(spark, dataset):
    media_path = _media_paths(dataset)
    data_dir = os.path.dirname(media_path)
    man = os.path.join(data_dir, SPLIT_MANIFEST_NAME)
    assert os.path.exists(man), "datagen should write the manifest"

    media = spark.read.parquet(media_path)
    with_manifest = _direct_read_splits(media)
    # remove the manifest → footer path
    backup = man + ".bak"
    os.rename(man, backup)
    try:
        from_footers = _direct_read_splits(media)
    finally:
        os.rename(backup, man)
    assert with_manifest is not None and from_footers is not None
    assert sorted(with_manifest) == sorted(from_footers)
    assert len(with_manifest) > 1  # row_group_size=16 → many splits


def test_stale_manifest_falls_back(spark, dataset, tmp_path):
    # copy the media file under a NEW name next to a manifest that only
    # knows the old name → manifest unusable → footer fallback, same data
    media_path = _media_paths(dataset)
    d = tmp_path / "tbl"
    d.mkdir()
    shutil.copyfile(media_path, d / "renamed.parquet")
    shutil.copyfile(
        os.path.join(os.path.dirname(media_path), SPLIT_MANIFEST_NAME),
        d / SPLIT_MANIFEST_NAME,
    )
    assert _splits_from_manifest([str(d / "renamed.parquet")]) is None
    media = spark.read.parquet(str(d / "renamed.parquet"))
    splits = _direct_read_splits(media)
    assert splits and all(p.endswith("renamed.parquet") for p, *_ in splits)


def test_write_split_manifest_roundtrip(tmp_path, dataset):
    # writing a manifest for an arbitrary table dir makes it plannable
    media_path = _media_paths(dataset)
    d = tmp_path / "tbl2"
    d.mkdir()
    shutil.copyfile(media_path, d / "part-0.parquet")
    out = write_split_manifest(str(d))
    assert os.path.basename(out) == SPLIT_MANIFEST_NAME
    splits = _splits_from_manifest([str(d / "part-0.parquet")])
    assert splits and sum(rows for *_x, rows in splits) > 0
