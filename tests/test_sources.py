"""Hash-database source/sink round trips, mirroring the reference's DB
format tests (/root/reference/src/database.rs:581-737)."""

from __future__ import annotations

from pyspark.sql import Row

from quichash_spark.sources import hashdb


def _entries(spark):
    return spark.createDataFrame(
        [
            Row(hash="a" * 64, algorithm="sha256", fast_mode=False, path="/data/x.bin"),
            Row(hash="b" * 64, algorithm="sha256", fast_mode=True, path="/data/with  double  space.bin"),
            Row(hash="c" * 32, algorithm="md5", fast_mode=False, path="/данные/файл.bin"),
        ]
    )


def test_standard_roundtrip(spark, tmp_path):
    path = str(tmp_path / "db_standard")
    df = _entries(spark)
    hashdb.write_standard(df, path)
    back = hashdb.read_standard(spark, path)
    rows = {r["path"]: r for r in back.collect()}
    assert set(rows) == {"/data/x.bin", "/data/with  double  space.bin", "/данные/файл.bin"}
    assert rows["/data/with  double  space.bin"]["fast_mode"] is True
    assert rows["/данные/файл.bin"]["hash"] == "c" * 32
    assert all(r["valid"] for r in rows.values())
    assert hashdb.sniff_format(spark, path) == "standard"


def test_standard_malformed_lines_tolerated(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-00000.txt").write_text(
        "deadbeef  md5  normal  /ok/file\n"
        "garbage line without separator\n"
        "short  fields\n"
    )
    back = hashdb.read_standard(spark, str(p)).collect()
    valid = [r for r in back if r["valid"]]
    invalid = [r for r in back if not r["valid"]]
    assert len(valid) == 1 and valid[0]["path"] == "/ok/file"
    assert len(invalid) == 2  # surfaced, not silently dropped


def test_hashdeep_roundtrip_and_inference(spark, tmp_path):
    path = str(tmp_path / "db_hashdeep")
    df = spark.createDataFrame(
        [
            Row(hash="d" * 64, file_size=1024, path="/a"),
            Row(hash="e" * 64, file_size=2048, path="/b"),
        ]
    )
    hashdb.write_hashdeep(df, path, algorithm="sha256")
    back = hashdb.read_hashdeep(spark, path)
    rows = {r["path"]: r for r in back.collect()}
    assert rows["/a"]["file_size"] == 1024
    assert rows["/a"]["algorithm_from_header"] == "sha256"
    assert rows["/a"]["algorithm_inferred"] == "sha256"  # from length 64


def test_compressed_sink(spark, tmp_path):
    path = str(tmp_path / "db_gz")
    hashdb.write_standard(_entries(spark), path, compression="gzip")
    back = hashdb.read_standard(spark, path)
    assert back.filter("valid").count() == 3
