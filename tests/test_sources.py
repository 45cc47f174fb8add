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


#: byte-literal fixture exactly as the reference writer emits it
#: (src/database.rs:146-171: write_hashdeep_header + write_hashdeep_entry)
REFERENCE_HASHDEEP = (
    "%%%% HASHDEEP-1.0\n"
    "%%%% size,md5,sha256,filename\n"
    "## Invoked from: hash utility\n"
    "## $ hash scan --format hashdeep\n"
    "##\n"
    f"1024,{'a' * 32},{'b' * 64},/data/x.bin\n"
    f"2048,{'c' * 32},{'d' * 64},/данные/файл.bin\n"
)


def test_read_reference_hashdeep_file(spark, tmp_path):
    """A DB written by the actual reference binary must load: banner and
    ## comments skipped, algorithms taken from the banner, last comma
    field as filename (src/database.rs:334-401)."""
    p = tmp_path / "ref.hashdeep"
    p.write_text(REFERENCE_HASHDEEP)
    back = hashdb.read_hashdeep(spark, str(p))
    rows = {(r["path"], r["algorithm"]): r for r in back.collect()}
    assert len(rows) == 4  # 2 files x 2 algorithms
    assert rows[("/data/x.bin", "md5")]["hash"] == "a" * 32
    assert rows[("/data/x.bin", "sha256")]["hash"] == "b" * 64
    assert rows[("/данные/файл.bin", "md5")]["file_size"] == 2048
    assert all(r["valid"] for r in rows.values())
    assert hashdb.sniff_format(spark, str(p)) == "hashdeep"


def test_hashdeep_headerless_inference(spark, tmp_path):
    """No banner => algorithm inferred from hash length
    (src/database.rs:404-414)."""
    p = tmp_path / "bare.csv"
    p.write_text(f"10,{'e' * 32},/m\n20,{'f' * 40},/s\n")
    rows = {r["path"]: r for r in hashdb.read_hashdeep(spark, str(p)).collect()}
    assert rows["/m"]["algorithm"] == "md5"
    assert rows["/s"]["algorithm"] == "sha1"


def test_hashdeep_single_file_roundtrip(spark, tmp_path):
    """write_hashdeep_file output is byte-identical to the reference
    writer's format and round-trips through read_hashdeep."""
    df = spark.createDataFrame(
        [
            Row(md5="a" * 32, sha256="b" * 64, file_size=1024, path="/data/x.bin"),
            Row(md5="c" * 32, sha256="d" * 64, file_size=2048, path="/данные/файл.bin"),
        ]
    )
    out = str(tmp_path / "mine.hashdeep")
    hashdb.write_hashdeep_file(
        df, out, algorithms=["md5", "sha256"], hash_cols=["md5", "sha256"]
    )
    assert open(out, encoding="utf-8").read() == REFERENCE_HASHDEEP
    back = hashdb.read_hashdeep(spark, out)
    assert back.count() == 4


def test_hashdeep_distributed_sink_roundtrip(spark, tmp_path):
    path = str(tmp_path / "db_hashdeep")
    df = spark.createDataFrame(
        [
            Row(hash="d" * 64, file_size=1024, path="/a"),
            Row(hash="e" * 64, file_size=2048, path="/b"),
        ]
    )
    hashdb.write_hashdeep(df, path, algorithms=["sha256"])
    back = hashdb.read_hashdeep(spark, path + "/part-*")
    rows = {r["path"]: r for r in back.collect()}
    assert rows["/a"]["file_size"] == 1024
    # header is a sidecar part, not in the data glob; length inference used
    assert rows["/a"]["algorithm"] == "sha256"


def test_xz_transparent_read_and_compress(spark, tmp_path):
    """.xz databases written like the reference's compress_database
    (src/database.rs:45-78) load transparently in both formats."""
    plain = tmp_path / "db.txt"
    plain.write_text(
        f"{'a' * 64}  sha256  normal  /x\n{'b' * 32}  md5  fast  /y\n"
    )
    xz = hashdb.compress_database(str(plain), delete_src=True)
    assert xz.endswith(".xz") and not plain.exists()
    back = hashdb.read_standard(spark, xz)
    rows = {r["path"]: r for r in back.collect()}
    assert rows["/y"]["fast_mode"] is True and rows["/x"]["hash"] == "a" * 64
    assert hashdb.sniff_format(spark, xz) == "standard"

    hd = tmp_path / "ref.hashdeep"
    hd.write_text(REFERENCE_HASHDEEP)
    hd_xz = hashdb.compress_database(str(hd))
    assert hashdb.read_hashdeep(spark, hd_xz).count() == 4
    assert hashdb.sniff_format(spark, hd_xz) == "hashdeep"


def test_compressed_sink(spark, tmp_path):
    path = str(tmp_path / "db_gz")
    hashdb.write_standard(_entries(spark), path, compression="gzip")
    back = hashdb.read_standard(spark, path)
    assert back.filter("valid").count() == 3


def test_hashdeep_malformed_lines_surfaced(spark, tmp_path):
    """<3 comma fields must survive as valid=false rows (posexplode_outer),
    not vanish — same contract as the standard reader; the reference skips
    them silently (src/database.rs:581-596)."""
    p = tmp_path / "bad.hashdeep"
    p.write_text(
        "%%%% HASHDEEP-1.0\n"
        "%%%% size,md5,filename\n"
        f"1024,{'a' * 32},/ok/file\n"
        "no-commas-here\n"
        "only,two\n"
    )
    back = hashdb.read_hashdeep(spark, str(p)).collect()
    valid = [r for r in back if r["valid"]]
    invalid = [r for r in back if not r["valid"]]
    assert len(valid) == 1 and valid[0]["path"] == "/ok/file"
    assert len(invalid) == 2
    assert all(r["hash"] is None for r in invalid)


def test_hashdeep_dir_read_uses_header_banner(spark, tmp_path):
    """Reading a write_hashdeep DIR must take algorithm names from the
    _HEADER banner (Spark's text reader skips _-prefixed parts), not fall
    back to hash-length inference — a 64-hex blake3 would otherwise be
    misnamed sha256."""
    path = str(tmp_path / "db_blake3")
    df = spark.createDataFrame(
        [Row(hash="d" * 64, file_size=1024, path="/a")]
    )
    hashdb.write_hashdeep(df, path, algorithms=["blake3"])
    rows = hashdb.read_hashdeep(spark, path).collect()
    assert rows[0]["algorithm"] == "blake3"


def test_pyfiles_zip_is_fresh():
    """quichash_spark.zip is the spark-submit --py-files artifact
    (jobs/run_pipeline.py); a stale zip ships old code to executors, so
    every module in the package tree must be present with identical
    bytes."""
    import pathlib
    import zipfile

    import pytest

    root = pathlib.Path(__file__).resolve().parent.parent
    zp = root / "quichash_spark.zip"
    if not zp.exists():  # untracked build artifact (see jobs/run_pipeline.py)
        pytest.skip("quichash_spark.zip not built")
    zf = zipfile.ZipFile(zp)
    names = set(zf.namelist())
    # *.c: cc_kernels compiles qh_hash.c on the executor node, reading it
    # through importlib.resources — it must travel inside the zip too
    for pat in ("*.py", "*.c"):
        for py in (root / "quichash_spark").rglob(pat):
            if "__pycache__" in py.parts:
                continue
            rel = py.relative_to(root).as_posix()
            assert rel in names, f"{rel} missing from quichash_spark.zip"
            assert zf.read(rel) == py.read_bytes(), f"{rel} stale in zip"
