"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL
for every operator claimed in SURVEY.md §2 (and the training-data
extensions), over the shared testdata tables.

Naming rule (driver compares value-hashes after sorting columns BY NAME):
every computed column is aliased identically in the Spark plan and the
oracle SQL.  Counters are integers wherever possible; the few float
columns are rounded to fixed decimals on both sides.

Queries with no SQL-expressible oracle (LSH internals, clip pipeline,
streaming, ANN) appear in QUERIES but not in ORACLE_SQL — the driver
records the weaker rows-only check for those (per the driver contract).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quichash_spark.functions import text as T
from quichash_spark.operators import compare as C
from quichash_spark.operators import doc_dedup as D
from quichash_spark.operators import similarity as S
from quichash_spark.streaming.events import windowed_event_stats

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _doc_path() -> F.Column:
    return F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("path")


# ---------------------------------------------------------------------------
# documents: dedup channels
# ---------------------------------------------------------------------------


def q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return D.exact_dup_groups(docs).select("text_md5", F.col("n").cast("long").alias("n"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    p = D.ngram_jaccard_pairs(docs, k=3, threshold=0.4)
    return p.select(
        "doc_a", "doc_b",
        F.col("inter").cast("long").alias("inter"),
        F.col("uni").cast("long").alias("uni"),
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    p = D.minhash_lsh_pairs(docs, k=3, threshold=0.4)
    return p.select(
        "doc_a", "doc_b",
        F.col("inter").cast("long").alias("inter"),
        F.col("uni").cast("long").alias("uni"),
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return D.simhash_pairs(docs)


_SHINGLE_CTE = """
with toks as (
  select doc_id, regexp_split_to_array(trim(text), '\\s+') as w from documents
), sh as (
  select doc_id,
         case when len(w) < 3 then list_distinct([array_to_string(w, ' ')])
              else list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)])
         end as shingles
  from toks
), pairs as (
  select a.doc_id as doc_a, b.doc_id as doc_b,
         len(list_intersect(a.shingles, b.shingles)) as inter,
         len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles)) as uni
  from sh a join sh b on a.doc_id < b.doc_id
)
"""

_JACCARD_SQL = (
    _SHINGLE_CTE
    + "select doc_a, doc_b, inter, uni from pairs where uni > 0 and inter * 1000 >= uni * 400"
)


# ---------------------------------------------------------------------------
# documents: text analysis
# ---------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        T.n_tokens(c).cast("long").alias("n_tokens"),
        T.n_punct(c).cast("long").alias("n_punct"),
        T.n_digits(c).cast("long").alias("n_digits"),
        T.n_stopwords(c).cast("long").alias("n_stopwords"),
        T.total_token_chars(c).cast("long").alias("token_chars"),
    )


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.n_tokens_bpe(F.col("text")).cast("long").alias("n_tokens_bpe")
    )


def q_doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash (winnowing) fingerprint overlap pairs — rows-only."""
    from quichash_spark.functions.winnow import fingerprint_overlap_pairs

    docs = _read(spark, sf_dir, "documents")
    # this synthetic corpus shares a tiny vocabulary, so low-overlap pairs
    # are ubiquitous; report the top overlaps (deterministic tie-break)
    return (
        fingerprint_overlap_pairs(docs, min_shared=3)
        .orderBy(F.desc("shared_fingerprints"), "doc_a", "doc_b")
        .limit(100)
    )


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (functions/pii.py): per-type regexp counts + a
    sequential redaction chain, all whole-stage-codegen JVM.  The
    synthetic documents carry no PII, so the query injects
    deterministic email/IP/phone/SSN-shaped tokens via arithmetic on
    doc_id — the EXACT same expression the DuckDB oracle builds — then
    scrubs; the md5 of the redacted text and all four counts must
    match an independent regex engine (Java regex vs RE2; patterns
    restricted to the common-semantics subset)."""
    from quichash_spark.functions.pii import scrub_pii

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s = lambda x: x.cast("string")  # noqa: E731
    empty = F.lit("")
    aug = F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.concat(
            F.lit(" mail user"), s(d), F.lit("@example.com"))).otherwise(empty),
        F.when(d % 5 == 0, F.concat(
            F.lit(" node 10.0."), s(d % 256), F.lit("."), s(d % 100))).otherwise(empty),
        F.when(d % 7 == 0, F.concat(
            F.lit(" call +1 555-"), F.lpad(s(d % 10000), 4, "0"))).otherwise(empty),
        F.when(d % 11 == 0, F.concat(
            F.lit(" id 093-12-"), F.lpad(s(d % 10000), 4, "0"))).otherwise(empty),
    )
    scrubbed = scrub_pii(docs.select("doc_id", aug.alias("text")), "text")
    return scrubbed.select(
        "doc_id", F.md5("text").alias("scrub_md5"),
        "n_email", "n_phone", "n_ssn", "n_ipv4",
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition / boilerplate signals (Gopher-style quality rules):
    duplicate-word fraction and top-word fraction per document.  Pure
    JVM and SHUFFLE-FREE (r5): a document's words already live in its
    own row, so the top-word count is a per-row ``array_sort`` +
    ``aggregate`` run-length maximum inside whole-stage codegen — the
    previous explode + two-shuffle formulation inflated 5000 docs into
    ~2.5M (doc, word) rows and moved them across the cluster twice for
    a value that never needed to leave the row (measured 2.9 s -> this
    plan is a plain scan+project).  At 100 TB: zero exchanges; cost is
    linear per row regardless of executor count.  Oracle: DuckDB
    recomputes from string_split (unchanged)."""
    docs = _read(spark, sf_dir, "documents")
    words_arr = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    sorted_w = F.array_sort(words_arr)
    step = lambda acc, w: F.struct(  # noqa: E731 — run-length max fold
        w.alias("prev"),
        F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    top_cnt = F.aggregate(
        sorted_w,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        step,
        lambda acc: acc["best"],
    )
    return docs.select(
        "doc_id",
        F.size(words_arr).cast("long").alias("n_words"),
        F.size(F.array_distinct(words_arr)).cast("long").alias("n_distinct"),
        F.round(
            1 - F.size(F.array_distinct(words_arr)) / F.size(words_arr), 6
        ).alias("dup_word_frac"),
        F.round(top_cnt / F.size(words_arr), 6).alias("top_word_frac"),
    )


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id(F.col("text")).alias("lang_pred"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint_md5(F.col("text")).alias("fingerprint"))


def q_multi_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P2 (single-pass multi-hash) + F3 (algorithm inference)."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        T.algorithm_from_hash_length(F.md5("text")).alias("algo_md5"),
        T.algorithm_from_hash_length(F.sha2(F.col("text"), 256)).alias("algo_sha256"),
    )


def q_fast_mode_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P3 (fast-mode sampled hashing, src/hash.rs:977-1066):
    digest of first/middle/last regions above a size threshold."""
    from quichash_spark.functions.hashreg import fast_mode_md5

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", fast_mode_md5(F.col("text")).alias("fast_md5"))


def q_decontaminate_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination hits: every 50th document plays the part
    of an eval benchmark; any training doc sharing an 8-token verbatim
    shingle with one is flagged (broadcast eval join — see
    operators/decontaminate.py for the 10^12-row shape)."""
    from quichash_spark.operators.decontaminate import contamination_hits

    docs = _read(spark, sf_dir, "documents")
    evals = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    return contamination_hits(docs, evals, k=8).select(
        "doc_id",
        "eval_id",
        "shared_shingles",
        F.col("eval_shingles").cast("long").alias("eval_shingles"),
    )


def q_hashdb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/S8/S10/S11 in one green query: write the documents table as a
    standard DB, a distributed hashdeep DB, and an `.xz` single-file
    hashdeep DB; read each back through the format-detecting sources and
    emit (format, path, algorithm, hash, file_size, valid, sniffed).
    Mirrors the reference's round-trip tests
    (/root/reference/src/database.rs:606-634) and its sniffing/compression
    paths (src/database.rs:36-130)."""
    import shutil
    import tempfile

    from quichash_spark.sources import hashdb

    docs = _read(spark, sf_dir, "documents")
    db = docs.select(
        _doc_path(),
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.length("text").cast("long").alias("file_size"),
    )
    root = tempfile.mkdtemp(prefix="qh_dbrt_")
    try:
        std_dir = os.path.join(root, "std")
        hd_dir = os.path.join(root, "hd")
        hashdb.write_standard(
            db.select(
                F.col("md5_hex").alias("hash"),
                F.lit("md5").alias("algorithm"),
                F.lit(False).alias("fast_mode"),
                "path",
            ),
            std_dir,
        )
        hashdb.write_hashdeep(
            db, hd_dir, algorithms=["md5", "sha256"],
            hash_cols=["md5_hex", "sha256_hex"],
        )
        hd_file = os.path.join(root, "hd_single.txt")
        hashdb.write_hashdeep_file(
            db, hd_file, algorithms=["md5", "sha256"],
            hash_cols=["md5_hex", "sha256_hex"],
        )
        xz_path = hashdb.compress_database(hd_file)

        def tag(df: DataFrame, fmt: str, src: str, with_size: bool) -> DataFrame:
            return df.select(
                F.lit(fmt).alias("format"),
                "path",
                "algorithm",
                "hash",
                (F.col("file_size") if with_size else F.lit(None).cast("long")).alias(
                    "file_size"
                ),
                "valid",
                F.lit(hashdb.sniff_format(spark, src)).alias("sniffed"),
            )

        out = (
            tag(hashdb.read_standard(spark, std_dir), "standard", std_dir, False)
            .unionByName(tag(hashdb.read_hashdeep(spark, hd_dir), "hashdeep", hd_dir, True))
            .unionByName(
                tag(hashdb.read_hashdeep(spark, xz_path), "hashdeep_xz", xz_path, True)
            )
        )
        # the reads above are lazy over files in `root`: materialize before
        # the temp dir is deleted (localCheckpoint keeps it executor-side)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def q_hashignore_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P4 (gitignore-semantics .hashignore filter,
    /root/reference/src/ignore_handler.rs:27-82): per-path ignore decisions
    over deterministic synthetic paths, exercising basename globs, negation,
    dir-only patterns, root anchoring and globstar in one rule set."""
    from quichash_spark.operators.hashignore import ignored_col, parse_hashignore

    docs = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    d = F.col("doc_id").cast("string")
    path = (
        F.when(m == 0, F.concat(F.lit("logs/doc_"), d, F.lit(".log")))
        .when(m == 1, F.concat(F.lit("keep_"), d, F.lit(".log")))
        .when(m == 2, F.lit("tmp"))
        .when(m == 3, F.concat(F.lit("top_secret_"), d))
        .when(m == 4, F.concat(F.lit("data/x"), d, F.lit("/cache")))
        .otherwise(F.concat(F.lit("src/doc_"), d, F.lit(".txt")))
    )
    rules = parse_hashignore("*.log\n!keep*.log\ntmp/\n/top_secret*\ndata/**/cache\n")
    return docs.select(
        "doc_id",
        path.alias("path"),
        ignored_col(rules, path, m == 2).alias("ignored"),
    )


def _markers_sql(lang: str) -> str:
    alt = "|".join(T.LANG_MARKERS[lang])
    return f"len(regexp_extract_all(text, '\\b({alt})\\b'))"


# ---------------------------------------------------------------------------
# verify / compare / moved / anti (reference J1-J3, U2-U3)
# ---------------------------------------------------------------------------


def q_verify_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected snapshot vs deterministically mutated actual snapshot."""
    docs = _read(spark, sf_dir, "documents")
    expected = docs.select(_doc_path(), F.md5("text").alias("hash"))
    actual = (
        docs.filter(F.col("doc_id") % 11 != 0)  # missing on disk
        .select(
            _doc_path(),
            F.md5(
                F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("X")))
                .otherwise(F.col("text"))
            ).alias("hash"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 13 == 0).select(  # new files
                F.concat(F.lit("doc_new_"), F.col("doc_id").cast("string")).alias("path"),
                F.md5(F.concat(F.col("text"), F.lit("N"))).alias("hash"),
            )
        )
    )
    return C.verify_classify(expected, actual)


def _human_size_col(nbytes: F.Column) -> F.Column:
    """Reference F4 (human KB/MB/GB formatting, compare.rs:60-74) as a JVM
    column expression.  Two-decimal value via pure INTEGER half-up
    arithmetic — centi-units = (200*n + base) div (2*base) — so the
    DuckDB oracle reproduces it bit-exactly (float printf rounding is not
    portable across engines).  The divide is a shiftright (2*base is a
    power of two), i.e. TRUE long division: Spark's `/` on longs is double
    division, which diverges from the oracle's integer `//` once the
    numerator exceeds 2^53 (~45 TB wasted — reachable at the 100 TB design
    point)."""
    def fmt(base: int, unit: str) -> F.Column:
        shift = (2 * base).bit_length() - 1  # 2*base == 1 << shift
        centi = F.shiftright(nbytes * 200 + F.lit(base), shift).cast("long")
        return F.concat(
            F.floor(centi / 100).cast("long").cast("string"),
            F.lit("."),
            F.lpad((centi % 100).cast("string"), 2, "0"),
            F.lit(f" {unit}"),
        )

    kb, mb, gb = 1024, 1024**2, 1024**3
    return (
        F.when(nbytes < kb, F.concat(nbytes.cast("string"), F.lit(" B")))
        .when(nbytes < mb, fmt(kb, "KB"))
        .when(nbytes < gb, fmt(mb, "MB"))
        .otherwise(fmt(gb, "GB"))
    )


def q_analyze_wasted_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A3+B1+F4 in one report: duplicate groups with wasted
    space ((n-1)*size, dedup.rs:610/analyze.rs:426) and the
    human-readable size column of the CLI report (compare.rs:60-74)."""
    docs = _read(spark, sf_dir, "documents")
    groups = (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max(F.length("text")).cast("long").alias("size_bytes"),
        )
        .filter(F.col("n") > 1)
    )
    wasted = (F.col("n") - 1) * F.col("size_bytes")
    return groups.select(
        "text_md5",
        "n",
        "size_bytes",
        wasted.cast("long").alias("wasted_bytes"),
        _human_size_col(wasted.cast("long")).alias("wasted_human"),
    )


def q_verify_fast_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference J1 detail: verify recomputes each entry WITH THE MODE
    RECORDED in its DB row — fast sampled digest vs full digest
    (/root/reference/src/verify.rs:303-307).  Every third doc is stored
    fast-mode; every seventh is mutated on 'disk', so mismatches must be
    caught through whichever digest mode the DB row prescribes."""
    from quichash_spark.functions.hashreg import fast_mode_md5

    docs = _read(spark, sf_dir, "documents")
    fast = F.col("doc_id") % 3 == 0
    expected = docs.select(
        _doc_path(),
        fast.alias("fast_mode"),
        F.when(fast, fast_mode_md5(F.col("text")))
        .otherwise(F.md5("text"))
        .alias("expected_hash"),
    )
    mutated = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("X"))
    ).otherwise(F.col("text"))
    actual = docs.select(
        _doc_path(),
        F.when(fast, fast_mode_md5(mutated)).otherwise(F.md5(mutated)).alias(
            "actual_hash"
        ),
    )
    return expected.join(actual, "path").select(
        "path",
        "fast_mode",
        "expected_hash",
        "actual_hash",
        F.when(F.col("expected_hash") == F.col("actual_hash"), "match")
        .otherwise("mismatch")
        .alias("status"),
    )


def q_compare_dbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    db1 = docs.select(_doc_path(), F.md5("text").alias("hash"))
    db2 = (
        docs.filter(F.col("doc_id") % 9 != 0)  # removed
        .select(
            _doc_path(),
            F.md5(
                F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit("Y")))
                .otherwise(F.col("text"))
            ).alias("hash"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                F.concat(F.lit("doc_add_"), F.col("doc_id").cast("string")).alias("path"),
                F.md5(F.concat(F.col("text"), F.lit("A"))).alias("hash"),
            )
        )
    )
    return C.compare_dbs(db1, db2)


def q_moved_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-equal files at different paths, zip-paired per hash group —
    two old paths and two new paths per hash exercise the positional zip."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    h = F.md5("text").alias("hash")
    removed = docs.select(
        h, F.concat(F.lit("old/a/"), F.col("doc_id").cast("string")).alias("path")
    ).unionByName(
        docs.select(
            h, F.concat(F.lit("old/b/"), F.col("doc_id").cast("string")).alias("path")
        )
    )
    added = docs.select(
        h, F.concat(F.lit("new/x/"), F.col("doc_id").cast("string")).alias("path")
    ).unionByName(
        docs.select(
            h, F.concat(F.lit("new/y/"), F.col("doc_id").cast("string")).alias("path")
        )
    )
    return C.moved_files(removed, added)


def q_anti_new_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    fs = docs.select(_doc_path())
    db = docs.filter(F.col("doc_id") % 3 != 0).select(_doc_path())
    return C.new_files(fs, db)


def q_analyze_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    entries = docs.select(F.md5("text").alias("hash"))
    return C.analyze_summary(entries)


def q_scan_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
    )


def q_glob_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference S6 (wildcard expansion, /root/reference/src/wildcard.rs:
    23-69) as hard driver signal: the documents table is split into
    three on-disk source dirs (``src_0..src_2`` by ``doc_id % 3`` —
    deterministic, so DuckDB can re-derive membership), read back
    through ONE glob path ``src_*`` resolved by the reader, the source
    dir recovered per-row from ``input_file_name()``, and rolled up per
    source.  Wrong glob expansion (missed dir, double-read) shifts the
    counts and hash-fails."""
    import shutil
    import tempfile

    docs = _read(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="qh_glob_")
    try:
        for k in range(3):
            (docs.filter(F.col("doc_id") % 3 == k)
             .write.mode("overwrite").parquet(os.path.join(root, f"src_{k}")))
        globbed = spark.read.parquet(os.path.join(root, "src_*"))
        res = (
            globbed.withColumn(
                "src_bucket",
                F.regexp_extract(F.input_file_name(), r"src_(\d+)/", 1)
                .cast("int"),
            )
            .groupBy("src_bucket")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
            )
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return res


def q_json_report_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference S9 (JSON report, /root/reference/src/main.rs:149-179):
    ``sources.reports.write_json_report`` writes a driver-side summary
    JSON plus the detail rows through the distributed json sink; the
    query reads BOTH back (explicit schema — at scale inference is a
    second full pass) and returns a per-lang rollup computed FROM the
    round-tripped detail, with the summary's totals appended as a
    ``__total__`` row.  Any value corrupted by the JSON encode/decode
    leg shifts a rollup row and hash-fails against DuckDB recomputing
    straight from the parquet table."""
    import json
    import shutil
    import tempfile

    from quichash_spark.sources.reports import write_json_report

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    root = tempfile.mkdtemp(prefix="qh_jsonrep_")
    try:
        agg = docs.agg(
            F.count("*").alias("n"), F.sum("n_chars").alias("chars")
        ).collect()[0]
        summary = {
            "total_docs": int(agg["n"]),
            "total_chars": int(agg["chars"]),
        }
        write_json_report(
            summary, docs.select("doc_id", "lang", "n_chars"), root
        )
        detail = spark.read.schema("doc_id long, lang string, n_chars long").json(
            os.path.join(root, "detail")
        )
        with open(os.path.join(root, "summary.json")) as f:
            back = json.load(f)
        per_lang = detail.groupBy("lang").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        total = spark.createDataFrame(
            [("__total__", back["total_docs"], back["total_chars"])],
            "lang string, n_docs long, total_chars long",
        )
        res = per_lang.unionByName(total).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return res


def q_top_docs_by_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference B1/B2 sort+report shape with deterministic tie-break."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.topk_bruteforce(queries, emb, k=5)


def q_sim_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return S.neardup_pairs(emb, threshold=0.35)


#: embedding dimension of the driver-generated testdata (TESTDATA.md) —
#: fixed across scale factors.  Passed explicitly so building the ANN plan
#: submits NO job (a `.first()` probe here used to cost one tiny job per
#: invocation at plan-build time).
EMBEDDING_DIM = 64


def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ann_lsh_topk(queries, emb, k=5, dim=EMBEDDING_DIM, n_planes=6,
                          n_tables=16)


def q_sem_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings table: cosine
    near-dup pairs -> connected components -> min-id representative per
    cluster, singletons self-labeled.  The oracle reproduces the WHOLE
    operator in SQL — including connected components via a recursive-CTE
    min-label propagation — so the large-star/small-star CC job is
    value-checked against an independent engine, not only the fixture."""
    from quichash_spark.operators.connected_components import connected_components

    emb = _read(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    pairs = S.neardup_pairs(emb, threshold=0.35)
    # CC's union-find tail carries string ids (the clip pipeline's shape);
    # zero-pad so string min == numeric min, cast back after
    pad = lambda c: F.lpad(F.col(c).cast("string"), 8, "0")  # noqa: E731
    edges = pairs.select(pad("id_a").alias("clip_a"), pad("id_b").alias("clip_b"))
    assigned = connected_components(edges).select(
        F.col("clip_id").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )
    singles = (
        emb.select(F.col("vec_id").cast("long").alias("vec_id"))
        .join(assigned.select("vec_id"), "vec_id", "left_anti")
        .select("vec_id", F.col("vec_id").alias("cluster_id"))
    )
    return assigned.unionByName(singles).select(
        "vec_id", "cluster_id",
        (F.col("vec_id") == F.col("cluster_id")).alias("is_rep"),
    )


def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_topk(queries, emb, k=5, n_centroids=16, n_probe=4)


def q_sim_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (ADC shortlist + exact refine): the
    memory-compression scale path — the corpus is scanned as (n, m) small
    codes, float vectors touched only at encode time and for the
    shortlist re-rank.  Oracle: sequential replica rows (pq.parquet)."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.pq_topk(queries, emb, k=5).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "rank",
        "cosine",
    )


# ---------------------------------------------------------------------------
# events: windowed aggregation + JSON extraction
# ---------------------------------------------------------------------------


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return windowed_event_stats(ev)


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


# ---------------------------------------------------------------------------
# lineitem/orders: classic scan-agg and join-agg (engine breadth + bench)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# clips corpus (rows-only checks: non-SQL-expressible pipeline stages)
# ---------------------------------------------------------------------------


def _clips_n(sf_dir: str) -> int:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.01
    return max(200, int(sf * 50_000))


def q_clips_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.functions.udfs import compute_signatures

    clips = materialized_clips(spark, _clips_n(sf_dir))
    # scalar columns only: the driver's canonicalizer sorts every column,
    # so array columns (minhash/band_keys) must not reach it
    return compute_signatures(clips, CLIPS_CONFIG).drop(
        "minhash_text", "minhash_pcm", "band_keys_text", "band_keys_pcm"
    )


def q_clips_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.functions.udfs import compute_signatures
    from quichash_spark.operators.exact_dedup import exact_duplicate_groups

    clips = materialized_clips(spark, _clips_n(sf_dir))
    sigs = compute_signatures(clips, CLIPS_CONFIG)
    return exact_duplicate_groups(sigs).drop("clip_ids")


def q_clips_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import run_pipeline

    n = _clips_n(sf_dir)
    clips = materialized_clips(spark, n)
    res = run_pipeline(spark, clips, f"/tmp/quichash_ckpt/v2_n{n}")
    return res.clusters


def q_clips_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import run_pipeline

    n = _clips_n(sf_dir)
    clips = materialized_clips(spark, n)
    res = run_pipeline(spark, clips, f"/tmp/quichash_ckpt/v2_n{n}")
    return res.candidates


def q_clips_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (pipeline.incremental_update): the first 80%
    of the corpus is clustered as the PRIOR run (its checkpoint reused
    verbatim — old bytes never re-decoded), the remaining 20% arrives
    as the increment and is assigned/merged through new-involved
    candidates + prior-assignment edges.  The output must equal the
    full-batch transitive closure, so the oracle is the SAME
    brute-force numpy clusters fixture the batch query uses — the
    strongest possible check that incremental == batch."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import incremental_update, run_pipeline

    n = _clips_n(sf_dir)
    n_old = n * 4 // 5
    clips = materialized_clips(spark, n)
    boundary = f"clip_{n_old:08d}"
    old = clips.filter(F.col("clip_id") < boundary)
    new = clips.filter(F.col("clip_id") >= boundary)
    run_pipeline(spark, old, f"/tmp/quichash_ckpt/v2_incr_prior_n{n}")
    res = incremental_update(
        spark, f"/tmp/quichash_ckpt/v2_incr_prior_n{n}", new, clips,
        f"/tmp/quichash_ckpt/v2_incr_delta_n{n}",
    )
    return res.clusters


def q_clips_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone suffix-containment pass (north_rule stage 5) over the
    clips corpus: token-level transcript containment within LSH buckets."""
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.functions.udfs import compute_signatures
    from quichash_spark.operators.containment import containment_candidates

    clips = materialized_clips(spark, _clips_n(sf_dir))
    # eager checkpoint: containment references the signature table three
    # times (band sizes, kept join, texts) — without materialization the
    # Arrow decode kernel re-runs per branch (r6; the doc_dedup pattern)
    sigs = compute_signatures(clips, CLIPS_CONFIG).localCheckpoint(eager=True)
    return containment_candidates(sigs, CLIPS_CONFIG)


def q_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video modality end-to-end (functions/video.py): deterministic
    synthetic AVI payloads generated executor-side (pure function of the
    index, fixtures/media.py::gen_video_payload — DIB, I420 and YUY2
    raw-frame codecs), parsed + frame-sampled + perceptually hashed by
    ``video_features``.  Value-checked (VERDICT r4 #3): DuckDB cannot
    parse AVI, so the oracle reads rows materialized by the same frozen
    kernels run item-by-item driver-side
    (oracle/fixture.py::sequential_video_features) — the fp/aemb
    fixture pattern."""
    import pandas as pd

    from quichash_spark.functions.video import video_features

    n = max(20, _clips_n(sf_dir) // 25)

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                from quichash_spark.fixtures.media import gen_video_payload

                rows.append({
                    "item_id": f"vid_{int(i):06d}",
                    "payload": gen_video_payload(int(i)),
                })
            yield pd.DataFrame(rows, columns=["item_id", "payload"])

    items = spark.range(0, n, 1, 4).mapInPandas(gen, "item_id string, payload binary")
    feats = video_features(items, k_frames=4)
    return feats.select(
        "item_id", "decode_ok", "n_frames", "width", "height",
        F.round("fps", 3).alias("fps"),
        F.concat_ws("|", "sampled_phash").alias("phash_concat"),
        F.round("mean_luma", 6).alias("mean_luma"),
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image modality end-to-end (functions/multimodal.py image_features
    over every REAL decoder — PNG, BMP, baseline + progressive +
    lossless (SOF3) JPEG, WebP-lossless with transforms — plus a
    malformed row): deterministic
    payloads generated executor-side (pure function of the index,
    fixtures/media.py::gen_image_payload), decoded + phashed through the
    mapInPandas kernel.  DuckDB cannot decode these formats, so the
    oracle reads rows materialized by the same frozen kernels run
    item-by-item driver-side
    (oracle/fixture.py::sequential_image_features)."""
    import pandas as pd

    from quichash_spark.functions.multimodal import image_features

    n = max(25, _clips_n(sf_dir) // 20)

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                from quichash_spark.fixtures.media import gen_image_payload

                payload, codec = gen_image_payload(int(i))
                rows.append({
                    "item_id": f"img_{int(i):06d}",
                    "payload": payload,
                    "codec": codec,
                })
            yield pd.DataFrame(rows, columns=["item_id", "payload", "codec"])

    items = spark.range(0, n, 1, 4).mapInPandas(
        gen, "item_id string, payload binary, codec string"
    )
    feats = image_features(items)
    return feats.select(
        "item_id", "decode_ok", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        "phash",
    )


def q_stream_neardup_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-duplicate assignment (streaming/cluster.py band-key
    state) as a driver query: availableNow over the DETERMINISTIC stream
    layout (fixtures.materialized_clips_stream — mtime-ordered chunk
    files), split into micro-batches (maxFilesPerTrigger) so near-dups
    genuinely cross batch boundaries and must join via STATE.

    Value-checked (VERDICT r4 #2): batch membership is a pure function
    of the layout, and the stateful operator seeds each new band key
    with the min-clip_id presenter of the micro-batch (_sorted_group),
    so the full per-clip assignment is order-invariant and compared
    hash-exact against a dict-and-loop sequential replica
    (oracle/fixture.py::sequential_stream_neardup)."""
    import shutil
    import tempfile

    from quichash_spark.fixtures import (
        STREAM_FILES_PER_TRIGGER, materialized_clips_stream,
    )
    from quichash_spark.streaming.cluster import stream_near_dup_assign

    src = materialized_clips_stream(_clips_n(sf_dir))
    root = tempfile.mkdtemp(prefix="qh_sneardup_")
    try:
        out = stream_near_dup_assign(
            spark, src,
            checkpoint_dir=os.path.join(root, "ckpt"),
            out_dir=os.path.join(root, "out"),
            max_files_per_trigger=STREAM_FILES_PER_TRIGGER,
        )
        # materialize before the temp dirs vanish (executor-side blocks)
        res = out.select(
            "clip_id", "cluster_id", "joined_existing"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return res


def q_audio_pair_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel fusion: the landmark fingerprint channel (same
    *recording*, time-shift-robust) FULL-OUTER-joined with the MFCC
    embedding channel (similar *sound*) into one per-pair verdict —
    'recording+perceptual' / 'recording' / 'perceptual'.  The product
    answer a dedup reviewer actually wants: which evidence backs this
    pair.  Oracle: DuckDB joins the two sequential-replica fixture
    parquets with the same case expression."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.functions.audio_embed import (
        ANN_NEARDUP_PARAMS, EMBED_DIM, NEARDUP_THRESHOLD,
        compute_audio_embeddings,
    )
    from quichash_spark.functions.fingerprint import compute_fingerprints
    from quichash_spark.operators.fingerprint_match import fingerprint_pairs
    from quichash_spark.operators.similarity import neardup_pairs_ann

    clips = materialized_clips(spark, _clips_n(sf_dir))
    fp = fingerprint_pairs(compute_fingerprints(clips)).select(
        "clip_a", "clip_b", "aligned_matches"
    )
    emb = compute_audio_embeddings(clips).localCheckpoint(eager=True)
    ep = neardup_pairs_ann(
        emb, NEARDUP_THRESHOLD, EMBED_DIM, id_col="clip_id",
        **ANN_NEARDUP_PARAMS,
    ).select(
        F.col("id_a").alias("clip_a"), F.col("id_b").alias("clip_b"), "cosine"
    )
    j = fp.alias("f").join(ep.alias("e"), ["clip_a", "clip_b"], "full_outer")
    return j.select(
        "clip_a", "clip_b", "aligned_matches", "cosine",
        F.when(
            F.col("aligned_matches").isNotNull() & F.col("cosine").isNotNull(),
            F.lit("recording+perceptual"),
        ).when(F.col("aligned_matches").isNotNull(), F.lit("recording"))
        .otherwise(F.lit("perceptual")).alias("verdict"),
    )


def q_stream_embed_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PERCEPTUAL near-dup assignment (streaming/cluster.py
    hyperplane-bucket state over MFCC embeddings) as a driver query:
    availableNow over the deterministic stream layout in micro-batches,
    so similar-sounding clips genuinely join across batch boundaries via
    state.  Value-checked like stream_neardup_assign (VERDICT r4 #2):
    min-clip_id seeding within each batch + fixed batch membership make
    the full per-clip assignment order-invariant; compared hash-exact
    against oracle/fixture.py::sequential_stream_embed."""
    import shutil
    import tempfile

    from quichash_spark.fixtures import (
        STREAM_FILES_PER_TRIGGER, materialized_clips_stream,
    )
    from quichash_spark.streaming.cluster import stream_embed_neardup_assign

    src = materialized_clips_stream(_clips_n(sf_dir))
    root = tempfile.mkdtemp(prefix="qh_sembed_")
    try:
        out = stream_embed_neardup_assign(
            spark, src,
            checkpoint_dir=os.path.join(root, "ckpt"),
            out_dir=os.path.join(root, "out"),
            max_files_per_trigger=STREAM_FILES_PER_TRIGGER,
        )
        res = out.select(
            "clip_id", "cluster_id", "joined_existing"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return res


def q_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north_rule's per-partition lineage + metrics tables as hard
    driver signal: run (or resume) the flagship pipeline, read the
    metrics table (storage.py — parquet-footer lineage rows appended at
    checkpoint time, no extra Spark jobs), and sum per-partition
    ``rows_out`` per stage (latest append per stage only — an
    invalidated-and-rerun stage appends twice).  The oracle recomputes
    each stage's row count INDEPENDENTLY from the sequential numpy
    fixture parquet — a lineage batch that drops or double-counts a
    partition hash-fails."""
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import run_pipeline
    from quichash_spark.storage import CheckpointStore

    n = _clips_n(sf_dir)
    ckpt = f"/tmp/quichash_ckpt/v2_n{n}"
    run_pipeline(spark, materialized_clips(spark, n), ckpt)
    store = CheckpointStore(spark, ckpt, CLIPS_CONFIG)
    stages = ["signatures", "exact_groups", "candidates", "clusters"]
    return (
        store.latest_metrics()
        .filter(F.col("stage").isin(stages))
        .groupBy("stage")
        .agg(F.sum("rows_out").cast("long").alias("rows_total"))
    )


def q_audio_fp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral landmark fingerprint matching (Wang-2003-style
    constellation hashing, functions/fingerprint.py): clip pairs whose
    landmark-hash collisions agree on one anchor-time offset — the
    time-shift-robust audio-content signal the frame-shingle MinHash
    lacks.  Oracle: the same frozen kernel run sequentially with an
    independent pure-Python bucket join + alignment histogram
    (oracle/fixture.py::sequential_fp_pairs)."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.functions.fingerprint import compute_fingerprints
    from quichash_spark.operators.fingerprint_match import fingerprint_pairs

    clips = materialized_clips(spark, _clips_n(sf_dir))
    return fingerprint_pairs(compute_fingerprints(clips))


def q_audio_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio near-dup channel (functions/audio_embed.py):
    MFCC [mean||std] clip embeddings (shuffle-free mapInPandas over the
    scan) fed into hyperplane-LSH candidate buckets + exact-cosine
    verification (``neardup_pairs_ann`` — JVM-side zip_with/aggregate
    cosine, candidates from a bucket equi-join, no CartesianProduct/BNLJ
    node; plan-asserted in tests/test_plans.py).  Complements
    audio_fp_pairs: landmarks match the same *recording*; this matches
    similar *spectral envelopes*.  ANN params sit above the recall knee
    for the 0.985 threshold (ANN_NEARDUP_PARAMS — measured recall 1.0
    vs all-pairs at the 5000-clip fixture, min 3/16 table collisions
    per true pair), so the output rows equal the all-pairs baseline.
    Oracle: the same frozen kernel sequentially + Spark-fold-order
    cosine (oracle/fixture.py::sequential_audio_embed_pairs)."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.functions.audio_embed import (
        ANN_NEARDUP_PARAMS, EMBED_DIM, NEARDUP_THRESHOLD,
        compute_audio_embeddings,
    )
    from quichash_spark.operators.similarity import neardup_pairs_ann

    clips = materialized_clips(spark, _clips_n(sf_dir))
    # eager checkpoint: both self-join branches reuse the embedding
    # batches instead of running the MFCC kernel twice (same pattern as
    # fingerprint_pairs)
    emb = compute_audio_embeddings(clips).localCheckpoint(eager=True)
    return neardup_pairs_ann(
        emb, NEARDUP_THRESHOLD, EMBED_DIM, id_col="clip_id",
        **ANN_NEARDUP_PARAMS,
    )


def q_audio_sem_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over AUDIO: MFCC embedding near-dup pairs -> large-star/
    small-star connected components -> min-id representative, singletons
    (embeddable clips with no near neighbor) self-labeled.  The audio
    twin of ``sem_dedup``; the CC job is value-checked against DuckDB's
    recursive-CTE min-label propagation over the SAME edge set (the
    sequential-kernel fixture pairs), so the distributed star-contraction
    must agree with an independent engine on real string clip ids."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.functions.audio_embed import (
        ANN_NEARDUP_PARAMS, EMBED_DIM, NEARDUP_THRESHOLD,
        compute_audio_embeddings,
    )
    from quichash_spark.operators.connected_components import connected_components
    from quichash_spark.operators.similarity import neardup_pairs_ann

    clips = materialized_clips(spark, _clips_n(sf_dir))
    emb = compute_audio_embeddings(clips).localCheckpoint(eager=True)
    pairs = neardup_pairs_ann(
        emb, NEARDUP_THRESHOLD, EMBED_DIM, id_col="clip_id",
        **ANN_NEARDUP_PARAMS,
    )
    edges = pairs.select(
        F.col("id_a").alias("clip_a"), F.col("id_b").alias("clip_b")
    )
    assigned = connected_components(edges)
    singles = (
        emb.select("clip_id")
        .join(assigned.select("clip_id"), "clip_id", "left_anti")
        .select("clip_id", F.col("clip_id").alias("cluster_id"))
    )
    return assigned.unionByName(singles).select(
        "clip_id", "cluster_id",
        (F.col("clip_id") == F.col("cluster_id")).alias("is_rep"),
    )


def q_cdc_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (operators/cdc_dedup.py): Gear
    rolling-hash chunk boundaries make shared boilerplate chunk
    identically at ANY byte offset, so the injected header/footer runs
    are detected as duplicated bytes without any pairwise comparison —
    the byte-level dedup pass of a pretraining pipeline.  Oracle: a
    scalar-recurrence replica chunker grouping by RAW chunk bytes
    (independent of both the vectorized windowed-sum kernel and the
    64-bit chunk hash), oracle/fixture.py::sequential_cdc_stats."""
    from quichash_spark.operators.cdc_dedup import (
        CDC_FOOTER, CDC_HEADER, cdc_dup_stats, compute_cdc_chunks,
    )

    docs = _read(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 7 == 0, F.lit(CDC_HEADER)).otherwise(F.lit("")),
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(CDC_FOOTER)).otherwise(F.lit("")),
        ).alias("text"),
    ).repartition(spark.sparkContext.defaultParallelism)
    # eager checkpoint: the chunk-hash count branch and the join branch
    # both reuse one chunking pass (audio_fp_pairs pattern)
    chunks = compute_cdc_chunks(aug).localCheckpoint(eager=True)
    return cdc_dup_stats(chunks)


def q_audio_cdc_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over DECODED PCM bytes
    (operators/cdc_dedup.py::compute_pcm_cdc_chunks): per-clip
    duplicated-audio-bytes stats, offset-robust (shared runs chunk
    identically at any sample position — complements the prefix-aligned
    window join of audio_seg_containment).  Planted exact twins and
    prefix slices surface as dup bytes; SNR-noised copies do not.
    Oracle: scalar-recurrence replica grouping chunks by raw bytes
    (oracle/fixture.py::sequential_audio_cdc)."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.operators.cdc_dedup import (
        cdc_dup_stats, compute_pcm_cdc_chunks,
    )

    clips = materialized_clips(spark, _clips_n(sf_dir))
    chunks = compute_pcm_cdc_chunks(clips).localCheckpoint(eager=True)
    return cdc_dup_stats(chunks, id_col="clip_id")


def q_audio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip audio quality signals (functions/audio_quality.py):
    clipping, silence, DC offset, zero crossings, plus speaking-rate
    sanity from the transcript — the audio analog of the Gopher-style
    text quality filters, computed in ONE shuffle-free decode pass.
    Raw metrics are integer-exact; the derived columns (wpm, ppm ratios,
    quality_ok) are JVM expressions here and independent DuckDB
    arithmetic in the oracle (the replica stores only raw integers —
    plain-``struct`` decode, pure-Python loops, no shared kernel)."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.functions.audio_quality import (
        CLIPPED_PPM_MAX, SILENT_PPM_MAX, WPM_MAX, WPM_MIN,
        compute_audio_quality,
    )

    clips = materialized_clips(spark, _clips_n(sf_dir))
    raw = compute_audio_quality(clips)
    n_words = (
        F.when(F.length(F.trim("transcript")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("transcript"), r"\s+")))
        .cast("long")
    )
    d = raw.withColumn("n_words", n_words)
    wpm = (
        F.when(F.col("dur_ms") > 0,
               F.expr("n_words * 60000 div dur_ms"))
        .otherwise(F.lit(0))
        .cast("long")
    )
    clipped_ppm = F.when(
        F.col("n_samples") > 0, F.expr("n_clipped * 1000000 div n_samples")
    ).cast("long")
    silent_ppm = F.when(
        F.col("n_frames") > 0,
        F.expr("n_silent_frames * 1000000 div n_frames"),
    ).cast("long")
    d = (
        d.withColumn("wpm", wpm)
        .withColumn("clipped_ppm", clipped_ppm)
        .withColumn("silent_ppm", silent_ppm)
    )
    quality_ok = (
        F.col("decode_ok")
        & (F.col("clipped_ppm") < CLIPPED_PPM_MAX)
        & (F.col("silent_ppm") < SILENT_PPM_MAX)
        & F.col("wpm").between(WPM_MIN, WPM_MAX)
    )
    return d.select(
        "clip_id", "decode_ok", "n_samples", "sum_sq", "dc_sum",
        "n_clipped", "n_zero_cross", "n_frames", "n_silent_frames",
        "n_words", "wpm", "clipped_ppm", "silent_ppm",
        F.coalesce(quality_ok, F.lit(False)).alias("quality_ok"),
    )


def q_audio_seg_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segment containment (operators/segment_containment.py):
    positional window-hash equi-join finds clips whose PCM is a leading
    slice of another clip (the planted off-18/19 prefix slices) or an
    exact-PCM twin — the AUDIO side of the suffix-array containment
    stage.  Oracle: a plain-Python replica that groups windows by RAW
    BYTES (independent of the 64-bit hash) in oracle/fixture.py."""
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.operators.segment_containment import (
        compute_segment_hashes, segment_containment_pairs,
    )

    clips = materialized_clips(spark, _clips_n(sf_dir))
    # eager checkpoint: the hot-key aggregation and both self-join
    # branches reuse the decoded window hashes instead of running the
    # decode kernel three times (audio_fp_pairs pattern)
    segs = compute_segment_hashes(clips).localCheckpoint(eager=True)
    return segment_containment_pairs(segs)


def _media_n(sf_dir: str) -> int:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.01
    return max(200, int(sf * 20_000))


def q_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-media metadata probe (functions/media_probe.py): MP3
    frame walk + Xing, Ogg/Opus page-CRC + lacing + TOC durations, WebP
    VP8/VP8L/VP8X headers — over the deterministic media corpus
    (fixtures/media.py).  Oracle-checked: the DuckDB side reads the
    generator's ground-truth parquet, so every parsed field must be
    reconstructed from the bytes alone (malformed rows included)."""
    from quichash_spark.fixtures.media import materialized_media
    from quichash_spark.functions.media_probe import media_probe_features

    media = materialized_media(spark, _media_n(sf_dir))
    return media_probe_features(media.select("media_id", "data"))


# ---------------------------------------------------------------------------
# registry + oracle SQL
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_exact_groups": q_dedup_exact_groups,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "text_stats": q_text_stats,
    "text_bpe_tokens": q_text_bpe_tokens,
    "doc_winnow_pairs": q_doc_winnow_pairs,
    "text_langid": q_text_langid,
    "text_pii_scrub": q_text_pii_scrub,
    "text_repetition": q_text_repetition,
    "doc_fingerprint": q_doc_fingerprint,
    "multi_hash": q_multi_hash,
    "fast_mode_hash": q_fast_mode_hash,
    "hashignore_filter": q_hashignore_filter,
    "hashdb_roundtrip": q_hashdb_roundtrip,
    "decontaminate_hits": q_decontaminate_hits,
    "verify_classification": q_verify_classification,
    "verify_fast_mode": q_verify_fast_mode,
    "analyze_wasted_report": q_analyze_wasted_report,
    "compare_dbs": q_compare_dbs,
    "moved_detection": q_moved_detection,
    "anti_new_files": q_anti_new_files,
    "analyze_summary": q_analyze_summary,
    "scan_stats_by_source": q_scan_stats_by_source,
    "glob_source_rollup": q_glob_source_rollup,
    "json_report_roundtrip": q_json_report_roundtrip,
    "top_docs_by_chars": q_top_docs_by_chars,
    "sim_topk": q_sim_topk,
    "sim_neardup": q_sim_neardup,
    "sem_dedup": q_sem_dedup,
    "sim_ann_lsh": q_sim_ann_lsh,
    "sim_ivf": q_sim_ivf,
    "sim_pq": q_sim_pq,
    "events_windowed": q_events_windowed,
    "events_json": q_events_json,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "clips_signatures": q_clips_signatures,
    "clips_exact_dedup": q_clips_exact_dedup,
    "clips_clusters": q_clips_clusters,
    "clips_incremental": q_clips_incremental,
    "clips_candidates": q_clips_candidates,
    "clips_containment": q_clips_containment,
    "stream_neardup_assign": q_stream_neardup_assign,
    "stream_embed_assign": q_stream_embed_assign,
    "video_features": q_video_features,
    "image_features": q_image_features,
    "media_probe": q_media_probe,
    "audio_fp_pairs": q_audio_fp_pairs,
    "audio_embed_neardup": q_audio_embed_neardup,
    "audio_sem_dedup": q_audio_sem_dedup,
    "cdc_dup_stats": q_cdc_dup_stats,
    "audio_cdc_dup": q_audio_cdc_dup,
    "audio_quality": q_audio_quality,
    "audio_seg_containment": q_audio_seg_containment,
    "audio_pair_verdict": q_audio_pair_verdict,
    "pipeline_metrics": q_pipeline_metrics,
}

_STOPWORD_ALT = "|".join(T.STOPWORDS)

# Oracle fixtures: deterministic parquet materialized by independent
# sequential implementations (see quichash_spark/oracle/fixture.py for the
# independence story per file).  Paths are pure functions of the frozen
# config; __spark_entry__.oracle_sql() ensures they exist before the driver
# reads them.  The clip-count is pinned to the driver's sf0.01 contract.
from quichash_spark.oracle.fixture import (  # noqa: E402
    DRIVER_N_CLIPS,
    aemb_fixture_dir,
    ann_fixture_dir,
    aqual_fixture_dir,
    cdc_fixture_dir,
    clips_fixture_dir,
    docs_fixture_dir,
    fp_fixture_dir,
    image_fixture_dir,
    media_fixture_dir,
    stream_fixture_dir,
    video_fixture_dir,
)

_CLIPS_FIX = clips_fixture_dir(DRIVER_N_CLIPS)
_DOCS_FIX = docs_fixture_dir()
_ANN_FIX = ann_fixture_dir()
_MEDIA_FIX = media_fixture_dir()
_FP_FIX = fp_fixture_dir()
_AEMB_FIX = aemb_fixture_dir()
_STREAM_FIX = stream_fixture_dir()
_VIDEO_FIX = video_fixture_dir()
_IMAGE_FIX = image_fixture_dir()
_AQUAL_FIX = aqual_fixture_dir()
_CDC_FIX = cdc_fixture_dir()

#: oracle entries that depend on the clips / docs fixture parquet —
#: dropped (degrading to rows-only) if the fixture cannot be built
CLIPS_FIXTURE_KEYS = (
    "clips_signatures",
    "clips_exact_dedup",
    "clips_clusters",
    "clips_incremental",
    "clips_candidates",
    "clips_containment",
    "pipeline_metrics",
)
DOCS_FIXTURE_KEYS = ("dedup_simhash", "doc_winnow_pairs")
ANN_FIXTURE_KEYS = ("sim_ann_lsh", "sim_ivf", "sim_pq")
MEDIA_FIXTURE_KEYS = ("media_probe",)
FP_FIXTURE_KEYS = ("audio_fp_pairs", "audio_pair_verdict")
AEMB_FIXTURE_KEYS = ("audio_embed_neardup", "audio_sem_dedup",
                     "audio_pair_verdict")
STREAM_FIXTURE_KEYS = ("stream_neardup_assign", "stream_embed_assign")
VIDEO_FIXTURE_KEYS = ("video_features",)
IMAGE_FIXTURE_KEYS = ("image_features",)
AQUAL_FIXTURE_KEYS = ("audio_quality", "audio_seg_containment",
                      "audio_cdc_dup")
CDC_FIXTURE_KEYS = ("cdc_dup_stats",)

ORACLE_SQL: dict[str, str] = {
    "dedup_exact_groups": """
        select md5(text) as text_md5, count(*)::BIGINT as n
        from documents group by 1 having count(*) > 1
    """,
    "dedup_ngram_jaccard": _JACCARD_SQL,
    "dedup_minhash_lsh": _JACCARD_SQL,
    "text_stats": f"""
        select doc_id,
          (case when trim(text) = '' then 0
                else len(regexp_split_to_array(trim(text), '\\s+')) end)::BIGINT as n_tokens,
          len(regexp_extract_all(text, '[[:punct:]]'))::BIGINT as n_punct,
          len(regexp_extract_all(text, '[0-9]'))::BIGINT as n_digits,
          len(regexp_extract_all(text, '\\b({_STOPWORD_ALT})\\b'))::BIGINT as n_stopwords,
          length(regexp_replace(text, '\\s+', '', 'g'))::BIGINT as token_chars
        from documents
    """,
    "text_bpe_tokens": f"""
        select doc_id,
               len(regexp_extract_all(text, '{T.BPE_ISH_PATTERN}'))::BIGINT as n_tokens_bpe
        from documents
    """,
    # --- repetition signals recomputed from string_split ---
    "text_repetition": """
        with words as (
          select doc_id, w
          from documents,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) as t(w)
        ),
        tot as (
          select doc_id, count(*)::BIGINT as n_words,
                 count(distinct w)::BIGINT as n_distinct
          from words group by 1
        ),
        cnt as (select doc_id, w, count(*) as c from words group by 1, 2),
        top as (select doc_id, max(c)::BIGINT as top_cnt from cnt group by 1)
        select t.doc_id, n_words, n_distinct,
               round(1 - n_distinct::DOUBLE / n_words, 6) as dup_word_frac,
               round(top_cnt::DOUBLE / n_words, 6) as top_word_frac
        from tot t join top using (doc_id)
    """,
    # --- PII scrub: Java regex (Spark) vs RE2 (DuckDB) on the common
    # syntax subset; injected tokens built by the same doc_id arithmetic ---
    "text_pii_scrub": r"""
        with aug as (
          select doc_id,
            text
            || case when doc_id % 3 = 0
                 then ' mail user' || doc_id || '@example.com' else '' end
            || case when doc_id % 5 = 0
                 then ' node 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
                 else '' end
            || case when doc_id % 7 = 0
                 then ' call +1 555-' || lpad((doc_id % 10000)::varchar, 4, '0')
                 else '' end
            || case when doc_id % 11 = 0
                 then ' id 093-12-' || lpad((doc_id % 10000)::varchar, 4, '0')
                 else '' end
            as t
          from documents
        )
        select doc_id,
               md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'), '\+\d{1,3}[- ]\d{3}[- ]\d{4}\b', '[PHONE]', 'g'), '\b\d{3}-\d{2}-\d{4}\b', '[ID]', 'g'), '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g')) as scrub_md5,
               length(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT as n_email,
               length(regexp_extract_all(t, '\+\d{1,3}[- ]\d{3}[- ]\d{4}\b'))::BIGINT as n_phone,
               length(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b'))::BIGINT as n_ssn,
               length(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))::BIGINT as n_ipv4
        from aug
    """,
    "text_langid": f"""
        select doc_id,
          case
            when len(regexp_extract_all(text, '[\\x{{4E00}}-\\x{{9FFF}}]')) > 0 then 'zh'
            when len(regexp_extract_all(text, '[\\x{{0400}}-\\x{{04FF}}]')) > 0 then 'ru'
            when len(regexp_extract_all(text, '[\\x{{0600}}-\\x{{06FF}}]')) > 0 then 'ar'
            when {_markers_sql('de')} > {_markers_sql('fr')}
             and {_markers_sql('de')} > {_markers_sql('es')} then 'de'
            when {_markers_sql('fr')} > {_markers_sql('es')} then 'fr'
            when {_markers_sql('es')} > 0 then 'es'
            else 'en'
          end as lang_pred
        from documents
    """,
    "doc_fingerprint": """
        select doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) as fingerprint
        from documents
    """,
    "multi_hash": """
        select doc_id, md5(text) as md5_hex, sha256(text) as sha256_hex,
               'md5' as algo_md5, 'sha256' as algo_sha256
        from documents
    """,
    "fast_mode_hash": """
        select doc_id,
               case when length(text) > 300
                    then md5(substr(text, 1, 100)
                             || substr(text, ((length(text) - 100) // 2) + 1, 100)
                             || substr(text, length(text) - 99, 100))
                    else md5(text) end as fast_md5
        from documents
    """,
    "hashdb_roundtrip": """
        with base as (
          select 'doc_' || cast(doc_id as varchar) as path,
                 md5(text) as md5_hex, sha256(text) as sha256_hex,
                 cast(length(text) as bigint) as file_size
          from documents
        )
        select 'standard' as format, path, 'md5' as algorithm,
               md5_hex as hash, cast(null as bigint) as file_size,
               true as valid, 'standard' as sniffed
        from base
        union all
        select f.format, b.path, a.algorithm,
               case a.algorithm when 'md5' then b.md5_hex
                                else b.sha256_hex end as hash,
               b.file_size, true as valid, 'hashdeep' as sniffed
        from base b
        cross join (values ('md5'), ('sha256')) a(algorithm)
        cross join (values ('hashdeep'), ('hashdeep_xz')) f(format)
    """,
    "decontaminate_hits": """
        with toks as (
          select doc_id, regexp_split_to_array(trim(text), '\\s+') as w from documents
        ), sh as (
          select doc_id,
                 case when len(w) < 8 then list_distinct([array_to_string(w, ' ')])
                      else list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                                          w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
                                          w[i+6] || ' ' || w[i+7]
                                          for i in range(1, len(w) - 6)])
                 end as shingles
          from toks
        ), ev as (
          select doc_id as eval_id, unnest(shingles) as s
          from sh where doc_id % 50 = 0
        ), evs as (
          select eval_id, count(*) as eval_shingles from ev group by 1
        ), tr as (
          select doc_id, unnest(shingles) as s from sh
        )
        select tr.doc_id, ev.eval_id,
               count(*)::BIGINT as shared_shingles,
               any_value(evs.eval_shingles)::BIGINT as eval_shingles
        from tr join ev using (s) join evs using (eval_id)
        group by tr.doc_id, ev.eval_id
    """,
    "hashignore_filter": """
        select doc_id,
          case doc_id % 6
            when 0 then 'logs/doc_' || doc_id || '.log'
            when 1 then 'keep_' || doc_id || '.log'
            when 2 then 'tmp'
            when 3 then 'top_secret_' || doc_id
            when 4 then 'data/x' || doc_id || '/cache'
            else 'src/doc_' || doc_id || '.txt' end as path,
          (doc_id % 6) in (0, 2, 3, 4) as ignored
        from documents
    """,
    "verify_classification": """
        with expected as (
          select 'doc_' || doc_id as path, md5(text) as expected_hash from documents
        ), actual as (
          select 'doc_' || doc_id as path,
                 md5(case when doc_id % 7 = 0 then text || 'X' else text end) as actual_hash
          from documents where doc_id % 11 <> 0
          union all
          select 'doc_new_' || doc_id as path, md5(text || 'N') as actual_hash
          from documents where doc_id % 13 = 0
        )
        select coalesce(e.path, a.path) as path, expected_hash, actual_hash,
               case when expected_hash is null then 'new'
                    when actual_hash is null then 'missing'
                    when expected_hash = actual_hash then 'match'
                    else 'mismatch' end as status
        from expected e full outer join actual a on e.path = a.path
    """,
    "analyze_wasted_report": """
        with g as (
          select md5(text) as text_md5, cast(count(*) as bigint) as n,
                 cast(max(length(text)) as bigint) as size_bytes
          from documents group by md5(text) having count(*) > 1
        ), w as (
          select text_md5, n, size_bytes,
                 (n - 1) * size_bytes as wasted_bytes from g
        )
        select text_md5, n, size_bytes, wasted_bytes,
               case
                 when wasted_bytes < 1024 then cast(wasted_bytes as varchar) || ' B'
                 when wasted_bytes < 1048576 then
                   cast(((wasted_bytes * 200 + 1024) // 2048) // 100 as varchar)
                   || '.' || lpad(cast(((wasted_bytes * 200 + 1024) // 2048) % 100 as varchar), 2, '0')
                   || ' KB'
                 when wasted_bytes < 1073741824 then
                   cast(((wasted_bytes * 200 + 1048576) // 2097152) // 100 as varchar)
                   || '.' || lpad(cast(((wasted_bytes * 200 + 1048576) // 2097152) % 100 as varchar), 2, '0')
                   || ' MB'
                 else
                   cast(((wasted_bytes * 200 + 1073741824) // 2147483648) // 100 as varchar)
                   || '.' || lpad(cast(((wasted_bytes * 200 + 1073741824) // 2147483648) % 100 as varchar), 2, '0')
                   || ' GB'
               end as wasted_human
        from w
    """,
    "verify_fast_mode": """
        with e as (
          select 'doc_' || doc_id as path, (doc_id % 3 = 0) as fast_mode,
                 case when doc_id % 3 = 0 and length(text) > 300
                      then md5(substr(text, 1, 100)
                               || substr(text, ((length(text) - 100) // 2) + 1, 100)
                               || substr(text, length(text) - 99, 100))
                      else md5(text) end as expected_hash
          from documents
        ), m as (
          select doc_id,
                 case when doc_id % 7 = 0 then text || 'X' else text end as t
          from documents
        ), a as (
          select 'doc_' || doc_id as path,
                 case when doc_id % 3 = 0 and length(t) > 300
                      then md5(substr(t, 1, 100)
                               || substr(t, ((length(t) - 100) // 2) + 1, 100)
                               || substr(t, length(t) - 99, 100))
                      else md5(t) end as actual_hash
          from m
        )
        select e.path, fast_mode, expected_hash, actual_hash,
               case when expected_hash = actual_hash then 'match'
                    else 'mismatch' end as status
        from e join a on e.path = a.path
    """,
    "compare_dbs": """
        with db1 as (
          select 'doc_' || doc_id as path, md5(text) as hash1 from documents
        ), db2 as (
          select 'doc_' || doc_id as path,
                 md5(case when doc_id % 5 = 0 then text || 'Y' else text end) as hash2
          from documents where doc_id % 9 <> 0
          union all
          select 'doc_add_' || doc_id as path, md5(text || 'A') as hash2
          from documents where doc_id % 17 = 0
        )
        select coalesce(db1.path, db2.path) as path, hash1, hash2,
               case when hash1 is null then 'added'
                    when hash2 is null then 'removed'
                    when hash1 = hash2 then 'unchanged'
                    else 'changed' end as status
        from db1 full outer join db2 on db1.path = db2.path
    """,
    "moved_detection": """
        with base as (select * from documents where doc_id % 4 = 0),
        removed as (
          select md5(text) as hash, 'old/a/' || doc_id as old_path from base
          union all
          select md5(text) as hash, 'old/b/' || doc_id as old_path from base
        ), added as (
          select md5(text) as hash, 'new/x/' || doc_id as new_path from base
          union all
          select md5(text) as hash, 'new/y/' || doc_id as new_path from base
        ), r as (
          select hash, old_path,
                 row_number() over (partition by hash order by old_path) as rn
          from removed
        ), a as (
          select hash, new_path,
                 row_number() over (partition by hash order by new_path) as rn
          from added
        )
        select r.hash as hash, old_path, new_path from r join a using (hash, rn)
    """,
    "anti_new_files": """
        select 'doc_' || doc_id as path from documents
        where 'doc_' || doc_id not in (
          select 'doc_' || doc_id from documents where doc_id % 3 <> 0
        )
    """,
    "analyze_summary": """
        with per_hash as (
          select md5(text) as hash, count(*) as n from documents group by 1
        )
        select sum(n)::BIGINT as total_files,
               count(*)::BIGINT as unique_hashes,
               sum(case when n > 1 then n else 0 end)::BIGINT as dup_files,
               sum(case when n > 1 then 1 else 0 end)::BIGINT as dup_groups
        from per_hash
    """,
    "scan_stats_by_source": """
        select source, count(*)::BIGINT as n_docs, sum(n_chars)::BIGINT as total_chars,
               count(distinct lang)::BIGINT as n_langs
        from documents group by source
    """,
    "top_docs_by_chars": """
        select doc_id, n_chars from documents
        order by n_chars desc, doc_id asc limit 10
    """,
    # --- S6: glob-expanded multi-dir read; bucket membership re-derived ---
    "glob_source_rollup": """
        select (doc_id % 3)::INT as src_bucket, count(*)::BIGINT as n_docs,
               sum(n_chars)::BIGINT as total_chars
        from documents group by 1
    """,
    # --- S9: JSON report round-trip; rollup recomputed straight from parquet ---
    "json_report_roundtrip": """
        select lang, count(*)::BIGINT as n_docs,
               sum(n_chars)::BIGINT as total_chars
        from documents where doc_id < 100 group by lang
        union all
        select '__total__', count(*)::BIGINT, sum(n_chars)::BIGINT
        from documents where doc_id < 100
    """,
    "sim_topk": """
        with q as (select vec_id, embedding from embeddings where vec_id < 10),
        scored as (
          select q.vec_id as query_id, e.vec_id as neighbor_id,
                 list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) as c
          from q cross join embeddings e where q.vec_id <> e.vec_id
        ), ranked as (
          select query_id, neighbor_id,
                 row_number() over (partition by query_id
                                    order by c desc, neighbor_id asc) as rank,
                 round(c, 6) as cosine
          from scored
        )
        select query_id, neighbor_id, rank::INT as rank, cosine from ranked where rank <= 5
    """,
    "sem_dedup": """
        with recursive
        e0 as (select vec_id::BIGINT as vec_id, embedding
               from embeddings where vec_id < 200),
        pairs as (
          select a.vec_id as a, b.vec_id as b
          from e0 a join e0 b on a.vec_id < b.vec_id
          where list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                 sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.35
        ),
        edges as (select a, b from pairs union select b as a, a as b from pairs),
        nodes as (select vec_id as node from e0),
        cc(node, root, it) as (
          select node, node, 0 from nodes
          union all
          select e.b, min(cc.root), cc.it + 1
          from cc join edges e on cc.node = e.a
          group by e.b, cc.it
          having min(cc.root) < e.b and cc.it < 30
        )
        select node as vec_id, min(root) as cluster_id,
               (node = min(root)) as is_rep
        from cc group by node
    """,
    "sim_neardup": """
        with e as (select vec_id, embedding from embeddings where vec_id < 200)
        select a.vec_id as id_a, b.vec_id as id_b,
               round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) as cosine
        from e a join e b on a.vec_id < b.vec_id
        where list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
              (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
               sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.35
    """,
    "events_windowed": """
        select (floor(epoch(ts) / 3600) * 3600)::BIGINT as window_start,
               event_type, count(*)::BIGINT as n_events,
               round(sum(value), 4) as sum_value
        from events group by 1, 2
    """,
    "events_json": """
        select event_id, (props ->> 'k')::BIGINT as k from events
    """,
    "pricing_summary": """
        select l_returnflag, l_linestatus,
               sum(l_quantity)::DOUBLE as sum_qty,
               round(sum(l_extendedprice), 2) as sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
               count(*)::BIGINT as count_order
        from lineitem
        where l_shipdate <= '1998-09-02'
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
    """,
    "revenue_by_nation": """
        select n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
               count(*)::BIGINT as n_items
        from lineitem
        join orders on l_orderkey = o_orderkey
        join customer on o_custkey = c_custkey
        join nation on c_nationkey = n_nationkey
        group by n_name
    """,
    # --- fixture-backed oracles for the flagship clips pipeline ---
    "clips_signatures": f"""
        select clip_id, content_hash, pcm_hash, simhash, n_frames,
               n_samples, transcript, decode_ok
        from read_parquet('{_CLIPS_FIX}/signatures.parquet')
    """,
    "clips_exact_dedup": f"""
        select content_hash, count(*)::BIGINT as n,
               ((count(*) - 1) * any_value(n_samples) * 2)::BIGINT as wasted_bytes
        from read_parquet('{_CLIPS_FIX}/signatures.parquet')
        where content_hash is not null
        group by content_hash having count(*) > 1
    """,
    "clips_clusters": f"""
        select clip_id, cluster_id
        from read_parquet('{_CLIPS_FIX}/clusters.parquet')
    """,
    # --- incremental == batch: the SAME full-corpus brute-force oracle
    # (the incremental path must reproduce the batch transitive closure)
    "clips_incremental": f"""
        select clip_id, cluster_id
        from read_parquet('{_CLIPS_FIX}/clusters.parquet')
    """,
    "clips_candidates": f"""
        select clip_a, clip_b, source
        from read_parquet('{_CLIPS_FIX}/candidates.parquet')
    """,
    "clips_containment": f"""
        select clip_a, clip_b, source
        from read_parquet('{_CLIPS_FIX}/containment.parquet')
    """,
    # --- lineage-vs-independent-count oracle for the metrics table ---
    "pipeline_metrics": f"""
        select 'signatures' as stage, count(*)::BIGINT as rows_total
        from read_parquet('{_CLIPS_FIX}/signatures.parquet')
        union all
        select 'exact_groups', count(*)::BIGINT from (
            select content_hash
            from read_parquet('{_CLIPS_FIX}/signatures.parquet')
            where content_hash is not null
            group by content_hash having count(*) > 1
        )
        union all
        select 'candidates', count(*)::BIGINT
        from read_parquet('{_CLIPS_FIX}/candidates.parquet')
        union all
        select 'clusters', count(*)::BIGINT
        from read_parquet('{_CLIPS_FIX}/clusters.parquet')
    """,
    # --- sequential-replica oracle for landmark fingerprint matching ---
    "audio_fp_pairs": f"""
        select clip_a, clip_b, aligned_matches, total_matches, delta_frames
        from read_parquet('{_FP_FIX}/fp_pairs.parquet')
    """,
    # --- audio quality: raw integers from the plain-struct replica; the
    # derived columns are DuckDB arithmetic here vs JVM expressions in
    # the Spark query (both derive from the same integer contract) ---
    "audio_quality": f"""
        with raw as (
          select *,
            case when dur_ms > 0 then n_words * 60000 // dur_ms
                 else 0 end as wpm,
            case when n_samples > 0
                 then n_clipped * 1000000 // n_samples end as clipped_ppm,
            case when n_frames > 0
                 then n_silent_frames * 1000000 // n_frames end as silent_ppm
          from read_parquet('{_AQUAL_FIX}/quality.parquet')
        )
        select clip_id, decode_ok, n_samples, sum_sq, dc_sum, n_clipped,
               n_zero_cross, n_frames, n_silent_frames, n_words,
               wpm::BIGINT as wpm, clipped_ppm::BIGINT as clipped_ppm,
               silent_ppm::BIGINT as silent_ppm,
               coalesce(decode_ok and clipped_ppm < 1000
                        and silent_ppm < 500000
                        and wpm between 10 and 600, false) as quality_ok
        from raw
    """,
    "audio_seg_containment": f"""
        select clip_small, clip_big, n_shared, n_win_small, n_win_big,
               relation
        from read_parquet('{_AQUAL_FIX}/segment_pairs.parquet')
    """,
    # --- CDC byte-level dedup: scalar-recurrence replica chunker,
    # grouped by raw chunk bytes (independent of the vectorized kernel
    # and of the 64-bit chunk hash) ---
    "cdc_dup_stats": f"""
        select doc_id, n_chunks, total_bytes, dup_chunks, dup_bytes,
               dup_ppm
        from read_parquet('{_CDC_FIX}/cdc_stats.parquet')
    """,
    "audio_cdc_dup": f"""
        select clip_id, n_chunks, total_bytes, dup_chunks, dup_bytes,
               dup_ppm
        from read_parquet('{_AQUAL_FIX}/audio_cdc.parquet')
    """,
    # --- channel fusion: landmark + embedding evidence per pair ---
    "audio_pair_verdict": f"""
        select coalesce(f.clip_a, e.id_a) as clip_a,
               coalesce(f.clip_b, e.id_b) as clip_b,
               f.aligned_matches, e.cosine,
               case when f.clip_a is not null and e.id_a is not null
                      then 'recording+perceptual'
                    when f.clip_a is not null then 'recording'
                    else 'perceptual' end as verdict
        from read_parquet('{_FP_FIX}/fp_pairs.parquet') f
        full join read_parquet('{_AEMB_FIX}/embed_pairs.parquet') e
          on f.clip_a = e.id_a and f.clip_b = e.id_b
    """,
    # --- sequential AVI parse + phash replica (DuckDB cannot parse AVI;
    # the kernels run item-by-item driver-side, rows read back) ---
    "video_features": f"""
        select item_id, decode_ok, n_frames, width, height, fps,
               phash_concat, mean_luma
        from read_parquet('{_VIDEO_FIX}/video_features.parquet')
    """,
    # --- sequential decode+phash replica over every image codec (DuckDB
    # cannot decode PNG/JPEG/WebP; same kernels run item-by-item) ---
    "image_features": f"""
        select item_id, decode_ok, width, height, mean_r, mean_g, mean_b,
               phash
        from read_parquet('{_IMAGE_FIX}/image_features.parquet')
    """,
    # --- sequential micro-batch-replay oracles for the two stateful
    # streaming operators (deterministic stream layout; VERDICT r4 #2) ---
    "stream_neardup_assign": f"""
        select clip_id, cluster_id, joined_existing
        from read_parquet('{_STREAM_FIX}/stream_neardup.parquet')
    """,
    "stream_embed_assign": f"""
        select clip_id, cluster_id, joined_existing
        from read_parquet('{_STREAM_FIX}/stream_embed.parquet')
    """,
    # --- sequential-replica oracle for the MFCC embedding channel ---
    "audio_embed_neardup": f"""
        select id_a, id_b, cosine
        from read_parquet('{_AEMB_FIX}/embed_pairs.parquet')
    """,
    # --- recursive-CTE CC over the fixture edge set: the distributed
    # star-contraction must agree with an independent engine's min-label
    # propagation (same pattern as sem_dedup, on string clip ids) ---
    "audio_sem_dedup": f"""
        with recursive
        pairs as (select id_a, id_b
                  from read_parquet('{_AEMB_FIX}/embed_pairs.parquet')),
        edges as (select id_a as a, id_b as b from pairs
                  union select id_b as a, id_a as b from pairs),
        nodes as (select clip_id as node
                  from read_parquet('{_AEMB_FIX}/embed_ids.parquet')),
        cc(node, root, it) as (
          select node, node, 0 from nodes
          union all
          select e.b, min(cc.root), cc.it + 1
          from cc join edges e on cc.node = e.a
          group by e.b, cc.it
          having min(cc.root) < e.b and cc.it < 30
        )
        select node as clip_id, min(root) as cluster_id,
               (node = min(root)) as is_rep
        from cc group by node
    """,
    # --- generator-truth oracle for the compressed-media metadata probe ---
    "media_probe": f"""
        select media_id, parse_ok, container, codec, sample_rate, channels,
               duration_ms, bitrate_kbps, n_frames, n_pages, width, height,
               vbr
        from read_parquet('{_MEDIA_FIX}/truth.parquet')
    """,
    # --- fixture-backed oracles for documents-table kernels ---
    "dedup_simhash": f"""
        select a.doc_id as doc_a, b.doc_id as doc_b
        from read_parquet('{_DOCS_FIX}/doc_simhash.parquet') a
        join read_parquet('{_DOCS_FIX}/doc_simhash.parquet') b
          on a.doc_id < b.doc_id
        where bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    # --- fixture-backed oracles for the seed-frozen ANN queries (expected
    # rows from sequential numpy replicas of the same frozen plan) ---
    "sim_ann_lsh": f"""
        select query_id, neighbor_id, rank, cosine
        from read_parquet('{_ANN_FIX}/ann_lsh.parquet')
    """,
    "sim_ivf": f"""
        select query_id, neighbor_id, rank, cosine
        from read_parquet('{_ANN_FIX}/ivf.parquet')
    """,
    "sim_pq": f"""
        select query_id, neighbor_id, rank, cosine
        from read_parquet('{_ANN_FIX}/pq.parquet')
    """,
    "doc_winnow_pairs": f"""
        with kept as (
          select fp from read_parquet('{_DOCS_FIX}/doc_winnow.parquet')
          group by fp having count(*) > 1 and count(*) <= 300
        ), e as (
          select w.doc_id, w.fp
          from read_parquet('{_DOCS_FIX}/doc_winnow.parquet') w
          join kept using (fp)
        )
        select a.doc_id as doc_a, b.doc_id as doc_b,
               count(*)::BIGINT as shared_fingerprints
        from e a join e b on a.fp = b.fp and a.doc_id < b.doc_id
        group by 1, 2 having count(*) >= 3
        order by shared_fingerprints desc, doc_a, doc_b limit 100
    """,
}
