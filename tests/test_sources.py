from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
    read_fixed_length,
    read_kv_text,
    read_multiple_inputs,
    read_text_lines,
)


def test_read_kv_text_first_separator_only(spark, tmp_path):
    """KeyValueLineRecordReader contract: split on FIRST tab; extra tabs
    stay in the value; no tab → line is the key, value empty."""
    p = str(tmp_path / "kv")
    spark.createDataFrame(
        [("a\t1",), ("b\t2\t3",), ("noseparator",)], ["value"]
    ).coalesce(1).write.text(p)
    out = {r.key: r.value for r in read_kv_text(spark, p).collect()}
    assert out == {"a": "1", "b": "2\t3", "noseparator": ""}


def test_read_text_lines_offset_key_unique(spark, tmp_path):
    p = str(tmp_path / "lines")
    spark.range(100).select(F.col("id").cast("string").alias("value")).write.text(p)
    df = read_text_lines(spark, p, with_offset=True)
    assert df.select("key").distinct().count() == 100


def test_read_fixed_length_slices_fields(spark, tmp_path):
    p = str(tmp_path / "fixed.bin")
    with open(p, "wb") as f:
        f.write(b"01ab" b"02cd" b"03ef")  # 3 records of 4 bytes
    df = read_fixed_length(spark, p, 4, fields=[("num", 1, 2), ("tag", 3, 2)])
    rows = sorted((r.num, r.tag) for r in df.collect())
    assert rows == [("01", "ab"), ("02", "cd"), ("03", "ef")]


def test_read_multiple_inputs_union_by_name(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([("y", 2)], ["v", "k"])  # reversed col order
    out = read_multiple_inputs([(a, None), (b, None)])
    assert sorted((r.k, r.v) for r in out.collect()) == [(1, "x"), (2, "y")]


def test_write_partitioned_creates_content_derived_dirs(spark, tmp_path):
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import write_partitioned

    p = str(tmp_path / "part")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], ["id", "grp"])
    write_partitioned(df, p, "grp", mode="overwrite")
    import os

    dirs = {d for d in os.listdir(p) if d.startswith("grp=")}
    assert dirs == {"grp=a", "grp=b"}
    assert spark.read.parquet(p).count() == 3


def test_hadoop_style_filenames_rename_and_flatten(spark, tmp_path):
    """SURVEY §4.3 item 4 closed: exact FileOutputFormat /
    MultipleOutputs FILENAME parity as a post-commit rename pass.
    Plain mode: part-00000-<uuid>.parquet → part-r-00000.parquet per
    dir. Flatten mode: leaf col=value dirs become <value>-r-NNNNN
    files in the parent (generateFileNameForKeyValue layout) and
    ancestor levels drop the col= prefix; data stays byte-readable."""
    import os

    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import (
        hadoop_style_filenames,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "a", "y"), (4, "a", "x")],
        ["id", "grp", "sub"],
    )

    # plain rename: MR-style task numbering inside each partition dir
    p1 = str(tmp_path / "plain")
    write_partitioned(df, p1, "grp", mode="overwrite")
    renamed = hadoop_style_filenames(p1)
    for d, names in renamed.items():
        assert all(
            n.startswith("part-r-") and n.endswith(".snappy.parquet")
            for n in names
        )
        assert names == sorted(names)
    assert spark.read.parquet(p1).count() == 4  # still readable

    # flatten: two-level partitioning -> <sub>-r-NNNNN files inside a
    # dir named after grp's VALUE (col= prefixes gone)
    p2 = str(tmp_path / "flat")
    write_partitioned(
        df.repartition("grp", "sub"), p2, "grp", "sub", mode="overwrite"
    )
    hadoop_style_filenames(p2, flatten=True)
    top = {d for d in os.listdir(p2) if not d.startswith(("_", "."))}
    assert top == {"a", "b"}
    a_files = sorted(
        f for f in os.listdir(os.path.join(p2, "a"))
        if not f.startswith((".", "_"))
    )
    assert a_files == ["x-r-00000.snappy.parquet", "y-r-00000.snappy.parquet"]
    # rows survive the flatten byte-for-byte (partition cols now live
    # in the file/dir names, the documented MR-consumer trade)
    back = spark.read.option("recursiveFileLookup", "true").parquet(p2)
    assert sorted(r.id for r in back.collect()) == [1, 2, 3, 4]

    # idempotent: a second pass finds nothing to rename...
    assert hadoop_style_filenames(p1) == {}
    # ...and a rename that would land on an existing finalized file
    # REFUSES instead of silently overwriting committed data
    import pytest

    victim_dir = next(iter(renamed))
    open(os.path.join(victim_dir, "part-00000-new.snappy.parquet"), "wb").write(
        b"x"
    )
    with pytest.raises(FileExistsError, match="refusing to overwrite"):
        hadoop_style_filenames(p1)


def test_hadoop_style_filenames_guards(spark, tmp_path):
    """Second-review hardening: (a) a missing path errors instead of
    reporting success over nothing; (b) the path ROOT is never
    value-derived even when named col=value (files must not move
    outside the tree); (c) a flatten that would produce a hidden
    ('_'/'.'-prefixed) file name — the null partition — refuses,
    because MR and Spark readers silently skip such files; (d) in
    flatten mode the returned dict keys are the FINAL (post-ancestor-
    rename) directories."""
    import os

    import pytest

    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import (
        hadoop_style_filenames,
        write_partitioned,
    )

    with pytest.raises(FileNotFoundError):
        hadoop_style_filenames(str(tmp_path / "nope"))

    # (b): point finalize at one partition subdir named col=value
    base = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "a")], ["id", "grp"])
    write_partitioned(df.repartition(1), base, "grp", mode="overwrite")
    sub = os.path.join(base, "grp=a")
    out = hadoop_style_filenames(sub, flatten=True)
    assert os.path.isdir(sub)  # root untouched, files renamed inside it
    assert list(out) == [sub]
    assert out[sub] == ["part-r-00000.snappy.parquet"]

    # (c): null partition -> __HIVE_DEFAULT_PARTITION__ must refuse
    p2 = str(tmp_path / "nulls")
    dfn = spark.createDataFrame([(1, "a"), (2, None)], ["id", "grp"])
    write_partitioned(dfn.repartition(1), p2, "grp", mode="overwrite")
    with pytest.raises(ValueError, match="hidden file/dir name"):
        hadoop_style_filenames(p2, flatten=True)

    # (d): flatten return keys are final paths
    p3 = str(tmp_path / "keys")
    df3 = spark.createDataFrame([(1, "a", "x")], ["id", "grp", "sub"])
    write_partitioned(
        df3.repartition(1), p3, "grp", "sub", mode="overwrite"
    )
    out3 = hadoop_style_filenames(p3, flatten=True)
    (k,) = out3
    assert k == os.path.join(p3, "a") and os.path.isdir(k)


def test_hadoop_style_filenames_flatten_collision_preflight(tmp_path):
    """ADVICE r9: sibling partitions whose values derive the SAME name
    (k1=x/ and k2=x/ under one parent) must refuse BEFORE the first
    rename — previously safe_replace/os.replace aborted mid-pass,
    leaving a partially renamed tree with no rollback. Pure-fs test:
    both the leaf-file collision and the ancestor-dir collision are
    caught with the tree bit-untouched."""
    import os

    import pytest

    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import (
        hadoop_style_filenames,
    )

    def mkleaf(d, n=1):
        os.makedirs(d)
        for i in range(n):
            with open(
                os.path.join(d, f"part-{i:05d}-abc.snappy.parquet"), "wb"
            ) as fh:
                fh.write(b"x")

    def snapshot(root):
        return sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root)
            for f in fs
        )

    # leaf-file collision: k1=x and k2=x both flatten into the parent
    p1 = str(tmp_path / "leafcol")
    mkleaf(os.path.join(p1, "k1=x"))
    mkleaf(os.path.join(p1, "k2=x"))
    before = snapshot(p1)
    with pytest.raises(FileExistsError, match="both resolve to"):
        hadoop_style_filenames(p1, flatten=True)
    assert snapshot(p1) == before  # nothing was renamed

    # ancestor-dir collision: two NON-leaf partition dirs derive 'x'
    p2 = str(tmp_path / "dircol")
    mkleaf(os.path.join(p2, "k1=x", "k3=a"))
    mkleaf(os.path.join(p2, "k2=x", "k3=b"))
    before = snapshot(p2)
    with pytest.raises(FileExistsError, match="both resolve to"):
        hadoop_style_filenames(p2, flatten=True)
    assert snapshot(p2) == before

    # target landing on a previously finalized file refuses pre-rename
    p3 = str(tmp_path / "refin")
    mkleaf(os.path.join(p3, "k1=x"))
    with open(
        os.path.join(p3, "x-r-00000.snappy.parquet"), "wb"
    ) as fh:
        fh.write(b"x")
    before = snapshot(p3)
    with pytest.raises(FileExistsError, match="refusing to overwrite"):
        hadoop_style_filenames(p3, flatten=True)
    assert snapshot(p3) == before

    # hidden-name refusal is now ALSO pre-rename: a sibling that would
    # rename fine must be untouched when another sibling refuses
    p4 = str(tmp_path / "hidden")
    mkleaf(os.path.join(p4, "grp=ok"))
    mkleaf(os.path.join(p4, "grp=__HIVE_DEFAULT_PARTITION__"))
    before = snapshot(p4)
    with pytest.raises(ValueError, match="hidden file/dir name"):
        hadoop_style_filenames(p4, flatten=True)
    assert snapshot(p4) == before


def test_write_null_noop_sink(spark):
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import write_null

    write_null(spark.range(100).withColumn("x", F.col("id") * 2))  # must not raise


def test_read_text_lines_nline_partitioning(spark, tmp_path):
    p = str(tmp_path / "nline")
    spark.range(50).select(F.col("id").cast("string").alias("value")).write.text(p)
    df = read_text_lines(spark, p, num_partitions=7)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 50


def test_read_text_lines_exact_n_per_split(spark, tmp_path):
    """NLineInputFormat contract: every split holds EXACTLY N lines,
    the last one ≤ N, in file order."""
    p = str(tmp_path / "nline_exact")
    spark.range(25).select(F.col("id").cast("string").alias("value")).coalesce(
        1
    ).write.text(p)
    df = read_text_lines(spark, p, lines_per_split=4)
    sizes = df.rdd.glom().map(len).collect()
    assert sizes == [4, 4, 4, 4, 4, 4, 1]
    # no line lost or duplicated, and splits are consecutive file ranges
    per_part = df.rdd.glom().collect()
    seen = [int(r[0]) for part in per_part for r in part]
    assert sorted(seen) == list(range(25))
    for part in per_part:
        vals = [int(r[0]) for r in part]
        assert vals == sorted(vals) and vals == list(range(vals[0], vals[0] + len(vals)))
    # with_offset: the key is the global, contiguous, file-ordered line number
    keyed = read_text_lines(spark, p, lines_per_split=4, with_offset=True)
    rows = sorted((r.key, int(r.value)) for r in keyed.collect())
    assert rows == [(i, i) for i in range(25)]


def test_read_text_lines_multifile_order_and_two_scans(spark, tmp_path):
    """The round-4 hardening: with a MULTI-file source (5 part files,
    interleaved values) the within-partition order must still be file
    order — structurally, via the sorted shuffle — and the whole read
    must scan the source exactly twice (the count job + the real
    read), observable as exactly two Spark jobs."""
    p = str(tmp_path / "nline_multi")
    spark.range(40).select(F.col("id").cast("string").alias("value")).repartition(
        5
    ).write.text(p)
    expected = [r.value for r in spark.read.text(p).collect()]  # source order
    assert expected != sorted(expected)  # interleaved → order is a real claim

    sc = spark.sparkContext
    sc.setJobGroup("nline-two-pass", "scan-count gate")
    try:
        parts = read_text_lines(spark, p, lines_per_split=6).rdd.glom().collect()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("nline-two-pass")
    assert len(jobs) == 2, f"expected count job + read job, got {len(jobs)}"

    assert [len(part) for part in parts] == [6] * 6 + [4]
    flat = [r.value for part in parts for r in part]
    assert flat == expected  # file order across AND within splits


def test_read_csv_skip_bad_records(spark, tmp_path):
    from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
        read_csv_skip_bad_records,
    )

    p = tmp_path / "mixed.csv"
    p.write_text("1,alice\n2,bob\nnot-an-int,carol\n3,dan\n")
    good, bad = read_csv_skip_bad_records(spark, str(p), "id int, name string")
    assert sorted((r.id, r.name) for r in good.collect()) == [
        (1, "alice"), (2, "bob"), (3, "dan"),
    ]
    assert [r.raw_line for r in bad.collect()] == ["not-an-int,carol"]


def test_sequence_file_roundtrip(spark, tmp_path):
    from hadoop_2_10_0_src_mapreduce_spark.sources.readers import read_sequence_file
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import write_sequence_file

    df = spark.createDataFrame([(1, "alice"), (2, "bob")], ["id", "name"])
    path = str(tmp_path / "seq")
    write_sequence_file(df, path, "id", "name")
    back = read_sequence_file(spark, path, key_name="id", value_name="name")
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "alice"), (2, "bob")]

    # the prescribed convert-once step: seqfile → parquet in one call,
    # after which the columnar path serves every query
    from hadoop_2_10_0_src_mapreduce_spark.sources.readers import (
        convert_sequence_file_to_parquet,
    )

    pq = str(tmp_path / "seq_pq")
    convert_sequence_file_to_parquet(
        spark, path, pq, key_name="id", value_name="name"
    )
    again = spark.read.parquet(pq)
    assert sorted((r.id, r.name) for r in again.collect()) == [
        (1, "alice"), (2, "bob"),
    ]


def test_mapfile_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    """MapFile.Reader.get parity: an equality lookup on the bucket key
    must scan ONE bucket's files (SelectedBucketsCount: 1 out of 8) —
    the 1/N index skip that makes point lookups O(table/N) at 100 TB."""
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import (
        lookup_sorted_bucketed,
        write_sorted_bucketed,
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_sorted_bucketed(df, "t_mapfile", "k", buckets=8, path=str(tmp_path / "mf"))
    try:
        hit = lookup_sorted_bucketed(spark, "t_mapfile", "k", 42)
        plan = hit._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert [(r.k, r.v) for r in hit.collect()] == [(42, 84)]
        # pruning must survive DERIVED DataFrames too (they re-plan in
        # the lookup's isolated session, where the disabling rule is
        # off for good — not just on the first pre-planned action)
        derived = hit.select("v")
        dplan = derived._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in dplan
        assert [r.v for r in derived.collect()] == [84]
        # the isolated session is memoized per SparkContext — repeated
        # lookups must NOT accumulate sessions (round-4 ADVICE fix)
        from hadoop_2_10_0_src_mapreduce_spark.sources.writers import (
            _lookup_session,
        )

        hit2 = lookup_sorted_bucketed(spark, "t_mapfile", "k", 7)
        assert hit.sparkSession is hit2.sparkSession
        assert _lookup_session(spark) is hit.sparkSession
        assert hit.sparkSession is not spark
    finally:
        spark.sql("DROP TABLE IF EXISTS t_mapfile")


def test_lazy_output_skips_empty_partitions(spark, tmp_path):
    """LazyOutputFormat parity: empty partitions produce no part files
    (Spark may emit one empty file for the first task; the other empty
    partitions must be skipped, unlike the reference's default
    one-file-per-reducer)."""
    import os

    p = str(tmp_path / "lazy")
    df = spark.range(100).select(
        (F.col("id") % 2).alias("k"), F.col("id").cast("string").alias("value")
    )
    df.repartition(8, "k").select("value").write.text(p)
    parts = [f for f in os.listdir(p) if f.startswith("part")]
    assert len(parts) <= 3  # ≥5 of the 8 (mostly empty) partitions skipped
    assert spark.read.text(p).count() == 100


def test_read_text_path_filter_and_recursive(spark, tmp_path):
    """FileInputFormat PathFilter + recursive-listing parity: a glob
    keeps only matching files; recursive descends subdirectories."""
    import os

    d = tmp_path / "mixed"
    sub = d / "nested"
    os.makedirs(sub)
    (d / "a.txt").write_text("keep-1\n")
    (d / "b.dat").write_text("drop-1\n")
    (sub / "c.txt").write_text("keep-2\n")
    flat = read_text_lines(spark, str(d), glob_filter="*.txt")
    assert sorted(r.value for r in flat.collect()) == ["keep-1"]
    deep = read_text_lines(spark, str(d), glob_filter="*.txt", recursive=True)
    assert sorted(r.value for r in deep.collect()) == ["keep-1", "keep-2"]


def test_compression_codec_matrix(spark, tmp_path):
    """Codec parity (SURVEY §2.1: DefaultCodec/Gzip/Deflate/BZip2 +
    modern lz4/snappy): transparent by-extension (de)compression must
    roundtrip text losslessly for every codec this box supports.
    zstd TEXT is exercised indirectly: the native hadoop zstd lib is
    absent locally, but parquet zstd (parquet-java's own impl) runs on
    every write_table call."""
    df = spark.range(100).select(F.col("id").cast("string").alias("value"))
    ext = {"gzip": "gz", "bzip2": "bz2", "deflate": "deflate",
           "lz4": "lz4", "snappy": "snappy"}
    for codec, suffix in ext.items():
        p = str(tmp_path / codec)
        df.write.option("compression", codec).text(p)
        import os

        assert any(f.endswith(suffix) for f in os.listdir(p) if f.startswith("part"))
        back = read_text_lines(spark, p)
        assert sorted(int(r.value) for r in back.collect()) == list(range(100))


def test_orc_roundtrip(spark, tmp_path):
    """ORC as an extra self-describing columnar container (free engine
    capability beyond the reference's SequenceFile): schema + values
    must survive the roundtrip."""
    p = str(tmp_path / "orc")
    df = spark.range(50).select("id", (F.col("id") * 3).alias("v"))
    df.write.orc(p)
    back = spark.read.orc(p)
    # nullability widens on read (file sources always report nullable);
    # names and types are the contract
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert back.agg(F.sum("v")).first()[0] == sum(3 * i for i in range(50))


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """REAL DBOutputFormat/DataDrivenDBInputFormat parity run: write a
    table through the JDBC sink into embedded Derby (ships in Spark's
    jars), read it back with WHERE-range partitioning, and check both
    the values and the split count."""
    from hadoop_2_10_0_src_mapreduce_spark.sources.readers import read_jdbc_partitioned
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import write_jdbc

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    write_jdbc(df, url, "t_round", properties=props)
    back = read_jdbc_partitioned(
        spark, url, "t_round",
        split_column="id", lower=0, upper=99, num_partitions=4,
        properties=props,
    )
    assert back.rdd.getNumPartitions() == 4  # DataDrivenDB range splits
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(100))
    # overwrite mode drops and recreates — the reload-in-place contract
    write_jdbc(df.limit(10), url, "t_round", mode="overwrite", properties=props)
    assert spark.read.format("jdbc").option("url", url).option(
        "dbtable", "t_round"
    ).option("driver", props["driver"]).load().count() == 10


def test_jdbc_write_options_plumbing():
    """DBOutputFormat parity, sans server: batching/isolation/truncate
    knobs must land in the option bag Spark's JDBC sink consumes."""
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import jdbc_write_options

    opts = jdbc_write_options(
        "jdbc:postgresql://db/warehouse",
        "out_table",
        batch_size=5000,
        truncate=True,
        properties={"user": "etl"},
    )
    assert opts["url"] == "jdbc:postgresql://db/warehouse"
    assert opts["dbtable"] == "out_table"
    assert opts["batchsize"] == "5000"
    assert opts["isolationLevel"] == "READ_UNCOMMITTED"
    assert opts["truncate"] == "true"
    assert opts["user"] == "etl"


def test_write_table_bloom_filter_emitted(spark, tmp_path):
    """BloomMapFile parity: bloom-enabled parquet must carry the filter
    bytes (footer advertises a bloom offset for the column; the files
    grow by the filter size) and read back identically."""
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import write_table

    df = spark.range(20_000).select(F.col("id").alias("k")).coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    write_table(df, plain)
    write_table(df, bloomed, bloom_filter_cols=("k",), bloom_ndv=20_000)

    import os

    def pq_bytes(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    # a 20k-NDV filter is ~dozens of KB; zstd'd data alone is identical
    assert pq_bytes(bloomed) > pq_bytes(plain) + 10_000
    assert spark.read.parquet(bloomed).count() == 20_000


def test_write_side_outputs_named_routing(spark, tmp_path):
    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import write_side_outputs

    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (30, "z")], ["id", "v"]
    )
    base = str(tmp_path / "side")
    write_side_outputs(
        df,
        base,
        {"small": F.col("id") < 10, "all_rows": F.lit(True)},
    )
    assert spark.read.parquet(f"{base}/small").count() == 2
    assert spark.read.parquet(f"{base}/all_rows").count() == 3


def test_compact_table_reduces_files_and_preserves_rows(spark, tmp_path):
    """The maintenance pass for append-heavy tables (streaming sinks,
    the incremental dedup index): many tiny appended file sets compact
    to a handful of files, rows and partition layout intact, via an
    atomic directory swap."""
    import pathlib

    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import compact_table

    path = str(tmp_path / "appended")
    # simulate 12 micro-batch appends of a partitioned table
    for b in range(12):
        spark.createDataFrame(
            [(b * 10 + i, f"doc {b}-{i}", "a" if i % 2 == 0 else "b") for i in range(5)],
            "doc_id long, text string, src string",
        ).write.mode("append").partitionBy("src").parquet(path)
    before_rows = sorted(
        (r.doc_id, r.text, r.src) for r in spark.read.parquet(path).collect()
    )
    n_before = len(list(pathlib.Path(path).rglob("*.parquet")))
    assert n_before >= 24  # at least one file per (batch, partition)

    compact_table(spark, path, partition_cols=("src",))
    after = spark.read.parquet(path)
    after_rows = sorted((r.doc_id, r.text, r.src) for r in after.collect())
    assert after_rows == before_rows
    n_after = len(list(pathlib.Path(path).rglob("*.parquet")))
    assert n_after < n_before / 4
    # partition dirs survive (src=a / src=b layout)
    dirs = {p.name for p in pathlib.Path(path).iterdir() if p.is_dir()}
    assert {"src=a", "src=b"} <= dirs


def test_atomic_swap_write_heals_crash_window(spark, tmp_path):
    """A crash BETWEEN atomic_swap_write's two renames leaves the only
    surviving copies in `.__old__` (+ a complete `.__compact__`); the
    next call must roll the swap forward / restore the old live dir —
    never rmtree them as debris (the round-5 advice finding). Debris
    with the live dir intact is still cleaned. The healing is observed
    directly by aborting the subsequent rewrite via the refuse-empty
    guard."""
    import pathlib
    import shutil

    import pytest

    from hadoop_2_10_0_src_mapreduce_spark.sources.writers import (
        atomic_swap_write,
    )

    path = str(tmp_path / "t")
    empty = spark.range(0).coalesce(1)

    # state: crashed between renames, new data fully written
    spark.range(10).coalesce(1).write.parquet(path)
    shutil.move(path, path + ".__old__")
    spark.range(100, 110).coalesce(1).write.parquet(path + ".__compact__")
    with pytest.raises(ValueError, match="EMPTY"):
        atomic_swap_write(empty, path, [])
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == list(
        range(100, 110)
    )  # rolled FORWARD to the completed compact result
    assert not pathlib.Path(path + ".__old__").exists()
    assert not pathlib.Path(path + ".__compact__").exists()

    # state: crashed between renames, compact result lost -> restore old
    shutil.move(path, path + ".__old__")
    with pytest.raises(ValueError, match="EMPTY"):
        atomic_swap_write(empty, path, [])
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == list(
        range(100, 110)
    )
    # state: live dir intact -> leftovers are debris and a real swap runs
    spark.range(5).coalesce(1).write.parquet(path + ".__compact__")
    spark.range(7).coalesce(1).write.parquet(path + ".__old__")
    atomic_swap_write(spark.range(200, 203).coalesce(1), path, [])
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == [
        200, 201, 202,
    ]
    assert not pathlib.Path(path + ".__old__").exists()
    assert not pathlib.Path(path + ".__compact__").exists()
