"""S10 (S3 TSV import) — executable environment gate.

The reference imports TSVs from S3 with the same loader code it uses
for local files (util/loader/s3.py hands the object down to the same
TSV path). Our reader is identically scheme-agnostic: ``read_tsv``
passes the URI straight to Hadoop's FileSystem resolver, so an
``s3a://`` path needs only the hadoop-aws connector on the classpath —
no code change. This container ships no hadoop-aws jar, so the path
cannot be integration-tested here; these tests pin (a) that the
failure is EXACTLY the missing connector (nothing in our code rejects
the scheme first), and (b) that the reader resolves any
Hadoop-registered scheme, so wiring a connector is configuration, not
code."""

from __future__ import annotations

import pytest


def test_s3a_failure_is_the_missing_connector_not_our_code(spark):
    from cccatalog_spark.sources.tsv import read_tsv

    with pytest.raises(Exception) as exc:
        read_tsv(spark, "s3a://bucket/prefix/batch.tsv").count()
    # Hadoop's FS resolver is reached (scheme accepted, URI intact):
    # the error is the absent S3AFileSystem class, not a parse or
    # validation failure inside the reader
    assert "org.apache.hadoop.fs.s3a.S3AFileSystem" in str(exc.value)


def test_reader_resolves_any_registered_hadoop_scheme(spark, tmp_path):
    # file:// exercises the same FileSystem.get(uri) dispatch an s3a://
    # path takes once a connector registers the scheme
    from cccatalog_spark.sources.tsv import read_tsv

    p = tmp_path / "batch.tsv"
    p.write_text("a\tb\tc\n1\t\\N\t2.5\n")
    df = read_tsv(spark, f"file://{p}")
    assert df.count() == 2
