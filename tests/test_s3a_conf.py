"""S7: S3A conf surface — the conf must land where S3A reads it."""

from __future__ import annotations

from udacitycapstonedataengineer_spark.session import configure_s3a, s3a_conf


def test_s3a_conf_shapes():
    static = s3a_conf(access_key="AK", secret_key="SK")
    assert static["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert static["spark.hadoop.fs.s3a.committer.name"] == "magic"

    chained = s3a_conf()
    assert "access.key" not in str(sorted(chained))
    assert chained["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "DefaultAWSCredentialsProviderChain"
    )

    ep = s3a_conf(endpoint="http://minio:9000")
    assert ep["spark.hadoop.fs.s3a.path.style.access"] == "true"


def test_configure_s3a_lands_in_hadoop_conf(spark):
    configure_s3a(spark, endpoint="http://minio:9000")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    # the keys S3AFileSystem actually reads (fs.s3a.*, unprefixed)
    assert hconf.get("fs.s3a.endpoint") == "http://minio:9000"
    assert hconf.get("fs.s3a.committer.name") == "magic"
    assert hconf.get("fs.s3a.experimental.input.fadvise") == "random"
