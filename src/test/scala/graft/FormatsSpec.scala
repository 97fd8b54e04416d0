package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink format breadth (SURVEY.md §2.1): the engine reads and
  * writes every columnar/row format the offline Spark build ships —
  * parquet, ORC, JSON-lines, CSV, text — with schema fidelity asserted
  * by roundtrip. Avro: the spark-avro CONNECTOR jar is absent from the
  * image, but the core Avro jars are on Spark's classpath, so
  * graft.sources.AvroIO implements the format against the public Avro
  * Java API (OCF write per partition, splittable AvroKeyInputFormat
  * read) — roundtrip asserted here like the built-ins. */
class FormatsSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate")

  test("parquet / orc / json / csv roundtrip preserves rows and values") {
    val src = Tables(spark, sf, "orders")
      .select(cols.map(col): _*).orderBy("o_orderkey")
    val expected = src.collect().map(_.toString).toSeq
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val dir = s"${tmp(s"graft-$fmt")}/t"
      src.write.format(fmt).option("header", "true").save(dir)
      val back = spark.read.format(fmt)
        .option("header", "true")
        // json/csv are schemaless on disk; read against the declared
        // schema (the engine never runtime-infers schemas, SURVEY §1.2)
        .schema(src.schema)
        .load(dir)
        .orderBy("o_orderkey")
      assert(back.schema == src.schema, s"$fmt schema drift")
      assert(back.collect().map(_.toString).toSeq == expected, s"$fmt rows differ")
    }
  }

  test("avro roundtrip preserves rows, values, and logical types") {
    import graft.sources.AvroIO
    // events exercises timestamp-micros, long, string, double; add an
    // array column and a genuinely-null column for the union paths
    val src = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"),
        split(col("event_type"), "i").as("parts"),
        when(col("value") > 100, col("value")).as("maybe_null"))
      .orderBy("event_id")
    val dir = s"${tmp("graft-avro")}/t"
    val written = AvroIO.write(src, dir)
    assert(written == src.count())

    // schema recovered from the OCF header == declared schema (modulo
    // nullability: Row-built DataFrames declare everything nullable)
    val recovered = AvroIO.readSchemaOf(spark, dir)
    assert(recovered.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)

    val back = AvroIO.read(spark, dir).orderBy("event_id")
    assert(back.collect().map(_.toString).toSeq ==
      src.collect().map(_.toString).toSeq, "avro rows differ")
    // null union actually exercised
    assert(back.filter(col("maybe_null").isNull).count() > 0)
  }

  test("avro read block-splits one large container file") {
    import graft.sources.AvroIO
    // one writer partition -> ONE container file; a reader that can only
    // parallelize per-file would scan it in a single task. OCF sync
    // markers + AvroKeyInputFormat must split it by byte ranges instead.
    val src = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .coalesce(1)
    val dir = s"${tmp("graft-avro-split")}/t"
    AvroIO.write(src, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 1)

    val old = spark.sparkContext.hadoopConfiguration
      .get("mapreduce.input.fileinputformat.split.maxsize")
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.input.fileinputformat.split.maxsize", "4096")
    try {
      val back = AvroIO.read(spark, dir, src.schema)
      assert(back.rdd.getNumPartitions > 1,
        s"one 4 KB-max-split file read as ${back.rdd.getNumPartitions} partition(s) — not splittable")
      assert(back.count() == src.count())
      assert(back.agg(sum("event_id")).head().getLong(0) ==
        src.agg(sum("event_id")).head().getLong(0))
    } finally {
      if (old == null)
        spark.sparkContext.hadoopConfiguration
          .unset("mapreduce.input.fileinputformat.split.maxsize")
      else spark.sparkContext.hadoopConfiguration
        .set("mapreduce.input.fileinputformat.split.maxsize", old)
    }
  }

  test("avro roundtrips nullable nested structs and arrays of structs") {
    import graft.sources.AvroIO
    // Row-built DataFrames declare every field nullable, so each nested
    // record sits inside union(null, record) — the case where the record
    // must be built against the union's exact named schema branch
    val src = Tables(spark, sf, "events")
      .select(col("event_id"),
        struct(col("user_id"), col("event_type")).as("who"),
        array(struct(col("value").as("v"), col("event_type").as("t")))
          .as("tags"),
        when(col("value") > 100,
          struct(col("value").as("big"))).as("maybe_struct"))
      .orderBy("event_id")
    val dir = s"${tmp("graft-avro-nested")}/t"
    AvroIO.write(src, dir)
    val back = AvroIO.read(spark, dir).orderBy("event_id")
    assert(back.collect().map(_.toString).toSeq ==
      src.collect().map(_.toString).toSeq, "nested avro rows differ")
    assert(back.filter(col("maybe_struct").isNull).count() > 0)
  }

  test("avro roundtrips pre-1970 timestamps exactly") {
    import graft.sources.AvroIO
    import java.sql.Timestamp
    val rows = Seq(
      Timestamp.valueOf("1969-07-20 20:17:40.123456"),
      Timestamp.valueOf("1900-01-01 00:00:00.000001"),
      Timestamp.valueOf("2026-08-13 12:34:56.654321"))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.zipWithIndex.map {
        case (t, i) => org.apache.spark.sql.Row(i.toLong, t)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
    val dir = s"${tmp("graft-avro-neg")}/t"
    AvroIO.write(src, dir)
    val back = AvroIO.read(spark, dir).orderBy("id")
      .collect().map(_.getTimestamp(1)).toSeq
    assert(back == rows, s"pre-1970 drift: $back")
  }

  test("avro read of a dir with no .avro files fails with a clear message") {
    val dir = tmp("graft-avro-empty")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val e = intercept[IllegalArgumentException] {
      graft.sources.AvroIO.readSchemaOf(spark, dir)
    }
    assert(e.getMessage.contains("no .avro files"), e.getMessage)
  }

  test("text format roundtrips raw lines") {
    val dir = s"${tmp("graft-text")}/t"
    val src = Tables(spark, sf, "documents")
      .select(col("text")).orderBy("text")
    src.write.text(dir)
    val back = spark.read.text(dir).orderBy("value")
    assert(back.count() == src.count())
    assert(back.agg(sum(length(col("value")))).head().getLong(0) ==
      src.agg(sum(length(col("text")))).head().getLong(0))
  }
}
