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
