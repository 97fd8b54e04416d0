package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping — the
  * Spark-native analog of Delta's OPTIMIZE ZORDER BY. Reference
  * implements nothing (SURVEY.md §0); semantics follow the public Delta
  * feature + the classic Morton-code construction.
  *
  * Each clustering column is mapped to a `bits`-wide EQUI-DEPTH rank:
  * boundaries come from one distributed quantile-sketch pass over all
  * clustered columns (`approxQuantile` — the only driver-held value is
  * the ~2 KB boundary array, broadcast back as a literal), and the rank
  * is the per-row count of boundaries at or below the value (a map-only
  * higher-order `aggregate` over the literal array). Equi-depth matters:
  * equi-WIDTH (min/max-scaled) ranks collapse under skew — on the
  * exponential `value` column most rows land in the lowest cells and a
  * low-range predicate prunes nothing (measured) — and partition-id
  * ranks collapse under low cardinality (15 users never reach the high
  * Morton bits). Quantile ranks spread any distribution across the full
  * bit width by mass.
  *
  * The ranks' bits are interleaved into one Morton key and the data is
  * range-partitioned + sorted on it before writing, so every file's
  * parquet footer min/max is tight on every clustered column at once —
  * a predicate on ANY of them prunes most files
  * (ExactlyOnceSink.readSkipping), which is what keeps a 100 TB table
  * queryable on its second-most-selective column too (partitioning only
  * ever serves the first).
  *
  * Scale shape: one sketch pass + one range-repartition on the key —
  * cheaper than Delta OPTIMIZE's per-column range-id passes; ranking and
  * interleaving are map-only codegen'd ops.
  */
object ZOrder {

  /** Order-preserving numeric proxy for a clustering column — what the
    * equi-depth quantile sketch and the rank both run on. Numerics (and
    * dates/timestamps/booleans) cast losslessly; STRINGS pack their
    * first 6 UTF-8 bytes big-endian into a long (right-padded, so
    * "ab" < "b" stays true numerically): proxy order = binary UTF-8
    * order on the 6-byte prefix, which is exactly the order parquet
    * footer min/max stats compare in — so string-clustered files prune
    * under string predicates. Prefix ties just share rank buckets;
    * skipping stays lossless either way (Delta ZORDER BY accepts
    * strings; so do we). */
  private def orderProxy(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case StringType =>
        conv(rpad(hex(substring(encode(col(c), "UTF-8"), 1, 6)), 12, "0"),
          16, 10).cast("double")
      case DateType => unix_date(col(c)).cast("double")
      case TimestampType => unix_micros(col(c)).cast("double")
      case BooleanType => col(c).cast("int").cast("double")
      case _: NumericType => col(c).cast("double")
      case other => throw new IllegalArgumentException(
        s"zorder: column '$c' has unclusterable type $other — cluster on " +
          "numeric, string, date, timestamp, or boolean columns")
    }
  }

  /** Attach the Morton key as `__z`: `bits` bits per column (equi-depth
    * rank buckets), interleaved column-major — bit i of column c lands
    * at position i*k + c. */
  def key(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"zorder: ${cols.size} cols x $bits bits must fit a long")
    require(!df.columns.contains("__z"),
      "zorder: input already has a __z column — rename it before clustering")
    val k = cols.size
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // proxy columns materialized under reserved names only for the sketch
    // pass (approxQuantile takes column names, not expressions)
    val proxied = cols.zipWithIndex.foldLeft(df) { case (d, (c, ci)) =>
      d.withColumn(s"__zp$ci", orderProxy(df, c))
    }
    // one pass, every column; relativeError trades sketch size for rank
    // balance, not correctness (skipping stays lossless either way)
    val bounds = proxied.stat.approxQuantile(
      cols.indices.map(i => s"__zp$i").toArray, probs, 0.001)
    val z = cols.indices.map { ci =>
      val rank = aggregate(
        lit(bounds(ci)), lit(0L),
        (acc, b) => acc + when(col(s"__zp$ci") >= b, 1L).otherwise(0L))
      (0 until bits).map { i =>
        shiftleft(shiftright(rank, i).bitwiseAND(lit(1L)), i * k + ci)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
    proxied.withColumn("__z", z)
      .drop(cols.indices.map(i => s"__zp$i"): _*)
  }

  /** Cluster `df` into `numFiles` z-ordered write units: range-partition
    * on the Morton key (global z-sort across files), sort within each
    * partition, drop the key. One write task per file; each file covers
    * a compact z-range. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame =
    key(df, cols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
