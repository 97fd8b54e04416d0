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

  /** Attach the Morton key as `__z`: `bits` bits per column (equi-depth
    * rank buckets), interleaved column-major — bit i of column c lands
    * at position i*k + c. */
  def key(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"zorder: ${cols.size} cols x $bits bits must fit a long")
    val k = cols.size
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // one pass, every column; relativeError trades sketch size for rank
    // balance, not correctness (skipping stays lossless either way)
    val bounds = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    val z = cols.zipWithIndex.map { case (c, ci) =>
      val rank = aggregate(
        lit(bounds(ci)), lit(0L),
        (acc, b) => acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))
      (0 until bits).map { i =>
        shiftleft(shiftright(rank, i).bitwiseAND(lit(1L)), i * k + ci)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
    df.withColumn("__z", z)
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
