package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4; builder north star
  * "salting for skew").
  *
  * A shuffled equi-join hash-partitions both sides on the key, so one
  * hot key (a null-ish default, a celebrity user, an empty document)
  * lands its entire row set in ONE task — the straggler that decides a
  * 100 TB job's wall-clock. AQE's skew-join split handles the
  * sort-merge case automatically; this operator is the explicit form
  * that also covers shuffled-hash joins and pre-AQE plans, and the
  * canonical technique a pipeline author reaches for:
  *
  *  - every LEFT row gets a deterministic salt in [0, buckets) (hashed
  *    from the whole row, so identical rows co-locate but a hot KEY
  *    spreads across `buckets` partitions);
  *  - the RIGHT side is replicated once per salt value;
  *  - the join key becomes (key, salt) — semantically identical to the
  *    plain join (each left row matches exactly the one replica carrying
  *    its salt), but the hot key's rows now occupy `buckets` tasks.
  *
  * Cost model: right side is replicated `buckets`×, so use it when
  * |right| × buckets ≪ |left|'s hot-key mass — the usual fact⋈dim skew
  * shape. Inner and left-outer semantics are preserved.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting preserves inner/left semantics only, got $joinType")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(buckets.toLong)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey)
          && saltedLeft("_salt") === saltedRight("_salt"),
        joinType)
      .drop("_salt")
  }
}
