package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The scaling canary's conclusions are only as good as its fixture
  * construction: the per-copy perturbations must keep duplicate density
  * CONSTANT (so output — and thus work — should scale ~K×, and a
  * superlinear time ratio indicts the plan, not the data). These tests
  * pin the three invariants the ScaleBench scaladoc claims. */
class ScaleBenchSpec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterAll {

  private var built = false
  private lazy val dir: String = {
    built = true
    val d = Files.createTempDirectory("graft-scalespec").toString
    ScaleBench.buildScaledFixture(spark, sf, 3, d)
    d
  }

  test("scaled fixture multiplies rows with disjoint id ranges") {
    for ((t, id) <- Seq("documents" -> "doc_id", "embeddings" -> "vec_id",
        "events" -> "event_id")) {
      val base = Tables(spark, sf, t)
      val big = spark.read.parquet(s"$dir/$t.parquet")
      assert(big.count() === base.count() * 3, t)
      assert(big.select(id).distinct().count() === big.count(), s"$t ids collide")
    }
    // unscaled tables pass through intact
    val n0 = Tables(spark, sf, "nation").count()
    assert(spark.read.parquet(s"$dir/nation.parquet").count() === n0)
  }

  test("document copies are token-disjoint across copies, isomorphic within") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stride = Tables(spark, sf, "documents")
      .agg(max(col("doc_id"))).head().getLong(0) + 1
    val toks = docs
      .withColumn("copy", floor(col("doc_id") / stride))
      .select(col("copy"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    // a token never appears in two copies (the suffix-tag family tags
    // EVERY token of copy k>0, so disjointness is total — the Caesar
    // family it replaced leaked digit/punctuation tokens by design)
    val shared = toks.groupBy("tok")
      .agg(countDistinct(col("copy")).as("nc"))
      .filter(col("nc") > 1).count()
    assert(shared === 0, "suffix tags leaked tokens across copies")
    // isomorphic within: tagging preserves the token count and the
    // per-doc distinct-token count — the shape every shingle/set-
    // similarity relation keys on (text LENGTH grows by one tag per
    // token, disclosed in the ScaleBench scaladoc)
    val bad = docs
      .withColumn("base_id", col("doc_id") % stride)
      .groupBy("base_id")
      .agg(countDistinct(size(split(col("text"), " "))).as("nt"),
        countDistinct(size(array_distinct(split(col("text"), " "))))
          .as("nd"))
      .filter(col("nt") > 1 || col("nd") > 1).count()
    assert(bad === 0, "tagging changed doc token structure")
  }

  test("embedding rotation preserves intra-copy dot products exactly") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val stride = Tables(spark, sf, "embeddings")
      .agg(max(col("vec_id"))).head().getLong(0) + 1
    val dot = (a: String, b: String) => aggregate(
      zip_with(col(a), col(b), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    // pairwise dot products of the first 20 base vectors, per copy:
    // cyclic rotation is orthogonal, so each copy's matrix must equal
    // the base copy's bit-for-bit (float sums in index order differ by
    // rotation, hence the 1e-5 tolerance rather than exact equality)
    val sample = embs.withColumn("copy", floor(col("vec_id") / stride))
      .withColumn("base_id", col("vec_id") % stride)
      .filter(col("base_id") < 20)
    val grid = sample.alias("x").join(sample.alias("y"),
        col("x.copy") === col("y.copy") && col("x.base_id") < col("y.base_id"))
      .select(col("x.copy").as("copy"), col("x.base_id").as("i"),
        col("y.base_id").as("j"),
        dot("x.embedding", "y.embedding").as("d"))
    val drift = grid.groupBy("i", "j")
      .agg((max(col("d")) - min(col("d"))).as("spread"))
      .agg(max(col("spread"))).head().getDouble(0)
    assert(drift < 1e-5, s"rotation broke intra-copy geometry: $drift")
  }

  test("lineitem scaling grows the price domain, keeps rank structure") {
    import spark.implicits._
    val base = Tables(spark, sf, "lineitem")
    val big = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(big.count() === base.count() * 3)
    // the near-unique price DOMAIN must grow with the copies (the term
    // q_agg_spearman's distinct-relation window actually sorts) ...
    val dBase = base.select("l_extendedprice").distinct().count()
    val dBig = big.select("l_extendedprice").distinct().count()
    assert(dBig > dBase * 2, s"price domain did not scale: $dBase -> $dBig")
    // ... while a constant per-copy shift preserves every copy's
    // internal ordering, so per-flag row counts scale exactly
    val perFlag = base.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .as[(String, Long)].collect().foreach { case (f, n) =>
        assert(n === perFlag(f) * 3, s"flag $f")
      }
  }

  override def afterAll(): Unit = {
    if (built) {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      if (Files.exists(p))
        withDirStream(Files.walk(p))(_.toSeq).reverse.foreach(Files.delete)
    }
    super.afterAll()
  }
}
