package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vectors
import graft.sources.Tables

class VectorExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen'd cosine/dot match the HOF formulation bit-for-bit") {
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = a.filter(col("id_a") < 8)
      .join(b.filter(col("id_b") < 8), col("id_a") < col("id_b"))
    val diffs = pairs.select(
        Vectors.cosine(col("va"), col("vb")).as("c_native"),
        Vectors.cosineHof(col("va"), col("vb")).as("c_hof"),
        Vectors.dot(col("va"), col("vb")).as("d_native"),
        Vectors.dotHof(col("va"), col("vb")).as("d_hof"))
      .filter(col("c_native") =!= col("c_hof") ||
        col("d_native") =!= col("d_hof"))
    assert(diffs.count() == 0, "native expression must equal HOF exactly")
  }

  test("expressions are SQL-callable via GraftExtensions") {
    val got = spark.sql(
      """SELECT cosine_sim(array(cast(1 as float), cast(0 as float)),
        |                  array(cast(1 as float), cast(0 as float))) AS c,
        |       dot_product(array(cast(1 as float), cast(2 as float)),
        |                   array(cast(3 as float), cast(4 as float))) AS d
        |""".stripMargin).head
    assert(math.abs(got.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(got.getDouble(1) - 11.0) < 1e-12)
  }

  test("srp_signatures and simhash_agg are SQL-callable") {
    val sig = spark.sql(
      """SELECT srp_signatures(array(cast(1 as float), cast(-2 as float)),
        |                      3, 4) AS s""".stripMargin)
      .head.getSeq[Long](0)
    assert(sig.length == 3)
    val sim = spark.sql(
      """SELECT simhash_agg(h) AS s FROM
        |  (SELECT xxhash64(x) AS h FROM VALUES ('a'), ('b') AS t(x))
        |""".stripMargin).head.getLong(0)
    assert(sim != 0L)
    // non-literal shape parameters must be rejected loudly
    intercept[Exception](spark.sql(
      "SELECT srp_signatures(array(cast(1 as float)), 1 + 1, 4)").collect())
  }

  test("srp_signatures generated code actually compiles (no silent fallback)") {
    // CODEGEN_ONLY makes Janino failures throw instead of quietly
    // interpreting — proves the doGenCode body is valid Java.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val sigs = Tables(spark, TestSpark.sf, "embeddings").limit(8)
        .select(graft.sim.Knn.srpBands("embedding", 4, 3).as("s"))
        .collect().map(_.getSeq[Long](0))
      assert(sigs.forall(_.length == 4))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("cosine participates in whole-stage codegen (no fallback)") {
    val emb = Tables(spark, TestSpark.sf, "embeddings").limit(4)
    val df = emb.select(Vectors.cosine(col("embedding"), col("embedding")))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*"), s"expected codegen stage marker in:\n$p")
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9),
      "self-cosine must be 1")
  }
}
