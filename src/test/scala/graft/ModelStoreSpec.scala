package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.{Ivf, ModelStore, Pq}

/** Ground truth for the fit-once / apply-many ANN lifecycle (s09):
  * ModelStore round-trip identity, loud shape/kind failures,
  * incremental-encode == full-encode equality (the d07 discipline on
  * vectors), and from-model == end-to-end result equality for both
  * query paths. */
class ModelStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val m = 4
  private val ksub = 4

  /** PqSpec's quantizable corpus: subspace s of vector i uses corner
    * pattern (i + s) % 4, so k-means recovers the alphabet exactly and
    * every derived frame is deterministic. */
  private def quantizable(n: Int): DataFrame =
    (0 until n).map { i =>
      val v = (0 until m).flatMap { s =>
        val pat = (i + s) % 4
        Seq.tabulate(4)(j => if (j == pat) 10f + pat else 0f)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")

  private def tempPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"modelstore_$tag")
      .resolve("model").toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("pq_codebooks save/load round trip is identity") {
    val cb = Pq.fitCodebooks(quantizable(40), "vec_id", "embedding", m, ksub)
    val path = tempPath("cb")
    ModelStore.save(cb, "pq_codebooks", path)
    val loaded = ModelStore.load(spark, "pq_codebooks", path)
    assert(loaded.columns.toSet == Set("sub", "code", "centroid"))
    assert(sortedRows(loaded) == sortedRows(cb))
  }

  test("ivf_centroids save/load round trip is identity") {
    val corpus = quantizable(40)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val cent = Ivf.fitCentroids(corpus, c = 4, iters = 2)
    val path = tempPath("cent")
    ModelStore.save(cent, "ivf_centroids", path)
    val loaded = ModelStore.load(spark, "ivf_centroids", path)
    assert(loaded.columns.toSet == Set("cluster", "centroid"))
    assert(sortedRows(loaded) == sortedRows(cent))
  }

  test("kind mix-ups and unknown kinds fail loudly at the API boundary") {
    val cb = Pq.fitCodebooks(quantizable(40), "vec_id", "embedding", m, ksub)
    val path = tempPath("mixup")
    ModelStore.save(cb, "pq_codebooks", path)
    // load under the wrong kind: must fail on SHAPE, not downstream
    val e1 = intercept[IllegalArgumentException] {
      ModelStore.load(spark, "ivf_centroids", path)
    }
    assert(e1.getMessage.contains("ivf_centroids"))
    // save under the wrong kind
    val e2 = intercept[IllegalArgumentException] {
      ModelStore.save(cb, "ivf_centroids", tempPath("wrongsave"))
    }
    assert(e2.getMessage.contains("columns"))
    // unknown kind
    val e3 = intercept[IllegalArgumentException] {
      ModelStore.save(cb, "frobnicator", tempPath("unknown"))
    }
    assert(e3.getMessage.contains("unknown model kind"))
  }

  test("incremental encode == full encode for unchanged rows") {
    // The s09 contract: encode is row-local given the codebooks, so
    // encoding a batch alone against loaded codebooks must agree
    // bit-for-bit with the same rows' codes from a one-shot full-corpus
    // encode against the same codebooks.
    val full = quantizable(60)
    val batch1 = full.filter(col("vec_id") % 2 === 0)
    val batch2 = full.filter(col("vec_id") % 2 === 1)
    val cb = Pq.fitCodebooks(batch1, "vec_id", "embedding", m, ksub)
    val path = tempPath("incr")
    ModelStore.save(cb, "pq_codebooks", path)
    val loaded = ModelStore.load(spark, "pq_codebooks", path)
    val incr = Pq.encode(batch2, "vec_id", "embedding", loaded, m)
    val fullEnc = Pq.encode(full, "vec_id", "embedding", loaded, m)
      .filter(col("id") % 2 === 1)
    assert(sortedRows(incr) == sortedRows(fullEnc))
    assert(incr.count() == 30)
    // and assignment is row-local the same way
    val corpus1 = batch1.select(col("vec_id").as("id"), col("embedding").as("v"))
    val cent = Ivf.fitCentroids(corpus1, c = 4, iters = 2)
    val incrAssign = Ivf.assign(
      batch2.select(col("vec_id").as("id"), col("embedding").as("v")), cent)
      .select(col("id"), col("cluster"))
    val fullAssign = Ivf.assign(
      full.select(col("vec_id").as("id"), col("embedding").as("v")), cent)
      .select(col("id"), col("cluster")).filter(col("id") % 2 === 1)
    assert(sortedRows(incrAssign) == sortedRows(fullAssign))
  }

  test("pqKnnFromModel == pqKnn for codes from the same codebooks") {
    val emb = quantizable(40)
    val endToEnd = Pq.pqKnn(emb, "vec_id", "embedding",
      probeFilter = col("vec_id") < 3, k = 3, m = m, ksub = ksub)
    val cb = Pq.fitCodebooks(emb, "vec_id", "embedding", m, ksub)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb, m)
    val fromModel = Pq.pqKnnFromModel(emb, "vec_id", "embedding", cb, codes,
      probeFilter = col("vec_id") < 3, k = 3, m = m)
    assert(sortedRows(fromModel) == sortedRows(endToEnd))
  }

  test("ivfPqKnnFromModel == ivfPqKnn for models fit on the same corpus") {
    val emb = quantizable(40)
    val endToEnd = Pq.ivfPqKnn(emb, "vec_id", "embedding",
      probeFilter = col("vec_id") < 3, k = 3, c = 4, nprobe = 2,
      m = m, ksub = ksub)
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val cent = Ivf.fitCentroids(corpus, c = 4, iters = 3)
    val cells = Ivf.assign(corpus, cent).select(col("id"), col("cluster"))
    val cb = Pq.fitCodebooks(emb, "vec_id", "embedding", m, ksub)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb, m)
      .join(cells, Seq("id"))
    val fromModel = Pq.ivfPqKnnFromModel(emb, "vec_id", "embedding", cent,
      cb, codes, probeFilter = col("vec_id") < 3, k = 3, nprobe = 2, m = m)
    assert(sortedRows(fromModel) == sortedRows(endToEnd))
  }

  test("s09 gate query: shape, k rows per probe, deterministic") {
    // each invocation fits into its own fresh model dir, so the two runs
    // are fully independent (no shared-path overwrite)
    val r1 = SparkEntry.queries("s09_incr_encode")(spark, TestSpark.sf)
    assert(r1.columns.toSeq == Seq("probe_id", "neighbor_id", "rank"))
    val rows = r1.collect()
    val r2 = SparkEntry.queries("s09_incr_encode")(spark, TestSpark.sf)
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until 5L).toSet)
    for ((p, rs) <- byProbe) {
      assert(rs.length == 3, s"probe $p row count")
      assert(rs.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3))
      assert(!rs.map(_.getLong(1)).contains(p), "no self neighbor")
    }
    assert(sortedRows(r2) == rows.map(_.toString).sorted.toSeq)
  }

  test("st05 gate: streaming admission covers the corpus and equals the " +
      "batch twin") {
    val got = SparkEntry.queries("st05_index_ingest")(spark, TestSpark.sf)
    assert(got.columns.toSeq == Seq("id", "cluster", "codes"))
    val streamed = got.collect().map(_.toString).sorted.toSeq
    // batch twin: same recipe (fit on even ids, admit the full table) —
    // the fits are deterministic, so a fresh fit reproduces the gate's
    // models exactly
    val emb = spark.read.parquet(TestSpark.sf + "/embeddings.parquet")
    val m = 16
    val fitBatch = emb.filter(col("vec_id") % 2 === 0)
    val cent = Ivf.fitCentroids(
      fitBatch.select(col("vec_id").as("id"), col("embedding").as("v")),
      c = 16, iters = 3)
    val cb = Pq.fitCodebooks(fitBatch, "vec_id", "embedding", m, ksub = 32)
    val batch = Pq.admitStateless(emb, "vec_id", "embedding", cent, cb, m)
      // the gate serializes codes to a driver-sortable csv string
      .withColumn("codes", concat_ws(",", col("codes")))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.length == emb.count(),
      "every corpus row must be admitted exactly once")
  }
}
