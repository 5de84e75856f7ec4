package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.functions.Bloom

/** The bloom prefilter's safety contract: no false negatives (so a
  * bloom-screened plan is row-identical to the exact plan), plus the
  * selectivity sanity that makes it worth having. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every inserted key might-contains") {
    val keys = (0L until 5000L).map(i => s"key-$i").toDF("k")
    val sketch = Bloom.buildBloom(keys, col("k"),
      expectedItems = 5000, numBits = 1 << 16)
    val misses = keys.filter(!Bloom.mightContain(sketch, col("k"))).count()
    assert(misses == 0, s"$misses inserted keys reported absent")
  }

  test("absent keys are mostly screened out (sketch actually filters)") {
    val keys = (0L until 5000L).map(i => s"key-$i").toDF("k")
    val sketch = Bloom.buildBloom(keys, col("k"),
      expectedItems = 5000, numBits = 1 << 16)
    val others = (0L until 5000L).map(i => s"other-$i").toDF("k")
    val falsePos = others.filter(Bloom.mightContain(sketch, col("k"))).count()
    // 2^16 bits for 5k items ≈ 13 bits/item → fpr well under 1%; allow 5%
    assert(falsePos < 250, s"$falsePos/5000 false positives")
  }

  test("empty build side yields a contains-nothing predicate") {
    val empty = Seq.empty[String].toDF("k")
    val sketch = Bloom.buildBloom(empty, col("k"), 100, 1 << 10)
    assert(sketch.isEmpty)
    val probe = Seq("a", "b").toDF("k")
    assert(probe.filter(Bloom.mightContain(sketch, col("k"))).count() == 0)
  }

  test("bloomContamination is row-identical to contamination (real corpus)") {
    val d = graft.sources.Tables(spark, TestSpark.sf, "documents")
    val train = d.filter(col("doc_id") % 10 =!= 0)
    val ev = d.filter(col("doc_id") % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    val exact = rows(Dedup.contamination(train, ev, "doc_id", "text",
      n = 3, tau = 0.5))
    val bloomed = rows(Dedup.bloomContamination(train, ev, "doc_id", "text",
      n = 3, tau = 0.5))
    assert(bloomed == exact)
    // and under the 8-byte hashed-gram scale path too
    val bloomedHashed = rows(Dedup.bloomContamination(train, ev, "doc_id",
      "text", n = 3, tau = 0.5, hashGrams = true))
    assert(bloomedHashed == exact)
  }
}
