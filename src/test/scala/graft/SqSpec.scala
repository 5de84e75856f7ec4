package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Sq

/** SQ8 scalar quantization: exact codes on a hand-computable frame, the
  * reconstruction-error envelope the linear quantizer guarantees, and the
  * degenerate-dimension / clamp contracts. */
class SqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def codesOf(rows: Seq[(Long, Array[Float])])
      : Map[Long, Seq[Int]] = {
    val df = rows.toDF("vec_id", "embedding")
    Sq.encode(df, "vec_id", "embedding", Sq.fitMinMax(df, "embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
      .toMap
  }

  test("codes are exact on a hand-computable frame") {
    // dim 1 spans [0, 2]: v=1 -> floor(1*255/2 + .5) = floor(128) = 128
    // dim 2 spans [-1, 1]: v=0 -> floor(1*255/2 + .5) = 128
    val out = codesOf(Seq(
      1L -> Array(0f, -1f),
      2L -> Array(2f, 1f),
      3L -> Array(1f, 0f)))
    assert(out(1L) == Seq(0, 0))
    assert(out(2L) == Seq(255, 255))
    assert(out(3L) == Seq(128, 128))
  }

  test("constant dimension codes to 0; in-range values never clamp") {
    val out = codesOf(Seq(
      1L -> Array(7f, 0.25f),
      2L -> Array(7f, 0.75f)))
    assert(out(1L)(0) == 0 && out(2L)(0) == 0)
    assert(out.values.flatten.forall(c => c >= 0 && c <= 255))
  }

  test("reconstruction error is within half a quantization step per dim") {
    // decode code c as lo + c*(hi-lo)/255; |v - decode| <= (hi-lo)/510 + eps
    val rng = new scala.util.Random(7)
    val rows = (1L to 50L).map(i =>
      i -> Array.fill(16)(rng.nextFloat() * 4f - 2f))
    val byDim = rows.flatMap(_._2.zipWithIndex)
      .groupBy(_._2).map { case (d, vs) =>
        d -> (vs.map(_._1.toDouble).min, vs.map(_._1.toDouble).max) }
    val out = codesOf(rows)
    for ((id, vec) <- rows; (v, d) <- vec.zipWithIndex) {
      val (lo, hi) = byDim(d)
      val dec = lo + out(id)(d) * (hi - lo) / 255.0
      assert(math.abs(v - dec) <= (hi - lo) / 510.0 + 1e-9,
        s"vec $id dim $d: v=$v dec=$dec")
    }
  }

  test("sq8Recall: well-separated directions survive quantization at " +
      "recall 1.0; output is bounded and covers every probe") {
    import org.apache.spark.sql.functions.col
    // 4 clusters along distinct axes over a zero background: every
    // active dim spans the same [0, 6] corpus range, so per-dim
    // normalization preserves the cluster structure exactly (a fixture
    // with uneven per-dim ranges would be legitimately re-weighted by
    // SQ8 — that is the operator working, not failing); dims 4-7 stay
    // constant and exercise the hi = lo → 0 rule
    val rows = for (c <- 0 until 4; j <- 0 until 3) yield {
      val v = Array.fill(8)(0f)
      v(c) = 4f + j
      ((c * 3 + j).toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Sq.sq8Recall(df, "vec_id", "embedding",
        probeFilter = col("vec_id") < 4, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L),
      "one row per probe")
    for ((p, hits, rec) <- out) {
      assert(hits >= 0 && hits <= 2)
      assert(rec == hits / 2.0)
      assert(rec == 1.0, s"probe $p lost a neighbor to quantization")
    }
  }

  test("gate summary pins the full code sequence via md5") {
    val df = Seq(1L -> Array(0f, -1f), 2L -> Array(2f, 1f))
      .toDF("vec_id", "embedding")
    val sum = Sq.sq8Summary(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4),
          r.getString(5))).toMap
    val md5 = (s: String) => java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(sum(1L) == ((2L, 0L, 0, 0, md5("0,0"))))
    assert(sum(2L) == ((2L, 510L, 255, 255, md5("255,255"))))
  }
}
