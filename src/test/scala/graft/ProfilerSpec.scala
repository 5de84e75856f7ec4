package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiler

class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (1L, Some("a"), Some(2.5), Some(Timestamp.valueOf("2024-01-01 00:00:10"))),
    (2L, Some("b"), Some(-1.25), Some(Timestamp.valueOf("2024-01-02 00:00:00"))),
    (3L, None, None, None),
    (4L, Some("a"), Some(7.0), Some(Timestamp.valueOf("2024-01-01 00:00:10"))))
    .toDF("id", "s", "x", "t")

  test("exact profile: counts, distincts and typed extrema per column, " +
      "sentinels instead of NULLs") {
    val p = Profiler.profile(frame, exact = true)
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getString(6), r.getString(7)))
    assert(p.toSeq == Seq(
      ("id", 4L, 4L, 4L, 1.0, 4.0, "", ""),
      ("s", 4L, 3L, 2L, -1.0, -1.0, "a", "b"),
      ("t", 4L, 3L, 2L, 1704067210.0, 1704153600.0, "", ""),
      ("x", 4L, 3L, 3L, -1.25, 7.0, "", "")), p.toSeq)
  }

  test("an all-null column profiles with sentinel extrema, not NULLs " +
      "(the scalar-gate rule)") {
    val p = Profiler.profile(
        Seq((1L, Option.empty[String])).toDF("id", "s"), exact = true)
      .filter(col("column") === "s").collect()(0)
    assert(p.getLong(2) == 0 && p.getLong(3) == 0)
    assert(p.getDouble(4) == -1.0 && p.getString(6) == "")
    assert(!(0 until p.length).exists(p.isNullAt),
      "profile rows must be null-free")
  }

  test("approx mode agrees on the exact columns and plans WITHOUT " +
      "Expand — one partial aggregate at any scale") {
    val exact = Profiler.profile(frame, exact = true)
      .select("column", "n_rows", "n_nonnull", "num_min", "num_max",
        "str_min", "str_max").orderBy("column").collect().toSeq
    val approx = Profiler.profile(frame, exact = false)
    assert(approx.select("column", "n_rows", "n_nonnull", "num_min",
      "num_max", "str_min", "str_max").orderBy("column").collect().toSeq
      == exact)
    // tiny column sets: HLL at default rsd is exact
    assert(approx.orderBy("column").select("n_distinct").collect()
      .map(_.getLong(0)).toSeq == Seq(4L, 2L, 2L, 3L))
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"approx profile must not plan Expand:\n$plan")
    // exact mode must ALSO never plan Expand: the per-column-branch
    // union keeps every countDistinct single-distinct (the multi-
    // distinct one-aggregate form grounds on a near-row-unique Expand
    // grouping — the measured 4x regression the branch design avoids)
    val exactPlan = Profiler.profile(frame, exact = true)
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"),
      s"exact profile must not plan Expand:\n$exactPlan")
  }

  test("exact branches prune the scan to their one column") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    frame.write.mode("overwrite").parquet("/tmp/profiler_prune")
    val onDisk = spark.read.parquet("/tmp/profiler_prune")
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec hides its
    // children from collect until stages materialize
    val scans = Profiler.profile(onDisk, exact = true)
      .queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSeq
      }
    assert(scans.size == 4 && scans.forall(_.size <= 1),
      s"each exact branch must read exactly its own column: $scans")
  }
}
