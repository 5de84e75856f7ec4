package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third-decade (1000×) octave probe for the bounded-state sketch /
  * profile family (VERDICT r17 item 6) — k01/k02/k07/k08/k09-shaped
  * sketches plus e04's incremental-AUC state fold and e08's Poisson
  * bootstrap, driven from a GENERATED source (`spark.range` + md5
  * column synthesis, no parquet anywhere) so the reading is bounded by
  * compute, not by the box's disk — the r17 1000× parquet attempt died
  * in shuffle scratch on a disk-heavy operator; these operators carry
  * corpus-size-independent STATE, so the generated source lets the
  * claim meet a true three-decade corpus.
  *
  * args: rows [rows2 ...] — one timed session per invocation is the
  * protocol (quiet box); pass one size per run and diff across runs.
  *
  * Synthesized shape mirrors the events table: 7 event types, a user
  * domain growing as n/20 (so the HLL actually meets new cardinality
  * each decade), a 3-significant-digit value grid, 30 days of
  * timestamps. All columns are md5-derived from the row id —
  * deterministic, partition-independent, codegen'd.
  */
object SketchScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SketchScaleProbe rows [rows...]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Eval, Sketches}

    def synth(n: Long): DataFrame = {
      val userDomain = math.max(100L, n / 20L)
      def draw(tag: String) =
        conv(substring(md5(concat(lit(tag), col("id"))), 1, 15), 16, 10)
          .cast("long")
      spark.range(n).select(
        concat(lit("t"), pmod(col("id"), lit(7L))).as("event_type"),
        pmod(draw("u"), lit(userDomain)).as("user_id"),
        (pmod(draw("v"), lit(100000L)).cast("double") / 100.0).as("value"),
        timestamp_seconds(lit(1735689600L) + pmod(col("id"),
          lit(30L * 86400L))).as("ts"),
        col("id"))
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (n <- args.map(_.toLong)) {
      val ev = synth(n)
      // untimed warmup at a sliver of n: JIT/codegen land here
      noop(Sketches.distinctProfile(synth(math.max(1000L, n / 1000L)),
        col("event_type"), col("user_id"), rsd = 0.02))
      // k01/k08 shape: HLL NDV profile (includes the exact anchor
      // countDistinct exactly as the gates do)
      val tHll = timed(noop(Sketches.distinctProfile(ev,
        col("event_type"), col("user_id"), rsd = 0.02)))
      // k02/k07 shape: GK quantile profile
      val tGk = timed(noop(Sketches.quantileProfile(ev,
        col("event_type"), col("value"), accuracy = 10000)))
      // k09 shape: per-day HLL partials union-merged + direct pass
      val tMerge = timed(noop(Sketches.mergeProfile(ev,
        col("event_type"), date_format(col("ts"), "yyyy-MM-dd"),
        col("user_id"), lgK = 12)))
      // e04 shape: AUC state fold — base state on 3/4 of the corpus,
      // delta fold of the rest, statistic from the merged state
      val tAuc = timed(noop(Eval.aucFromState(Eval.aucMergeStates(
        Eval.aucState(ev.filter(col("id") % 4 =!= 3),
          pmod(col("user_id"), lit(500L)), col("event_type") === "t0"),
        Eval.aucState(ev.filter(col("id") % 4 === 3),
          pmod(col("user_id"), lit(500L)), col("event_type") === "t0")))))
      // e08 shape: 64-replicate Poisson bootstrap of the mean
      val tBoot = timed(noop(Eval.poissonBootstrap(ev, col("id"),
        pmod(col("user_id"), lit(1000L)), replicates = 64,
        seed = "graft-boot", loRank = 2, hiRank = 63)))
      println(f"""{"rows":$n,"hll_sec":$tHll%.2f,"gk_sec":$tGk%.2f,""" +
        f""""merge_sec":$tMerge%.2f,"auc_sec":$tAuc%.2f,""" +
        f""""boot_sec":$tBoot%.2f}""")
    }
    spark.stop()
  }
}
