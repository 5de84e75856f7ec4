package graft.util

import org.apache.spark.sql.DataFrame

/** Debug instrument for the iterative operators (VERDICT r19 item 8):
  * the CC / PageRank / HITS loops materialize each round behind a
  * localCheckpoint, so a gate-level `explain` can never show the
  * per-round plan the optimization claims are about. When
  * `GRAFT_ROUND_PLAN_DIR` is set, each loop dumps the round frame's
  * formatted physical plan (BEFORE the checkpoint truncates it) to
  * `<dir>/<name>.txt`; unset, the hook is a no-op with zero planning
  * cost (the env guard short-circuits before any queryExecution use).
  */
object RoundPlan {
  def dump(df: DataFrame, name: String): Unit =
    sys.env.get("GRAFT_ROUND_PLAN_DIR").foreach { dir =>
      val p = java.nio.file.Paths.get(dir, s"$name.txt")
      if (p.getParent != null)
        java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
}
