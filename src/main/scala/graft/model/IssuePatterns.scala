package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Issue pattern-object assembly + automatching — the reference's
  * issue-editor form flow (issue_editor/__init__.py:33-60
  * `build_pattern_object`, 64-69 required-field gate, 84-89 culprit
  * booleans) re-expressed relationally, closing the last reference
  * behavior with analytic content and no twin (VERDICT r16 item 4).
  *
  * The reference receives parallel form lists `category[]`/`field[]`/
  * `value[]`, zips them in order into `{category+"s": [{field:
  * value}]}` (one dict per category — a later duplicate field
  * OVERWRITES the earlier one, plain dict assignment), rejects the
  * submission if name/email/report_subject/culprit_type is missing,
  * and derives the culprit struct as three equality booleans. The
  * pattern object then automatches warehouse objects: an object
  * matches a category's dict iff EVERY (field, value) entry equals
  * the object's attribute (q24/q38's subscription-matching semantics
  * on the issue axis).
  *
  * Relational form: forms = (sub_id, name, email, report_subject,
  * culprit_type, report_url); triples = (sub_id, seq, category,
  * field, value) with seq the form zip order; objects = the melted
  * corpus attribute frame (category, obj_id, field, value). Output
  * is one frame, `kind`-discriminated (the q42 mixed-fixture shape):
  *
  *  - kind="issue", one row per submission: `valid` (the 400 gate),
  *    the three culprit 0/1 ints, `n_categories`, and the pattern
  *    object CANONICALIZED as the sorted "categorys.field=value"
  *    ';'-join — insertion-order JSON is not cross-engine stable, the
  *    sorted flat form is (the s07 code-string discipline). Sentinel
  *    -1/""/0 in the match-side columns (the st05 scalar-gate rule:
  *    no NULLs in sortable dumps).
  *  - kind="match", one row per (VALID submission, patterned
  *    category): `n_match` = how many corpus objects the category
  *    dict matches (0-match categories still emit — a dropped row
  *    would hide a dead pattern). Invalid submissions emit no match
  *    rows: the reference 400s before publishing.
  *
  * Scale shape: forms/triples are form-sized (broadcast); the only
  * corpus-sized stage is the melted-attribute equi-join, which is a
  * broadcast hash join against the tiny resolved-pattern frame
  * followed by one map-side-combined count — no shuffle of the
  * object frame beyond the final per-(sub, category, obj) count,
  * itself bounded by pattern selectivity. At 100 TB the melt stays a
  * projection of the scanned columns only. */
object IssuePatterns {

  /** Last-writer-wins field resolution per (submission, category) —
    * the dict-assignment semantics of the reference's zip loop. */
  private[graft] def resolve(triples: DataFrame): DataFrame =
    triples.groupBy("sub_id", "category", "field")
      .agg(max_by(col("value"), col("seq")).as("value"))

  private def validCol =
    (col("name") =!= "" && col("email") =!= "" &&
      col("report_subject") =!= "" && col("culprit_type") =!= "")

  def assembleAndMatch(forms: DataFrame, triples: DataFrame,
      objects: DataFrame): DataFrame = {
    val resolved = resolve(triples).localCheckpoint()
    val pat = resolved
      .select(col("sub_id"), concat(col("category"), lit("s."),
        col("field"), lit("="), col("value")).as("kv"),
        col("category"))
      .groupBy("sub_id")
      .agg(array_join(array_sort(collect_list(col("kv"))), ";")
          .as("pattern"),
        countDistinct(col("category")).as("n_categories"))
    val issues = forms.join(pat, Seq("sub_id"), "left")
      .select(lit("issue").as("kind"), col("sub_id"),
        lit("").as("category"),
        when(validCol, 1).otherwise(0).as("valid"),
        (col("culprit_type") === "code").cast("int").as("culprit_code"),
        (col("culprit_type") === "tool").cast("int").as("culprit_tool"),
        (col("culprit_type") === "harness").cast("int")
          .as("culprit_harness"),
        coalesce(col("n_categories"), lit(0L)).as("n_categories"),
        lit(-1L).as("n_match"),
        coalesce(col("pattern"), lit("")).as("pattern"))
    // automatch: only valid submissions' patterns reach the corpus
    val req = resolved
      .join(forms.where(validCol).select("sub_id"), "sub_id")
    val nReq = req.groupBy("sub_id", "category")
      .agg(count(lit(1)).as("n_req"))
    val hits = objects
      .join(broadcast(req), Seq("category", "field", "value"))
      .groupBy(col("sub_id"), col("category"), col("obj_id"))
      .agg(count(lit(1)).as("n_hit"))
    val matched = hits.join(broadcast(nReq), Seq("sub_id", "category"))
      .where(col("n_hit") === col("n_req"))
      .groupBy("sub_id", "category")
      .agg(count(lit(1)).as("n_match"))
    val matchRows = nReq.join(matched, Seq("sub_id", "category"), "left")
      .select(lit("match").as("kind"), col("sub_id"), col("category"),
        lit(1).as("valid"), lit(-1).as("culprit_code"),
        lit(-1).as("culprit_tool"), lit(-1).as("culprit_harness"),
        lit(-1L).as("n_categories"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        lit("").as("pattern"))
    issues.unionByName(matchRows)
  }
}
