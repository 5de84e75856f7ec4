package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Catalog

/** The kcidb ORM pattern query language, planned as Spark semi-joins.
  *
  * Grammar (faithful to /root/reference/kcidb/orm/query.py:626-720
  * STRING_DOC ABNF):
  *
  *   pattern  = relation type [spec] [match]
  *   relation = ">" (children) | "<" (parents)
  *   type     = name | "*"   ("*" traverses recursively; it REFERENCES only
  *                            the furthest reached types, plus bases with no
  *                            relations in the traversal direction)
  *   spec     = "%"          (placeholder: consumes one ID list from the
  *                            separately-supplied list of ID lists)
  *            | "[" id_list "]"  (inline; id fields may be quoted with
  *                                double quotes, backslash-escaping \" and \\)
  *   match    = "#" (match objects of all types TRAVERSED by this spec)
  *            | "$" (match objects of the types REFERENCED by this spec)
  *
  * For a named type, traversed == referenced, so `#` and `$` agree. For
  * `*`, `#` matches everything expanded into, while `$` matches only the
  * dead ends — types with no further relations in the traversal direction
  * (`>test[...]<*$` = the ultimate parents). The next step's frontier is
  * always the REFERENCED set (reference: orm/query.py:459-481 `_expand`).
  *
  * Each hop is one frontier semi-join: no driver iteration over rows, so a
  * pattern over 100 TB is a fixed number of key-bounded shuffles. Only
  * caller-supplied ID lists are bounded; frontiers carry no broadcast hint
  * (AQE decides from runtime size).
  */
object PatternQuery {

  sealed trait Spec
  /** No ID restriction. */
  case object NoSpec extends Spec
  /** `%`: take the next caller-supplied ID list. */
  case object Placeholder extends Spec
  /** Inline `[a,b;c,d]` list; each inner Seq is one composite ID. */
  final case class IdList(ids: Seq[Seq[String]]) extends Spec

  final case class Step(child: Boolean, typeName: String,
                        spec: Spec, matchChar: Option[Char])

  // ------------------------------------------------------------- parser --

  private val unquotedIdChar: Char => Boolean = c =>
    c.isLetterOrDigit && c < 128 || "_:/.?%+-".contains(c)

  /** Hand-rolled scanner: regexes cannot honor quoted `]`/`;` inside ID
    * fields. Mirrors the reference ABNF including backslash escapes. */
  def parse(pattern: String): Seq[Step] = {
    var i = 0
    val n = pattern.length
    // ASCII whitespace ONLY (%x09-0d / %x20) — the reference compiles
    // its grammar with re.ASCII, so U+2028-class Unicode whitespace is
    // INVALID there and must be invalid here (r15 fuzz-parity finding)
    def ws(): Unit = while (i < n && (pattern(i) == ' ' ||
      (pattern(i) >= '\t' && pattern(i) <= '\r'))) i += 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$msg at position $i in pattern: $pattern")

    def idField(): String = {
      if (i < n && pattern(i) == '"') {
        i += 1
        val sb = new StringBuilder
        while (i < n && pattern(i) != '"') {
          if (pattern(i) == '\\') {
            i += 1
            if (i >= n || (pattern(i) != '"' && pattern(i) != '\\'))
              fail("invalid escape in quoted ID field")
          } else if (pattern(i) < ' ' || pattern(i) > '~')
            // quoted fields admit PRINTABLE ASCII only (ABNF %x20-21 /
            // %x23-5b / %x5d-7e) — control chars and non-ASCII are
            // invalid in the reference's re.ASCII grammar
            fail("non-printable-ASCII character in quoted ID field")
          sb += pattern(i); i += 1
        }
        if (i >= n) fail("unterminated quoted ID field")
        i += 1
        sb.result()
      } else {
        val start = i
        while (i < n && unquotedIdChar(pattern(i))) i += 1
        if (i == start) fail("empty ID field")
        pattern.substring(start, i)
      }
    }

    def idList(): Seq[Seq[String]] = {
      val ids = Seq.newBuilder[Seq[String]]
      var more = true
      while (more) {
        val fields = Seq.newBuilder[String]
        fields += idField()
        ws()
        while (i < n && pattern(i) == ',') { i += 1; ws(); fields += idField(); ws() }
        ids += fields.result()
        if (i < n && pattern(i) == ';') { i += 1; ws() } else more = false
      }
      ids.result()
    }

    val steps = Seq.newBuilder[Step]
    ws()
    if (i >= n) fail("empty pattern")
    while (i < n) {
      val child = pattern(i) match {
        case '>' => true
        case '<' => false
        case _ => fail("expected '>' or '<'")
      }
      i += 1; ws()
      val typeName =
        if (i < n && pattern(i) == '*') { i += 1; "*" }
        else {
          val start = i
          // [a-z0-9_] ASCII-only: Char.isDigit would admit Unicode
          // digits (U+0663-class) the re.ASCII reference rejects
          while (i < n && (pattern(i) >= 'a' && pattern(i) <= 'z' ||
            pattern(i) >= '0' && pattern(i) <= '9' ||
            pattern(i) == '_')) i += 1
          if (i == start) fail("expected type name or '*'")
          pattern.substring(start, i)
        }
      ws()
      val spec: Spec =
        if (i < n && pattern(i) == '%') { i += 1; Placeholder }
        else if (i < n && pattern(i) == '[') {
          i += 1; ws()
          val ids = if (i < n && pattern(i) == ']') Seq.empty else idList()
          ws()
          if (i >= n || pattern(i) != ']') fail("expected ']'")
          i += 1
          IdList(ids)
        } else NoSpec
      ws()
      val matchChar =
        if (i < n && (pattern(i) == '#' || pattern(i) == '$')) {
          val c = pattern(i); i += 1; Some(c)
        } else None
      ws()
      steps += Step(child, typeName, spec, matchChar)
    }
    steps.result()
  }

  // ----------------------------------------------------------- planner --

  /** Execute a pattern against the catalog; returns matched rows per type
    * (every row sharing a matched id tuple, with its multiplicity — the
    * reference's final `FROM t INNER JOIN (…ids…) USING (id fields)`).
    *
    * Scale shape (mirrors [[graft.model.Catalog]]): the traversal runs in
    * ID SPACE — frontiers and match accumulators are narrow id-tuple
    * frames, each hop scans only (idCols ∪ refCols) of the relation's
    * child table (column pruning reaches the parquet scan), and ONE
    * width-restoring semi-join per matched type runs at the end. Full
    * rows never cross a shuffle.
    *
    * @param idLists out-of-band ID lists consumed, in order, by `%` specs
    *                (reference: `obj_str_id_set_list` in orm/query.py parse).
    */
  def run(spark: SparkSession, dir: String, catalog: Catalog,
          pattern: String,
          idLists: Seq[Seq[Seq[String]]] = Seq.empty): Map[String, DataFrame] =
    materializeAll(spark, dir, catalog,
      runIds(spark, dir, catalog, pattern, idLists))

  /** Matched id tuples per type → full rows, in the table's declared
    * column order. */
  private def materializeAll(spark: SparkSession, dir: String,
                             catalog: Catalog, ids: Map[String, DataFrame])
      : Map[String, DataFrame] =
    ids.map { case (tn, idDf) =>
      val tbl = catalog.load(spark, dir, tn)
      tn -> tbl.join(idDf, catalog.types(tn).idCols, "left_semi")
        .select(tbl.columns.map(col).toSeq: _*)
    }

  /** The id-space planner behind [[run]]/[[runAll]]: returns DISTINCT
    * matched id tuples per type. */
  private def runIds(spark: SparkSession, dir: String, catalog: Catalog,
                     pattern: String,
                     idLists: Seq[Seq[Seq[String]]]): Map[String, DataFrame] = {
    var frontier: Map[String, DataFrame] = Map.empty // referenced ids/type
    var results: Map[String, DataFrame] = Map.empty
    var remainingIdLists = idLists

    def resolveIds(spec: Spec): Option[Seq[Seq[String]]] = spec match {
      case NoSpec => None
      case IdList(ids) => Some(ids)
      case Placeholder =>
        require(remainingIdLists.nonEmpty,
          s"not enough ID lists supplied for '%' placeholders in: $pattern")
        val head = remainingIdLists.head
        remainingIdLists = remainingIdLists.tail
        Some(head)
    }

    def idFilter(tn: String, df: DataFrame,
                 ids: Option[Seq[Seq[String]]]): DataFrame = ids match {
      case None => df
      case Some(idList) =>
        val t = catalog.types(tn)
        val cond = idList.map { idVals =>
          t.idCols.zip(idVals).map { case (c, v) =>
            col(c).cast("string") === lit(v)
          }.reduce(_ && _)
        }.reduceOption(_ || _).getOrElse(lit(false))
        df.filter(cond)
    }

    /** DISTINCT id tuples of a whole table. */
    def allIds(tn: String): DataFrame = {
      val t = catalog.types(tn)
      catalog.load(spark, dir, tn).select(t.idCols.map(col): _*).distinct()
    }

    def relsOf(tn: String, child: Boolean) =
      if (child) catalog.childrenOf(tn) else catalog.parentsOf(tn)

    /** One hop from a type's id frontier, in either direction. Both
      * directions derive through the RELATION'S CHILD table (it holds the
      * (child id, parent ref) mapping), scanning only the needed columns.
      * No broadcast hint: the frontier is derived and unbounded; AQE picks
      * the strategy from its runtime size. */
    def hop(fromType: String, fromIds: DataFrame, child: Boolean)
        : Seq[(String, DataFrame)] =
      relsOf(fromType, child).map { rel =>
        val cType = catalog.types(rel.child)
        val narrow = catalog.load(spark, dir, rel.child)
          .select((cType.idCols ++ rel.refCols).distinct.map(col): _*)
        if (child) {
          val pType = catalog.types(rel.parent)
          val renamed = fromIds.select(pType.idCols.zip(rel.refCols).map {
            case (ic, rc) => col(ic).as(s"__ref_$rc")
          }: _*).distinct()
          val cond = rel.refCols
            .map(rc => narrow(rc) === renamed(s"__ref_$rc"))
            .reduce(_ && _)
          rel.child -> narrow.join(renamed, cond, "left_semi")
            .select(cType.idCols.map(col): _*).distinct()
        } else {
          val pType = catalog.types(rel.parent)
          rel.parent -> narrow.join(fromIds, cType.idCols, "left_semi")
            .select(rel.refCols.zip(pType.idCols).map {
              case (rc, ic) => col(rc).as(ic)
            }: _*).distinct()
        }
      }

    def merged(acc: Map[String, DataFrame], tn: String, df: DataFrame) =
      acc.updated(tn, acc.get(tn).map(_.union(df).distinct()).getOrElse(df))

    for (step <- parse(pattern)) {
      val ids = resolveIds(step.spec)
      // rows expanded into by this step, per type (match target of '#')
      var traversed: Map[String, DataFrame] = Map.empty
      // rows of dead-end types (match target of '$', and the next frontier)
      var referenced: Map[String, DataFrame] = Map.empty

      if (step.typeName == "*") {
        // Recursive traversal. Referenced = types with no relations in the
        // traversal direction (including frontier types that cannot expand
        // at all — reference orm/query.py:466-472 `unused_set`).
        val base: Map[String, DataFrame] =
          if (frontier.nonEmpty) frontier
          else {
            require(step.child, "first pattern step must use '>'")
            // Root '*': every catalog type's id set, id-filtered
            catalog.types.keys.map { tn =>
              tn -> idFilter(tn, allIds(tn), ids)
            }.toMap
          }
        if (frontier.isEmpty)
          for ((tn, df) <- base) traversed = merged(traversed, tn, df)
        for ((tn, df) <- base if relsOf(tn, step.child).isEmpty)
          referenced = merged(referenced, tn, df)
        var cur = base
        while (cur.nonEmpty) {
          var next: Map[String, DataFrame] = Map.empty
          for ((tn, rows) <- cur; (ntn, ndf) <- hop(tn, rows, step.child)) {
            val filtered = idFilter(ntn, ndf, ids)
            next = merged(next, ntn, filtered)
            traversed = merged(traversed, ntn, filtered)
          }
          for ((tn, df) <- next if relsOf(tn, step.child).isEmpty)
            referenced = merged(referenced, tn, df)
          cur = next
        }
      } else if (frontier.isEmpty) {
        // Based on root: a named type's id set.
        require(step.child, "first pattern step must use '>'")
        require(catalog.types.contains(step.typeName),
          s"unknown type ${step.typeName}")
        val df = idFilter(step.typeName, allIds(step.typeName), ids)
        traversed = Map(step.typeName -> df)
        referenced = traversed
      } else {
        for ((tn, rows) <- frontier;
             (ntn, ndf) <- hop(tn, rows, step.child)
             if ntn == step.typeName)
          traversed = merged(traversed, ntn, idFilter(ntn, ndf, ids))
        require(traversed.nonEmpty,
          s"no relation to type ${step.typeName} from frontier")
        referenced = traversed
      }

      frontier = referenced
      val toMatch = step.matchChar match {
        case Some('#') => traversed
        case Some('$') => referenced
        case _ => Map.empty[String, DataFrame]
      }
      for ((tn, df) <- toMatch) results = merged(results, tn, df)
    }
    results
  }

  /** Multi-pattern union — `kcidb-query` accepts repeated pattern strings
    * whose matches accumulate into one set
    * (/root/reference/kcidb/orm/__init__.py:841-851 `pattern_set |=
    * Pattern.parse(...)`; CLI wiring kcidb/__init__.py:370-387). Each
    * pattern runs independently; per-type matches union with distinct.
    *
    * `%` placeholders consume `idLists` in PATTERN order (pattern 1's
    * placeholders first, then pattern 2's, …) — the concatenation of the
    * per-parse `obj_str_id_set_list`s of the reference. */
  def runAll(spark: SparkSession, dir: String, catalog: Catalog,
             patterns: Seq[String],
             idLists: Seq[Seq[Seq[String]]] = Seq.empty)
      : Map[String, DataFrame] = {
    var remaining = idLists
    var acc: Map[String, DataFrame] = Map.empty
    for (p <- patterns) {
      val need = parse(p).count(_.spec == Placeholder)
      require(remaining.size >= need,
        s"not enough ID lists for '%' placeholders in: $p")
      val (mine, rest) = remaining.splitAt(need)
      remaining = rest
      // cross-pattern union in ID space; width restored once at the end
      for ((tn, df) <- runIds(spark, dir, catalog, p, mine))
        acc = acc.updated(tn,
          acc.get(tn).map(_.union(df).distinct()).getOrElse(df))
    }
    materializeAll(spark, dir, catalog, acc)
  }
}
