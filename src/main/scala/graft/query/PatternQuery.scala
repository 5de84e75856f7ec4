package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Catalog

/** The kcidb ORM pattern query language, planned as Spark semi-joins.
  *
  * Grammar (subset faithful to
  * /root/reference/kcidb/orm/query.py:626-720 STRING_DOC):
  *
  *   pattern  = relation type [spec] [match]
  *   relation = ">" (children) | "<" (parents)
  *   type     = name | "*"   ("*" traverses recursively to the furthest types)
  *   spec     = "[" id (";" id)* "]"   (id = comma-separated id fields)
  *   match    = "#" (match all types traversed by this spec)
  *            | "$" (match only the types referenced, i.e. the last reached)
  *
  * e.g. ">customer[21;22]>orders>lineitem#" — lineitems of orders of
  * customers 21 and 22; ">lineitem[5,1]<*#" — all ancestors of lineitem
  * (5,1).
  *
  * Each step is one frontier semi-join (broadcast when small): no driver
  * iteration over rows, so a pattern over 100 TB is a fixed number of
  * key-bounded shuffles.
  */
object PatternQuery {

  final case class Step(child: Boolean, typeName: String,
                        ids: Option[Seq[Seq[String]]], matched: Boolean)

  private val stepRe =
    """\s*([<>])\s*([a-z0-9_]+|\*)\s*(\[[^\]]*\])?\s*([#$])?""".r

  def parse(pattern: String): Seq[Step] = {
    val steps = stepRe.findAllMatchIn(pattern).map { m =>
      val ids = Option(m.group(3)).map { s =>
        val inner = s.substring(1, s.length - 1).trim
        if (inner.isEmpty) Seq.empty[Seq[String]]
        else inner.split(";").toSeq.map(_.trim)
          .map(_.split(",").toSeq.map(_.trim))
      }
      Step(m.group(1) == ">", m.group(2), ids, m.group(4) != null)
    }.toSeq
    val consumed = stepRe.findAllMatchIn(pattern).map(_.matched.length).sum
    require(consumed == pattern.length,
      s"unparsable pattern suffix in: $pattern")
    steps
  }

  /** Execute a pattern against the catalog; returns matched rows per type. */
  def run(spark: SparkSession, dir: String, catalog: Catalog,
          pattern: String): Map[String, DataFrame] = {
    var frontier: Map[String, DataFrame] = Map.empty // type -> matched rows
    var results: Map[String, DataFrame] = Map.empty

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

    def hop(fromType: String, fromRows: DataFrame, child: Boolean)
        : Seq[(String, DataFrame)] = {
      val rels =
        if (child) catalog.childrenOf(fromType) else catalog.parentsOf(fromType)
      rels.map { rel =>
        if (child) {
          val pType = catalog.types(rel.parent)
          val pIds = fromRows.select(pType.idCols.map(col): _*).distinct()
          val childTbl = catalog.load(spark, dir, rel.child)
          val renamed = pIds.select(pType.idCols.zip(rel.refCols).map {
            case (ic, rc) => col(ic).as(s"__ref_$rc")
          }: _*)
          val cond = rel.refCols
            .map(rc => childTbl(rc) === renamed(s"__ref_$rc"))
            .reduce(_ && _)
          // No broadcast hint: the frontier is derived and unbounded; AQE
          // picks the strategy from its runtime size.
          rel.child -> childTbl.join(renamed, cond, "left_semi")
        } else {
          val pType = catalog.types(rel.parent)
          val refIds = fromRows.select(rel.refCols.zip(pType.idCols).map {
            case (rc, ic) => col(rc).as(ic)
          }: _*).distinct()
          val parentTbl = catalog.load(spark, dir, rel.parent)
          rel.parent ->
            parentTbl.join(refIds, pType.idCols, "left_semi")
        }
      }
    }

    for (step <- parse(pattern)) {
      val traversed = scala.collection.mutable.Map[String, DataFrame]()
      def add(tn: String, df: DataFrame): Unit =
        traversed(tn) =
          traversed.get(tn).map(_.union(df).distinct()).getOrElse(df)

      if (frontier.isEmpty) {
        // Based on root: named type loads the table; "*" loads all types.
        val names =
          if (step.typeName == "*") catalog.types.keys.toSeq
          else Seq(step.typeName)
        require(step.child, "first pattern step must use '>'")
        for (tn <- names) {
          require(catalog.types.contains(tn), s"unknown type $tn")
          add(tn, idFilter(tn, catalog.load(spark, dir, tn), step.ids))
        }
      } else if (step.typeName == "*") {
        // Recursive traversal to exhaustion from every frontier type.
        var cur = frontier
        while (cur.nonEmpty) {
          val next = scala.collection.mutable.Map[String, DataFrame]()
          for ((tn, rows) <- cur; (ntn, ndf) <- hop(tn, rows, step.child)) {
            val filtered = idFilter(ntn, ndf, step.ids)
            next(ntn) =
              next.get(ntn).map(_.union(filtered).distinct()).getOrElse(filtered)
            add(ntn, filtered)
          }
          cur = next.toMap
        }
      } else {
        for ((tn, rows) <- frontier; (ntn, ndf) <- hop(tn, rows, step.child)
             if ntn == step.typeName)
          add(ntn, idFilter(ntn, ndf, step.ids))
        require(traversed.nonEmpty,
          s"no relation to type ${step.typeName} from frontier")
      }

      frontier = traversed.toMap
      if (step.matched)
        for ((tn, df) <- frontier)
          results =
            results.updated(tn,
              results.get(tn).map(_.union(df).distinct()).getOrElse(df))
    }
    results
  }
}
