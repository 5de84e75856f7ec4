package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, DotProduct}

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works anywhere
  * the library is on the classpath:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn2(name: String, clazz: String,
                  build: (Expression, Expression) => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name takes exactly 2 arguments")
        build(children(0), children(1))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn2("cosine_sim",
      classOf[CosineSim].getName, CosineSim.apply))
    ext.injectFunction(fn2("dot_product",
      classOf[DotProduct].getName, DotProduct.apply))
  }
}
