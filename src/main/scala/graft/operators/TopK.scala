package graft.operators

import graft.plans.GroupedTopKNode
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}

/** Grouped top-k ("k best rows per group") through the custom
  * [[graft.plans.GroupedTopKNode]] operator stack — see that file's
  * scaladoc for the plan shape. Columns are named, the order is
  * `(column, ascending?)` pairs (first pair most significant), and the
  * result is the ≤ k first rows of each group under that order, with the
  * child's exact schema.
  *
  * Attributes are resolved here against the frame's analyzed output (a
  * Spark-4 `Column` stays a lazy unresolved node inside a foreign
  * logical operator, so the node is built fully resolved instead).
  *
  * Contract for exact results: the ordering must be total (tie-break on
  * a unique column) — same requirement a `row_number` window has for
  * determinism, enforced here only by convention.
  *
  * Requires a session built with [[graft.session.GraftExtensions]] (the
  * planner strategy is injected there); on a plain session the node
  * would not plan.
  */
object TopK {

  def groupedTopK(df: DataFrame, groupCols: Seq[String],
                  order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupedTopK needs at least one group column")
    require(order.nonEmpty, "groupedTopK needs at least one order column")
    val child = GraftBridge.analyzed(df)
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrder = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(df.sparkSession,
      GroupedTopKNode(groupCols.map(attr), sortOrder, k, child))
  }
}
