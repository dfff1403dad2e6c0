package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward temporal) join: for every left row, the most recent
  * right row with the same key and time ≤ the left row's time.
  *
  * Spark has no ASOF JOIN operator; the naive range-join formulation
  * (`l.key = r.key AND r.t <= l.t`, then keep max r.t) is a
  * theta-join that degenerates to per-key cross products. This
  * implementation is the union + carry-forward pattern: tag both sides,
  * union them, and carry the last non-null right-side value per key
  * ordered by (time, side) — right rows sort before left rows at equal
  * times, so equality means "match". One shuffle on the key, O(n log n)
  * per key for the sort, no row amplification — survives arbitrary key
  * skew in the right side.
  *
  * The carry runs through the custom single-pass
  * [[graft.plans.CarryForwardNode]] operator when the session can plan
  * it (same exchange + sort, NO WindowExec group buffering — O(1)
  * state instead of each key's rows in an
  * ExternalAppendOnlyUnsafeRowArray; the win is marathon keys).
  * `spark.graft.asof.native` defaults to `auto`: the native node is
  * used iff [[graft.plans.CarryForwardStrategy]] is actually injected
  * into this session's planner (GraftExtensions installed), otherwise
  * the equivalent `last(_, ignoreNulls)` window spelling plans on any
  * plain session. `false` forces the window path; `true` forces the
  * native node and FAILS AT PLANNING on a session without
  * GraftExtensions (explicit opt-in only). Both paths are
  * contract-pinned identical in `AsOfSpec`.
  */
object AsOf {

  /** Route the carry through [[graft.plans.CarryForwardNode]] (native)
    * or the window spelling, per conf.
    */
  private def carried(unioned: DataFrame, keys: Seq[String],
                      timeAsc: Boolean): DataFrame = {
    val spark = unioned.sparkSession
    val native =
      spark.conf.get("spark.graft.asof.native", "auto") match {
        case "auto" => org.apache.spark.sql.GraftBridge
          .hasStrategy(spark, graft.plans.CarryForwardStrategy)
        case v => v.toBoolean
      }
    if (native) {
      val child = GraftBridge.analyzed(unioned)
      def attr(n: String): Attribute =
        child.output.find(_.name == n).getOrElse(
          throw new IllegalArgumentException(s"column $n missing"))
      val dir = if (timeAsc) Ascending else Descending
      GraftBridge.ofRows(spark, graft.plans.CarryForwardNode(
        keys.map(attr),
        Seq(SortOrder(attr("_t"), dir), SortOrder(attr("_side"), dir)),
        attr("_carry"), child))
    } else {
      val w = Window.partitionBy(keys.map(col): _*)
      val frame =
        if (timeAsc)
          w.orderBy(col("_t"), col("_side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        else
          w.orderBy(col("_t").asc, col("_side").asc)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val f =
        if (timeAsc) last(col("_carry"), ignoreNulls = true).over(frame)
        else first(col("_carry"), ignoreNulls = true).over(frame)
      unioned.withColumn("_carry", f)
    }
  }

  /** @param left      probe side
    * @param right     reference side (its columns get carried forward)
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param carry     right-side value columns to attach to left rows;
    *                  null when no right row precedes the left row
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "as-of join needs at least one carried column")
    val leftCols = left.columns.toSeq
    require(!carry.exists(leftCols.contains),
      s"carried columns ${carry.filter(leftCols.contains)} collide with left side")

    // the carried columns travel as ONE struct: last(_, ignoreNulls) must
    // skip left rows (null struct) but NOT a matched right row whose value
    // happens to be null — per-column carry would skip those too and could
    // even mix fields from different right rows
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_carry", lit(null).cast(
        org.apache.spark.sql.types.StructType(carry.map(c => right.schema(c)))))
      .select((leftCols.map(col) ++ Seq(col("_t"), col("_side"), col("_carry"))): _*)
    val r = right
      // a null-time reference row would sort before everything (nulls
      // first) and be carried into every early left row; ASOF comparison
      // with a null time matches nothing, so drop such rows up front
      .where(col(rightTime).isNotNull)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_carry", struct(carry.map(col): _*))
      .select((leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_t"), col("_side"), col("_carry"))): _*)

    // SQL/DuckDB ASOF semantics: a null key matches nothing — but
    // Window.partitionBy groups null keys together, so a null-keyed left
    // row would pick up a null-keyed right row's value. Route null-keyed
    // left rows around the window (their carry stays null) and drop
    // null-keyed right rows outright.
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val carriedDf = carried(
      l.where(keyNotNull).unionByName(r.where(keyNotNull)), keys,
      timeAsc = true)
    val merged = carriedDf.where(col("_side") === 1)
      .unionByName(l.where(!keyNotNull))
    carry.foldLeft(merged) { (df, c) =>
        df.withColumn(c, col("_carry").getField(c))
      }
      .drop("_t", "_side", "_carry")
  }

  /** FORWARD as-of join: for every left row, the NEAREST right row with
    * the same key and time ≥ the left row's time — the
    * next-scheduled-maintenance / next-price-change lookup. Same
    * union-and-window shape as [[asOfJoin]], mirrored: left rows sort
    * BEFORE right rows at equal times (equality matches) and the
    * carry is `first(_, ignoreNulls)` over the FOLLOWING frame. One
    * shuffle on the key, no row amplification, same null-key/null-time
    * contracts.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "as-of join needs at least one carried column")
    val leftCols = left.columns.toSeq
    require(!carry.exists(leftCols.contains),
      s"carried columns ${carry.filter(leftCols.contains)} collide with left side")
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(0))
      .withColumn("_carry", lit(null).cast(
        org.apache.spark.sql.types.StructType(carry.map(c => right.schema(c)))))
      .select((leftCols.map(col) ++ Seq(col("_t"), col("_side"), col("_carry"))): _*)
    val r = right
      .where(col(rightTime).isNotNull)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(1))
      .withColumn("_carry", struct(carry.map(col): _*))
      .select((leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_t"), col("_side"), col("_carry"))): _*)
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    // a null LEFT time sorts first under asc ordering and the FOLLOWING
    // frame would hand it the partition's first match — route such rows
    // around the window (their carry stays null, as a null comparison
    // matches nothing). The backward variant needs no such guard: nulls
    // first + a PRECEDING frame yields null naturally.
    val eligible = keyNotNull && col("_t").isNotNull
    val carriedDf = carried(
      l.where(eligible).unionByName(r.where(keyNotNull)), keys,
      timeAsc = false)
    val merged = carriedDf.where(col("_side") === 0)
      .unionByName(l.where(!eligible))
    carry.foldLeft(merged) { (df, c) =>
        df.withColumn(c, col("_carry").getField(c))
      }
      .drop("_t", "_side", "_carry")
  }
}
