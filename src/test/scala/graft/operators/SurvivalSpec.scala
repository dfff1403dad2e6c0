package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {

  import spark.implicits._

  private val day = 86400L
  private def t(days: Long) = new Timestamp(days * day * 1000)

  /** user active from day 0 to day `last`; two rows bound the span. */
  private def user(id: Long, last: Long) =
    Seq((id * 10, t(0), id, "e", 0.0, ""), (id * 10 + 1, t(last), id, "e", 0.0, ""))

  test("hand-computed curve with censoring") {
    // horizon = day 30 (user 9 runs to 30). censorDays=3 → censored iff
    // last ≥ day 27. churned: u1 (day 2), u2 (day 2), u3 (day 10).
    // censored: u4 (day 28, lifetime 28), u9 (day 30).
    val rows = (user(1, 2) ++ user(2, 2) ++ user(3, 10) ++ user(4, 28) ++
      user(9, 30))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val km = Survival.kaplanMeier(rows, censorDays = 3)
      .orderBy("t_days").collect()
    // day 2: n_risk=5, d=2 → S = 1e6·3/5 = 600000
    // day 10: n_risk=3, d=1 → S = (600000·2) div 3 = 400000
    assert(km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq === Seq((2L, 5L, 2L, 600000L), (10L, 3L, 1L, 400000L)))
  }

  test("no churns (everyone censored) yields an empty curve") {
    val rows = (user(1, 29) ++ user(2, 30))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Survival.kaplanMeier(rows, censorDays = 3).count() === 0L)
  }

  test("survival is non-increasing and stays in (0, 1e6]") {
    val rows = (1L to 20L).flatMap(i => user(i, i + 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = Survival.kaplanMeier(rows, censorDays = 2)
      .orderBy("t_days").collect().map(_.getLong(3))
    assert(s.nonEmpty)
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    assert(s.forall(v => v >= 0 && v <= 1000000L))
  }
}
