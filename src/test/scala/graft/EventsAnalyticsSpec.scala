package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ordering semantics of the q74 funnel and q75 retention formulations on
  * hand-built event sequences (the oracle checks values at scale; these
  * pin the EDGE semantics — out-of-order stages must not count). */
class EventsAnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("funnel stages only count events strictly after the previous anchor") {
    val s = spark; import s.implicits._
    // user 1: view(10) -> click(20) -> purchase(30): full funnel
    // user 2: click(5) BEFORE view(10), purchase(20) after: the early
    //         click must not count; no later click => funnel stops at view
    // user 3: purchase(5) only: no view => counts nowhere
    val e = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
      (3L, "purchase", 5L)).toDF("user_id", "event_type", "us")
    val v = e.filter($"event_type" === "view").groupBy($"user_id").agg(min($"us").as("t1"))
    val c = e.join(v, "user_id").filter($"event_type" === "click" && $"us" > $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"))
    val p = e.join(c, "user_id").filter($"event_type" === "purchase" && $"us" > $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"))
    assert(v.count() === 2) // users 1 and 2 viewed
    assert(c.collect().map(_.getLong(0)).toSeq === Seq(1L)) // user 2's click was too early
    assert(p.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("retention offsets are relative to each user's own first day") {
    val s = spark; import s.implicits._
    val e = Seq((1L, 100L), (1L, 102L), (2L, 101L), (2L, 102L))
      .toDF("user_id", "day")
    val first = e.groupBy($"user_id").agg(min($"day").as("cohort"))
    val out = e.join(first, "user_id")
      .withColumn("offset", $"day" - $"cohort")
      .groupBy($"cohort", $"offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort", $"offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Seq((100L, 0L, 1L), (100L, 2L, 1L), (101L, 0L, 1L), (101L, 1L, 1L)))
  }
}
